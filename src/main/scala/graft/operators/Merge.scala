package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-style MERGE (upsert + delete) by rewrite — the warehouse
  * primitive plain-parquet deployments implement as a join-and-rewrite
  * (what MERGE INTO compiles to in table formats): apply a changeset to
  * a base table in ONE declarative plan.
  *
  *  - matched key, no delete flag → the update row replaces the base row
  *  - matched key, delete flag    → the key disappears
  *  - unmatched update key        → insert
  *  - untouched base key          → kept as-is
  *
  * PRECEDENCE when a changeset carries BOTH a delete row and a
  * non-delete row for the same key (legal in CDC feeds): the update
  * wins — the anti-join removes the base row either way, and every
  * non-delete changeset row is re-inserted, so the key survives with
  * the update's values. Feeds that need last-writer-wins semantics
  * should collapse the changeset to one row per key (e.g. max event
  * time) BEFORE calling merge; this operator deliberately does not
  * guess an ordering column.
  *
  * Scale shape: a single anti-join of base against the changeset keys
  * (shuffle or broadcast by AQE based on changeset size — changesets
  * are typically tiny next to the base) plus a union with the non-
  * delete changeset rows. No row-by-row driver logic. For a
  * date/key-partitioned base, [[mergePartitioned]] scopes the rewrite
  * to affected partitions only (MergeSpec pins the pruning).
  */
object Merge {

  /** `deleteFlag`: optional boolean column in `updates` marking keys to
    * remove; it is consumed (dropped from the output). */
  def merge(base: DataFrame, updates: DataFrame, key: String,
            deleteFlag: Option[String] = None): DataFrame = {
    val survivors = base.join(
      updates.select(col(key)).distinct(), Seq(key), "left_anti")
    val upserts = deleteFlag match {
      case Some(f) => updates.filter(!col(f)).drop(f)
      case None => updates
    }
    survivors.unionByName(upserts)
  }

  /** Partition-scoped merge against a parquet base partitioned by
    * `partitionCol` — the 100 TB shape: only partitions the changeset
    * touches are READ (partition pruning via the `isin` filter, so
    * untouched partitions never enter the scan) and only those are
    * REWRITTEN (dynamic partition overwrite replaces exactly the
    * partitions present in the merged output; untouched directories
    * keep their files byte-for-byte).
    *
    * The changeset must carry `partitionCol` — a key's update lands in
    * the partition its row declares, i.e. keys do not move partitions
    * (the usual contract when the partition column is derived from an
    * immutable attribute like event date; a partition-moving merge is a
    * delete in one partition plus an insert in another).
    *
    * The merged rows are staged to `stagingPath` first: Spark refuses
    * to overwrite a path it is concurrently reading, so the
    * read-merge-write cycle needs one materialization between the base
    * scan and the base rewrite. The staging write is partition-local
    * work proportional to the AFFECTED partitions, not the base.
    *
    * Returns the merged view of the affected partitions (read back
    * from the rewritten base). */
  def mergePartitioned(spark: SparkSession, basePath: String,
                       updates: DataFrame, key: String, partitionCol: String,
                       stagingPath: String,
                       deleteFlag: Option[String] = None,
                       maxAffectedPartitions: Int = 10000): DataFrame = {
    // Affected-partition discovery is metadata-sized (bounded, like
    // Backup's partition collect): a changeset touching more distinct
    // partition values than the guard is a config smell, not a plan.
    // Each value is collected in TWO forms from one distinct pass: the
    // raw typed value (drives the base-scan pruning filter, where the
    // literal's type must compare against the changeset's own column)
    // and the Spark cast-to-string form (the canonical representation
    // partition DIRECTORIES are named from). The emptied-set comparison
    // below works exclusively on the string form — comparing raw JVM
    // values across frames is how data gets destroyed, because the base
    // read may partition-type-infer (String dir value → java.sql.Date)
    // and JVM equality across those types never holds.
    val affectedRows = updates
      .select(col(partitionCol), col(partitionCol).cast("string").as("__dir"))
      .distinct()
      .take(maxAffectedPartitions + 1)
    if (affectedRows.length > maxAffectedPartitions)
      throw new IllegalStateException(
        s"changeset touches more than $maxAffectedPartitions distinct " +
          s"$partitionCol partitions; raise maxAffectedPartitions if " +
          "this is intended")
    val affected = affectedRows.map(_.get(0)).filter(_ != null)
    val affectedHasNull = affectedRows.exists(_.isNullAt(0))
    val affectedDirs: Seq[String] =
      affectedRows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq

    // isin over partition-column literals → partition pruning: the scan
    // lists only affected directories. No data filter survives to the
    // row level (partition columns are directory metadata). `isin`
    // never matches null, so a changeset touching the null partition
    // (__HIVE_DEFAULT_PARTITION__) extends the filter explicitly —
    // otherwise those base rows never enter the merge and an
    // all-deletes null changeset would delete unread data.
    def affectedFilter = {
      val nonNull = col(partitionCol).isin(affected: _*)
      if (affectedHasNull) nonNull || col(partitionCol).isNull else nonNull
    }
    val base = spark.read.parquet(basePath).filter(affectedFilter)
    val merged = merge(base, updates, key, deleteFlag)

    merged.write.mode("overwrite").parquet(stagingPath)
    // Explicit schema on the staged read: an all-deletes changeset can
    // leave the staging dir empty (no part files), where schema
    // inference would fail.
    val staged = spark.read.schema(merged.schema).parquet(stagingPath)

    // Dynamic partition overwrite only touches directories PRESENT in
    // the output — a partition whose every surviving row was deleted
    // produces no output rows, so its directory would be left intact
    // and the deleted rows would silently resurrect on the next read.
    // Compare affected vs surviving in ONE canonical representation:
    // the Spark string cast (which matches how Spark itself formats
    // partition directory names — java toString does not: Timestamp
    // toString appends ".0").
    val survivingDirs = staged
      .select(col(partitionCol).cast("string"))
      .distinct()
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
      .toSet
    val emptied = affectedDirs.filterNot(survivingDirs.contains)

    // Emptied directories are removed BEFORE the overwrite: their whole
    // content was read into the merge and produced zero survivors, so a
    // crash between this delete and the overwrite leaves a state the
    // merge re-run repairs (staging still holds the full merged
    // output). The reverse order would let a crash resurrect deleted
    // rows silently — no error on the next read.
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { dir =>
        val dirName =
          if (dir == null)
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .DEFAULT_PARTITION_NAME
          else
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(dir)
        fs.delete(new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(basePath), s"$partitionCol=$dirName"),
          true): Unit
      }
    }
    if (survivingDirs.nonEmpty) {
      staged.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(basePath)
    }

    if (survivingDirs.isEmpty) staged // empty frame with the merged schema
    else spark.read.parquet(basePath).filter(affectedFilter)
  }
}
