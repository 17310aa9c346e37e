package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot versioning / time travel over plain parquet — the
  * capability the reference's name promises (timestream-travel backs
  * up a time range so it can be re-read later; `README.md:3` also
  * advertises restore). Generalized here to versioned table snapshots
  * with AS-OF reads and version diffs, the way table formats
  * (Iceberg/Delta) expose it, but with nothing beyond parquet + a
  * directory convention, so it composes with every other operator in
  * the engine.
  *
  * Layout: `root/version=N/` holds the COMPLETE table state as of
  * version N (copy-on-write snapshots). An AS-OF read resolves the
  * largest committed version ≤ the ask and reads exactly that
  * subdirectory — Spark's partition discovery turns `version=N` into a
  * partition column, so the AS-OF filter is partition PRUNING: the
  * scan never touches other versions' files, no matter how many
  * versions accumulate. Writers commit a version atomically from the
  * reader's perspective because a snapshot directory only becomes
  * resolvable once its `_SUCCESS` marker lands (Spark writes it last).
  *
  * Diff between two versions is two hash-joins on the key (changed +
  * added + removed), each side a single pruned scan — never a scan of
  * the whole version history.
  */
object Snapshots {

  /** Write `df` as the complete state of `version`. */
  def write(df: DataFrame, root: String, version: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/version=$version")

  /** Committed versions (ascending): `version=N` dirs with a _SUCCESS
    * marker. Listing is O(#versions) driver-side metadata, like any
    * table format's snapshot log. Listed through the Hadoop FileSystem
    * API (not java.io.File) so hdfs:///s3a:// roots work the same way
    * write()/readAsOf() already do — a local-only lister would return
    * empty on a remote root and make every readAsOf fail after a
    * successful write. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("version="))
      .filter(s => fs.exists(
        new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("version=").toLong)
      .sorted
  }

  /** Read the table as of `asOf`: the largest committed version ≤ it.
    * The version filter prunes at the partition level — only the
    * resolved snapshot's files enter the scan. */
  def readAsOf(spark: SparkSession, root: String, asOf: Long): DataFrame = {
    val vs = versions(spark, root).filter(_ <= asOf)
    require(vs.nonEmpty, s"no snapshot at or before version $asOf under $root")
    spark.read.parquet(root).filter(col("version") === vs.last).drop("version")
  }

  /** Retention / VACUUM: delete committed snapshots beyond the newest
    * `retain`, plus any UNCOMMITTED version directory older than the
    * newest committed version (a crashed writer's half-written
    * snapshot — invisible to readers, but storage it will never
    * reclaim on its own). Copy-on-write snapshots make retention THE
    * cost lever at scale: every version is a full table copy, so an
    * unbounded history is an unbounded storage bill.
    *
    * Deletion order is oldest-first and the newest `retain` committed
    * versions are never touched, so a concurrent AS-OF reader of a
    * retained version is unaffected; readers of vacuumed versions get
    * the same failure mode every table format documents for VACUUM.
    * Returns the deleted version numbers (committed ones; negative
    * entries are uncommitted dirs, reported as -1). */
  def vacuum(spark: SparkSession, root: String, retain: Int): Seq[Long] = {
    require(retain >= 1, "must retain at least one snapshot")
    val committed = versions(spark, root)
    if (committed.isEmpty) return Seq.empty
    val keep = committed.takeRight(retain).toSet
    val newestCommitted = committed.last
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("version="))
      .flatMap { s =>
        val v = s.getPath.getName.stripPrefix("version=").toLong
        val isCommitted = fs.exists(
          new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS"))
        if (isCommitted && !keep.contains(v)) Some((s.getPath, v))
        else if (!isCommitted && v < newestCommitted) Some((s.getPath, -1L))
        else None
      }
      .sortBy(_._2)
    victims.map { case (p, v) => fs.delete(p, true); v }
  }

  /** Row-level diff `from` → `to` on `key`: one row per changed key
    * with change_type ∈ {added, removed, changed}. Unchanged keys
    * (all non-key columns equal, null-safe) are absent. */
  def diff(spark: SparkSession, root: String,
           from: Long, to: Long, key: String): DataFrame = {
    val a = readAsOf(spark, root, from)
    val b = readAsOf(spark, root, to)
    val valueCols = a.columns.filterNot(_ == key).toSeq
    val bothChanged = a.as("a").join(b.as("b"), Seq(key), "inner")
      .filter(!valueCols.map(c => col(s"a.$c") <=> col(s"b.$c"))
        .reduce(_ && _))
      .select(col(key), lit("changed").as("change_type"))
    val added = b.join(a.select(col(key)), Seq(key), "left_anti")
      .select(col(key), lit("added").as("change_type"))
    val removed = a.join(b.select(col(key)), Seq(key), "left_anti")
      .select(col(key), lit("removed").as("change_type"))
    bothChanged.unionAll(added).unionAll(removed)
  }
}
