package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction (OPTIMIZE-style bin packing) for a
  * partition-column-partitioned parquet dataset.
  *
  * The small-file problem is THE operational failure mode of a
  * long-running ingestion pipeline at 100 TB: streaming micro-batches
  * and frequent CDC merges each leave O(tasks) files per partition, and
  * a year later the table is millions of kilobyte-files whose per-file
  * open/footer cost dominates every scan. Compaction rewrites each
  * partition into ceil(partitionBytes / targetBytes) files without
  * changing a single row.
  *
  * Shape, chosen for cluster scale:
  *   1. One driver-side file listing (O(#files) METADATA, the same
  *      bounded pattern as Backup's rename pass) computes per-partition
  *      byte totals → target file counts. This is a listing, not a read.
  *   2. One distributed pass rewrites the data: rows get a bucket id
  *      `pmod(hash(bucketBy), nFiles(partition))` via a broadcast join
  *      against the tiny (partition → nFiles) plan table, then a single
  *      shuffle on (partition, bucket) co-locates each output file's
  *      rows in one task. `partitionBy` at the sink splits by partition
  *      value, so each task emits at most one file per partition value
  *      it holds → per-partition file count ≤ nFiles (hash collisions
  *      can only merge buckets, never split them).
  *
  * Crucially this parallelizes WITHIN a partition: the naive
  * `repartition(partitionCol)` rewrite gives one task per partition —
  * a 2 TB hot partition becomes one 2 TB task. Bucketing by a row key
  * keeps every task near targetBytes regardless of partition skew.
  *
  * The reference engine has no compaction (its sink writes one gz file
  * per partition chunk, ref `cmd/backup.go:258-331`); this is the
  * engine-surface operator a production deployment of that sink needs.
  */
object Compact {

  final case class CompactionStats(
      partitions: Long,
      filesBefore: Long,
      filesAfter: Long,
      bytesTotal: Long)

  /** Per-partition parquet file count + byte total from one recursive
    * listing. Returns (partitionValue → (files, bytes)). */
  def partitionStats(
      spark: SparkSession,
      root: String,
      partitionCol: String): Map[String, (Long, Long)] = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    val it = fs.listFiles(new Path(root), true)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        f.getPath.getParent.getName match {
          case dir if dir.startsWith(prefix) =>
            val k = dir.substring(prefix.length)
            val (n, b) = acc.getOrElse(k, (0L, 0L))
            acc(k) = (n + 1, b + f.getLen)
          case _ => ()
        }
      }
    }
    acc.toMap
  }

  /** Rewrite `inPath` (parquet, partitioned by `partitionCol`) into
    * `outPath` with ceil(bytes/targetBytes) files per partition.
    * `bucketBy` is any roughly-uniform row expression (an id column);
    * it only steers file assignment, never the data itself. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      partitionCol: String,
      bucketBy: String,
      targetBytes: Long): CompactionStats = {
    // In-place compaction is not supported: the rewrite reads inPath
    // while writing outPath, and the row-losslessness guard below
    // recounts the input afterwards — both are undefined if the write
    // clobbers its own source.
    require(new Path(inPath).toUri.getPath != new Path(outPath).toUri.getPath,
      s"compact requires inPath != outPath (got $inPath)")
    val before = partitionStats(spark, inPath, partitionCol)
    require(before.nonEmpty, s"no $partitionCol= partitions under $inPath")
    val plan = before.toSeq.map { case (k, (_, bytes)) =>
      (k, math.max(1L, (bytes + targetBytes - 1) / targetBytes))
    }
    import spark.implicits._
    // Plan keys come from DIRECTORY names, which Hive-escape special
    // characters and spell null as __HIVE_DEFAULT_PARTITION__; the data
    // rows carry the unescaped VALUES. Unescape before joining (and
    // null-safe-join below) or those rows silently miss the plan table
    // and vanish from a rewrite that promises row-losslessness.
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val planRows = plan.map { case (k, n) =>
      val v =
        if (k == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
        else ExternalCatalogUtils.unescapePathName(k)
      (v, n)
    }
    // tiny (partition → nFiles) table; broadcast to tag every row
    val planDf = broadcast(
      planRows.toDF(partitionCol + "_plan", "n_files_plan"))
    // STRICT task count = total planned files: repartition with an
    // explicit N is exempt from AQE coalescing, so the bucket→task
    // mapping survives on small inputs too (coalescing can only merge
    // buckets — file counts would still be ≤ cap — but would defeat
    // the within-partition parallelism this operator exists for). At
    // 100 TB / 128 MB targets that is ~10⁶ tasks — exactly one per
    // output file, the intended granularity.
    val totalFiles = math.max(1L, plan.map(_._2).sum).toInt
    val df = spark.read.parquet(inPath)
    // Input row count taken BEFORE the rewrite so a concurrent change to
    // the input can't make the guard vacuous. This is a count JOB
    // (footer-driven, no column data read, but still O(#files) tasks);
    // at 100 TB it is a deliberate price for the losslessness contract.
    val rowsIn = df.count()
    // LEFT join, null-safe (<=>): a row whose partition value still
    // fails to match its directory name (exotic escaping) falls back to
    // n_files = 1 instead of being dropped; nulls match the
    // __HIVE_DEFAULT_PARTITION__ plan row.
    df.join(planDf,
        col(partitionCol).cast("string") <=> col(partitionCol + "_plan"),
        "left")
      .withColumn("__bucket",
        pmod(hash(col(bucketBy)),
          coalesce(col("n_files_plan").cast("int"), lit(1))))
      .repartition(totalFiles, col(partitionCol), col("__bucket"))
      .drop(partitionCol + "_plan", "n_files_plan", "__bucket")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(outPath)
    val after = partitionStats(spark, outPath, partitionCol)
    // Row-losslessness is the operator's whole contract — enforce it.
    val rowsOut = spark.read.parquet(outPath).count()
    require(rowsIn == rowsOut,
      s"compaction dropped rows: $rowsIn in, $rowsOut out — " +
        "this is a bug, the rewrite must be row-lossless")
    CompactionStats(
      partitions = after.size.toLong,
      filesBefore = before.valuesIterator.map(_._1).sum,
      filesAfter = after.valuesIterator.map(_._1).sum,
      bytesTotal = before.valuesIterator.map(_._2).sum)
  }

  /** OPTIMIZE ZORDER: bin-pack like [[compact]] but lay rows out by
    * Z-VALUE of (`zColA`, `zColB`) so each output file covers a
    * contiguous z-range — box predicates on the two columns then skip
    * whole FILES via parquet footer min/max, which a hash-bucketed
    * rewrite cannot give (see `functions/ZOrder` for the pruning
    * measurements).
    *
    * Scale shape: ONE `repartitionByRange(totalFiles, partition, z)` —
    * a sampling-based range exchange, the same single-shuffle class as
    * compact()'s hash route and, critically, NOT a per-partition
    * window rank (which would put each partition's whole ordering in
    * one task — the 2 TB-partition trap this operator family exists to
    * avoid). A range task can straddle a partition-value boundary, so
    * the per-partition file-count contract relaxes from ≤cap to
    * ≤cap+1; the explicit N keeps the geometry AQE-exempt. Rows are
    * additionally sorted by z WITHIN each task so row groups inside a
    * file are z-runs too.
    */
  def compactZOrdered(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      partitionCol: String,
      zColA: String,
      zColB: String,
      targetBytes: Long,
      bits: Int = 16): CompactionStats = {
    require(new Path(inPath).toUri.getPath != new Path(outPath).toUri.getPath,
      s"compact requires inPath != outPath (got $inPath)")
    val before = partitionStats(spark, inPath, partitionCol)
    require(before.nonEmpty, s"no $partitionCol= partitions under $inPath")
    val totalFiles = math.max(1L, before.valuesIterator.map { case (_, bytes) =>
      math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    }.sum).toInt
    val df = spark.read.parquet(inPath)
    val rowsIn = df.count()
    df.withColumn("__z",
        graft.functions.ZOrder.zValue(col(zColA), col(zColB), bits))
      .repartitionByRange(totalFiles, col(partitionCol), col("__z"))
      .sortWithinPartitions(col(partitionCol), col("__z"))
      .drop("__z")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(outPath)
    val after = partitionStats(spark, outPath, partitionCol)
    val rowsOut = spark.read.parquet(outPath).count()
    require(rowsIn == rowsOut,
      s"compaction dropped rows: $rowsIn in, $rowsOut out — " +
        "this is a bug, the rewrite must be row-lossless")
    CompactionStats(
      partitions = after.size.toLong,
      filesBefore = before.valuesIterator.map(_._1).sum,
      filesAfter = after.valuesIterator.map(_._1).sum,
      bytesTotal = before.valuesIterator.map(_._2).sum)
  }
}
