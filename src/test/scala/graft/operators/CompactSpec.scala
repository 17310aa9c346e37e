package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins q67's compaction geometry and losslessness:
  *   - per-partition output file count never exceeds
  *     ceil(partitionBytes / targetBytes) — hash collisions may merge
  *     buckets but can never split them;
  *   - a generous target collapses every partition to exactly one file;
  *   - the rewrite is row-lossless (same multiset of rows back).
  */
class CompactSpec extends SparkTestBase {

  private def scratch(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def fragmented(root: String): String = {
    val p = s"$root/small"
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      // explicit N: AQE would coalesce an un-numbered repartition of
      // this tiny shuffle to one task and leave nothing fragmented
      .repartition(8, col("day"), pmod(col("event_id"), lit(4)))
      .write.mode("overwrite").partitionBy("day").parquet(p)
    p
  }

  test("generous target collapses each partition to one file, losslessly") {
    val root = scratch("compact_one")
    val in = fragmented(root)
    val out = s"$root/compacted"
    val stats = Compact.compact(spark, in, out, "day", "event_id",
      targetBytes = 64L * 1024 * 1024)
    assert(stats.filesAfter == stats.partitions,
      s"expected 1 file per partition, got $stats")
    assert(stats.filesBefore > stats.filesAfter, s"no compaction: $stats")

    // losslessness: same multiset of (event_id, value) rows
    val before = spark.read.parquet(in)
      .agg(count(lit(1)), sum(col("event_id")),
        sum(col("value").cast("decimal(12,2)"))).collect()(0)
    val after = spark.read.parquet(out)
      .agg(count(lit(1)), sum(col("event_id")),
        sum(col("value").cast("decimal(12,2)"))).collect()(0)
    assert(before == after, s"content drift: $before vs $after")
  }

  test("tight target splits partitions but never exceeds the ceil cap") {
    val root = scratch("compact_cap")
    val in = fragmented(root)
    val out = s"$root/compacted"
    // per-day bytes at sf0.001 are ~1.5-5 KB; 512 B forces a multi-file
    // plan for every partition while staying above parquet's footer
    val target = 512L
    Compact.compact(spark, in, out, "day", "event_id", target)
    val before = Compact.partitionStats(spark, in, "day")
    val after = Compact.partitionStats(spark, out, "day")
    assert(after.keySet == before.keySet, "partition set changed")
    val overCap = after.filter { case (k, (files, _)) =>
      val cap = math.max(1L, (before(k)._2 + target - 1) / target)
      files > cap
    }
    assert(overCap.isEmpty, s"partitions over their file cap: $overCap")
    // at least one partition genuinely split into multiple files
    assert(after.valuesIterator.exists(_._1 > 1),
      s"tight target produced no multi-file partition: $after")
  }
}
