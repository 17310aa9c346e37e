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

  test("compactZOrdered: lossless, bounded files, and per-file z-ranges " +
    "are disjoint within each partition") {
    import spark.implicits._
    val root = scratch("compact_z")
    val in = s"$root/in"
    // two partitions, distinct (a, b) grid points so z-values are
    // unique and range disjointness is unambiguous
    val df = (0 until 4096).map { i =>
      (i.toLong, i % 64, (i / 64) % 64, if (i % 2 == 0) "p0" else "p1")
    }.toDF("id", "a", "b", "part")
    df.repartition(8).write.partitionBy("part").parquet(in)
    val out = s"$root/out"

    val bytes = Compact.partitionStats(spark, in, "part")
      .valuesIterator.map(_._2).sum
    val target = math.max(512L, bytes / 8) // force a multi-file layout
    val stats = Compact.compactZOrdered(spark, in, out, "part", "a", "b",
      target)
    assert(stats.filesAfter > stats.partitions,
      s"expected multi-file z layout, got $stats")

    // losslessness
    val before = spark.read.parquet(in)
      .agg(count(lit(1)), sum($"id"), sum($"a"), sum($"b")).collect()(0)
    val after = spark.read.parquet(out)
      .agg(count(lit(1)), sum($"id"), sum($"a"), sum($"b")).collect()(0)
    assert(before == after, s"content drift: $before vs $after")

    // range-straddle allowance: per-partition files ≤ cap + 1
    val inStats = Compact.partitionStats(spark, in, "part")
    val outStats = Compact.partitionStats(spark, out, "part")
    outStats.foreach { case (p, (files, _)) =>
      val cap = math.max(1L, (inStats(p)._2 + target - 1) / target) + 1
      assert(files <= cap, s"partition $p: $files files > cap $cap")
    }

    // the point of the operator: within a partition, each FILE covers
    // a z-range disjoint from every other file's
    val z = graft.functions.ZOrder.zValue($"a", $"b")
    outStats.keys.foreach { p =>
      val ranges = spark.read.parquet(s"$out/part=$p")
        .select(input_file_name().as("f"), z.as("z"))
        .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
        .as[(String, Long, Long)].collect().sortBy(_._2)
      ranges.sliding(2).foreach {
        case Array((f1, _, hi1), (f2, lo2, _)) =>
          assert(hi1 < lo2,
            s"partition $p: files $f1 and $f2 overlap in z ($hi1 >= $lo2)")
        case _ => ()
      }
    }
  }
}
