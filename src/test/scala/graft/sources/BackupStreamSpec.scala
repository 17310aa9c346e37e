package graft.sources

import graft.SparkTestBase
import graft.config.BackupConfig
import org.apache.spark.sql.functions._

/** The graftbackup micro-batch streaming source: offset model, tail
  * semantics (batch 2 reads exactly the appended chunks), and
  * exactly-once accounting across the whole run. */
class BackupStreamSpec extends SparkTestBase {

  test("offset JSON round-trips") {
    val o = BackupOffset(Map("event_type=click/date_dir=20240105" -> 3,
      "event_type=__HIVE_DEFAULT_PARTITION__/date_dir=20240106" -> 1))
    assert(BackupOffset.fromJson(o.json()) == o)
  }

  test("tail reads the base once, then exactly the appended increment") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_tailspec")
    try {
      val out = scratch.resolve("bak").toString
      val mid = java.time.Instant.parse("2024-01-15T00:00:00Z")
      val to = java.time.Instant.parse("2024-01-25T00:00:00Z")
      val cfg = BackupConfig(
        inputPath = s"$sf0001/events.parquet", outputPath = out,
        timeColumn = "ts", partitionColumn = "event_type",
        from = java.time.Instant.parse("2024-01-05T00:00:00Z"), to = mid)
      graft.operators.Backup.run(spark, cfg)

      def srcRows(lo: String, hi: String): Long =
        graft.Tables.events(spark, sf0001)
          .filter(col("ts") > lit(lo).cast("timestamp") &&
            col("ts") <= lit(hi).cast("timestamp") &&
            col("event_type").isNotNull)
          .count()
      val baseRows = graft.Tables.events(spark, sf0001)
        .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp") &&
          col("event_type").isNotNull).count()
      val incRows = srcRows("2024-01-15 00:00:00", "2024-01-25 00:00:00")

      val name = "tailspec_sink"
      val q = spark.readStream.format("graftbackup").load(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation", scratch.resolve("ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        val phase1 = q.recentProgress.map(_.numInputRows).sum
        assert(phase1 == baseRows,
          s"batch 1 must read the full base window: $phase1 != $baseRows")

        graft.operators.Backup.incremental(
          spark, s"$sf0001/events.parquet", out, to)
        q.processAllAvailable()
        val total = q.recentProgress.map(_.numInputRows).sum
        assert(total == baseRows + incRows,
          s"tail must read the increment exactly once: $total != " +
            s"${baseRows + incRows}")
      } finally q.stop()

      // final state == batch aggregate over the full window
      val got = spark.table(name).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = graft.Tables.events(spark, sf0001)
        .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") <= lit("2024-01-25 00:00:00").cast("timestamp") &&
          col("event_type").isNotNull)
        .groupBy(col("event_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally {
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case scala.util.control.NonFatal(_) => () }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(scratch.toFile)
    }
  }

  test("incremental refuses a root without a stamp and a stale zone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nostamp")
    try {
      intercept[IllegalArgumentException] {
        graft.operators.Backup.incremental(spark,
          s"$sf0001/events.parquet", dir.toString,
          java.time.Instant.parse("2024-01-25T00:00:00Z"))
      }
    } finally { dir.toFile.delete(): Unit }
  }
}
