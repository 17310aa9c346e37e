package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {

  test("streaming tumbling counts equal batch computation on bounded input") {
    val streamed = StreamingJobs.tumblingCounts(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val s = streamed.select("window_start", "event_type", "n")
      .collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b)
  }

  test("update-mode incremental counts equal batch under chunked input") {
    val streamed = StreamingJobs.updateModeCounts(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val s = streamed.select("window_start", "event_type", "n")
      .collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b, s"update-mode final state drifted from batch: " +
      s"only-stream=${(s -- b).take(3)} only-batch=${(b -- s).take(3)}")
  }

  test("streaming session windows equal batch gap-sessionization") {
    val streamed = StreamingJobs.sessionCounts(spark, sf0001, gapMinutes = 30)
      .collect().map(_.toSeq).toSet
    // batch ground truth: lag-based islands with the SAME boundary rule
    // as session_window (exact-gap deltas MERGE — boundary-inclusive,
    // pinned empirically by the edge test below — so a new session
    // starts only when delta > gap, the same rule as q22's oracle)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id")).orderBy(col("ts"))
    val batch = Tables.events(spark, sf0001)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            1800000000L, 1).otherwise(0))
      .withColumn("sid",
        sum(col("new_session")).over(w.rowsBetween(W.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .as("session_start"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("session window boundary: exact-gap delta MERGES (inclusive close)") {
    // two events exactly 30 min apart: Spark's session_window treats
    // the touching windows as one session (boundary-inclusive merge).
    // Discovered empirically; this pins the rule the batch oracle and
    // the s07 DuckDB oracle mirror (new session only when delta > gap).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_edge")
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click", 1.0, "{}", 10L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), "click", 1.0, "{}", 11L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:01"), "click", 1.0, "{}", 12L)
    ).toDF("user_id", "ts", "event_type", "value", "props", "event_id")
    events.coalesce(1).write.parquet(dir.resolve("events.parquet").toString)
    val got = StreamingJobs.sessionCounts(spark, dir.toString, gapMinutes = 30)
      .select($"session_start", $"n_events").as[(String, Long)].collect().toSet
    // first two merge (delta == gap); third is > gap past the second
    assert(got == Set(
      ("2024-01-01 00:00:00.000000", 2L), ("2024-01-01 01:00:01.000000", 1L)))
  }

  test("checkpoint restart recovers state: final counts equal batch") {
    // half the input -> stop -> NEW query from the same checkpoint ->
    // rest of the input; any state loss or double-count breaks equality
    val streamed = StreamingJobs.restartFromCheckpoint(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_rows"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("watermarked streaming dedup equals batch distinct on bounded input") {
    val streamed = StreamingJobs.streamDedupKeysWatermarked(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val batch = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }

  test("stream jobs do not mutate the caller session's shuffle partitions") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    StreamingJobs.partitionCounts(spark, sf0001).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("stateful partition counts equal batch group counts") {
    val streamed = StreamingJobs.partitionCounts(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf0001)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("AvailableNow catch-up self-terminates, equals batch, and is " +
    "rerunnable (state torn down between runs)") {
    def run() = StreamingJobs.availableNowCatchup(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val first = run()
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("bigint")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(first == batch)
    // a second invocation must not inherit the first's state store or
    // memory-sink table (availableNowCatchup would return stale rows)
    assert(run() == batch)
  }

  test("CDC merge stream: served table equals batch argmax and is " +
    "INVARIANT to chunk arrival order (apply-if-newer, not blind upsert)") {
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3)))
      .toMap
    val forward = asMap(StreamingJobs.cdcMergeStream(spark, sf0001))
    val batch = asMap(Tables.events(spark, sf0001)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("s"))
      .groupBy(col("user_id")).agg(max(col("s")).as("s"))
      .select(col("user_id"), col("s.event_id").as("latest_event"),
        col("s.event_type").as("latest_type"),
        date_format(col("s.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts")))
    assert(forward == batch && forward.nonEmpty)
    // newest-first arrival: every later batch carries only OLDER rows,
    // so a blind last-batch-wins upsert would serve the oldest events;
    // apply-if-newer must serve the identical table
    val reversed = asMap(
      StreamingJobs.cdcMergeStream(spark, sf0001, reverseChunkOrder = true))
    assert(reversed == batch)
  }
}
