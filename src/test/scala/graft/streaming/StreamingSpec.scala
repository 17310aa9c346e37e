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
}
