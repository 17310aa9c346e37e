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

  test("stateful partition counts equal batch group counts") {
    val streamed = StreamingJobs.partitionCounts(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf0001)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
