package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the engine-side row filter that
  * matters when BOTH join sides are too big to broadcast: the selective
  * (creation) side builds a bloom filter, the big (application) side
  * drops non-matching rows BEFORE the shuffle, so the exchange moves
  * only rows that can survive the join. At 100 TB this is the lever
  * that keeps a selective fact⋈fact join from shuffling the whole fact
  * table. Thresholds here are test-scale: production defaults
  * (creation ≤10 MB plan-size, application ≥10 GB scan) gate the same
  * rewrite at cluster scale.
  */
class BloomFilterJoinSpec extends SparkTestBase {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective shuffle join injects might_contain on the big side") {
    withConf(
      // force the shuffle-join regime (no broadcast escape hatch) and
      // drop the application-side size gate to fixture scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = Tables.lineitem(spark, sf0001)
      val ord = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter application in plan:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom filter creation in plan:\n$plan")

      val withBloom =
        joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val without = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(withBloom == without && withBloom.nonEmpty,
        "bloom-filtered join changed the result")
    }
  }
}
