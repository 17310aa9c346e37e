package graft

import graft.queries.BucketQueries
import org.apache.spark.sql.functions._

/** Pins q50's scale claim: the partitioned fact scan is pruned by a
  * runtime (dynamic) partition filter derived from the dim join, not
  * scanned in full. Without DPP the plan reads all 3 l_returnflag
  * partitions; with it, exactly the dim-selected one.
  */
class DppSpec extends SparkTestBase {

  test("q50: scan carries a dynamicpruning partition filter and result matches") {
    val joined = BucketQueries.dppJoin(spark, sf0001)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n$plan")
    // semantics: identical to the static filter the dim encodes
    val viaDpp = joined.groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val static = Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "A")
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDpp == static && viaDpp.nonEmpty)
  }
}
