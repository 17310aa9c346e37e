package graft.operators

import graft.SparkTestBase
import graft.queries.BucketQueries

class BucketJoinSpec extends SparkTestBase {

  test("bucketed co-located join has no shuffle exchange in the final plan") {
    val joined = BucketQueries.colocatedJoin(spark, sf0001)
    // materialize so AQE settles on the final physical plan
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
  }

  test("bucketed join result equals the plain join") {
    val bucketed = BucketQueries.colocatedJoin(spark, sf0001).count()
    val plain = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    assert(bucketed == plain)
  }
}
