package graft

import org.apache.spark.sql.functions._

/** Pins Catalyst's common-subplan deduplication: when one query
  * references the same aggregation twice (self-join, union of arms
  * over one aggregate), the physical plan must materialize the
  * exchange ONCE and wire a ReusedExchange into the second reference.
  * At 100 TB this is the difference between scanning and shuffling the
  * fact table once or twice for the same intermediate — free when the
  * two subplans are literally identical, and a regression here (e.g. a
  * refactor introducing a cosmetic difference between the two arms)
  * silently doubles the dominant cost. */
class ExchangeReuseSpec extends SparkTestBase {

  test("self-join over one aggregation reuses the shuffle exchange") {
    val agg = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).as("total"))
    // same aggregate referenced twice: pair each priority with every
    // priority of equal count (includes itself)
    val left = agg.select(col("o_orderpriority").as("p1"), col("n"))
    val right = agg.select(col("o_orderpriority").as("p2"),
      col("n").as("n2"))
    val joined = left.join(right, col("n") === col("n2"))

    joined.collect() // AQE finalizes reuse decisions at execution
    val plan = joined.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("ReusedExchange") ||
      planStr.contains("ReusedQueryStage"),
      s"identical aggregation arms were computed twice:\n$planStr")

    // quantitative: of the two aggregation-side shuffles, only one is
    // a materialized exchange — the other must be a reuse node. (The
    // printed tree repeats reused subtrees, so string-counting scans
    // overcounts; count the distinct materialized stages instead.)
    import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
    val stages = plan.collect {
      case s: ShuffleQueryStageExec => s.plan.id
    }
    assert(stages.distinct.size < stages.size ||
      planStr.contains("ReusedExchange"),
      s"no shared shuffle stage found among stages $stages:\n$planStr")
  }
}
