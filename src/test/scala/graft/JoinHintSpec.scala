package graft

import org.apache.spark.sql.functions._

/** Join-strategy hints — the per-query override when the optimizer's
  * size estimates are wrong at scale (stale stats, post-filter
  * selectivity it can't see): MERGE forces sort-merge, SHUFFLE_HASH
  * builds a hash map per partition (no sort, wins when one side is
  * much smaller but past the broadcast threshold), BROADCAST ships the
  * small side. The spec pins that each hint actually flips the
  * physical operator and that results are identical under all three —
  * strategy is a cost choice, never a semantics choice.
  */
class JoinHintSpec extends SparkTestBase {

  test("strategy hints flip the physical join operator, results invariant") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"))

    def joined(hint: String) =
      li.join(ord.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))

    def physical(hint: String): String =
      joined(hint).queryExecution.executedPlan.toString

    assert(physical("merge").contains("SortMergeJoin"))
    assert(physical("shuffle_hash").contains("ShuffledHashJoin"))
    assert(physical("broadcast").contains("BroadcastHashJoin"))

    val results = Seq("merge", "shuffle_hash", "broadcast").map { h =>
      joined(h).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    }
    assert(results.distinct.size == 1 && results.head.nonEmpty,
      "join strategy changed the result")
  }
}
