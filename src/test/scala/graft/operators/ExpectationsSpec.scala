package graft.operators

import graft.{SparkTestBase, Tables}
import graft.operators.Expectations.Rule

/** Pins q74's scale claim: R rules are validated by ONE scan + ONE
  * aggregate (the naive per-rule loop is R full passes), and a rule
  * whose predicate evaluates to NULL counts as violated. */
class ExpectationsSpec extends SparkTestBase {

  test("all rules ride a single scan and NULL predicates violate") {
    val df = Tables.orders(spark, sf0001)
    val out = Expectations.check(df, Seq(
      Rule("price_positive", "o_totalprice > 0"),
      Rule("null_predicate", "nullif(o_orderkey, o_orderkey) > 0"),
      Rule("key_nonneg", "o_orderkey >= 0")))

    val plan = out.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected one scan for all rules, got $scans:\n$plan")

    val rows = out.collect().map(r =>
      r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val total = df.count()
    assert(rows("price_positive") == (0L, true))
    assert(rows("key_nonneg") == (0L, true))
    // nullif(k, k) is always NULL → predicate NULL on every row →
    // every row violates (unknown is not held)
    assert(rows("null_predicate") == (total, false),
      s"NULL predicate must violate every row: $rows")
  }
}
