package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** q88–q91: the Spark 4 SQL-surface forms are sugar, not new execution
  * paths — each lowers to the same plan as its classic equivalent.
  * These tests pin that claim at the plan level, so a Spark upgrade
  * that turns any of them into a real runtime boundary (e.g. a
  * non-inlined UDF call) fails a named test instead of a bench
  * regression.
  */
class SqlFeatureSpec extends SparkTestBase {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("q88 pipe syntax lowers to the classic plan: filter pushed to " +
    "the scan, one aggregate, identical results") {
    val pipe = run("q88_pipe_syntax")
    val classic = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("string")
          .cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    assert(pipe.collect().toSeq == classic.collect().toSeq)
    val formatted = pipe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed to the parquet scan:\n$formatted")
  }

  test("q89 SQL scalar UDF inlines: no function-name residue in the " +
    "optimized plan, result equals the hand-written column") {
    val viaUdf = run("q89_sql_udf")
    // inlined at resolution: the optimized plan is plain decimal
    // arithmetic, the UDF name is gone
    val optimized = viaUdf.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_q89_disc_price"),
      s"SQL UDF not inlined:\n$optimized")
    val dec12 = (c: String) => col(c).cast("decimal(12,2)")
    val byHand = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(sum(dec12("l_extendedprice") * (lit(1) - dec12("l_discount")))
        .cast("string").cast("double").as("revenue"),
        count(lit(1)).as("n"))
    assert(viaUdf.collect().toSet == byHand.collect().toSet)
  }

  test("q90 table UDF under LATERAL inlines to a generate — no join " +
    "in the physical plan") {
    val df = run("q90_sql_table_udf")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("Generate"), s"no Generate node:\n$physical")
    assert(!physical.toLowerCase.contains("join"),
      s"correlated table UDF planned as a join:\n$physical")
    // 5 regions keyed 0..4 → 1+2+3+4+5 = 15 spine rows
    assert(df.count() == 15)
  }

  test("q92 parameterized SQL resolves to the same plan as the inlined " +
    "query — parameters bind at analysis, not execution") {
    val param = run("q92_parameterized_sql")
    Tables.orders(spark, sf0001).createOrReplaceTempView("graft_q92_orders")
    val inlined = spark.sql(
      """SELECT o_orderstatus, count(*) AS n,
        |  sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        |FROM graft_q92_orders WHERE o_totalprice > 150000.0
        |GROUP BY o_orderstatus""".stripMargin)
    assert(param.queryExecution.optimizedPlan.canonicalized ==
      inlined.queryExecution.optimizedPlan.canonicalized,
      "parameter binding changed the optimized plan")
    assert(param.collect().toSet == inlined.collect().toSet)
  }

  test("q91 GROUP BY ALL infers the same grouping as the explicit form") {
    val all = run("q91_group_by_all")
    val explicitForm = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100).cast("bigint")).as("cents"))
    assert(all.collect().toSet == explicitForm.collect().toSet)
  }

  test("q100 cohort retention: offset 0 is the full cohort, offsets are " +
    "well-founded, and the size side broadcasts") {
    val df = TpchQueries.defs("q100_cohort_retention").fn(spark, sf0001)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // every cohort's month-0 row exists and retains 100%
    val cohorts = rows.map(_._1).distinct
    val zero = rows.filter(_._2 == 0L)
    assert(zero.map(_._1).toSet == cohorts.toSet)
    zero.foreach { r => assert(r._3 == r._4 && r._5 == 1.0) }
    // offsets are non-negative and activity never exceeds the cohort
    assert(rows.forall(r => r._2 >= 0L && r._3 <= r._4 && r._5 <= 1.0))
    // cohort sizes are consistent across a cohort's rows
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).distinct.length == 1)
    }
    // the tiny size side must broadcast, not shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected a broadcast join for the cohort-size side:\n$plan")
  }
}
