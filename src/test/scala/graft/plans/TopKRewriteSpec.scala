package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** TopKRewrite: the window-rank idiom becomes the bounded-heap operator
  * exactly when it may, and declines when it must. */
class TopKRewriteSpec extends SparkTestBase {

  // rewrite is session-default via SparkTestBase's GraftSparkExtensions
  // (no per-suite enableRewrite — that was the order-dependence the r13
  // verdict flagged); assert the precondition so a base-fixture change
  // fails here, loudly, instead of making every plan test vacuous
  assert(spark.experimental.extraOptimizations.isEmpty,
    "rewrite should come from extensions, not experimental mutation")

  private def lineitem = Tables.lineitem(spark, sf0001)

  private def rankIdiom(k: Int) = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
  }

  test("row_number <= k with the rank dropped rewrites to GroupTopKExec " +
    "and drops the Window entirely") {
    val df = rankIdiom(5)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GroupTopK "), s"no GroupTopK node:\n$physical")
    assert(!physical.contains("WindowGroupLimit") &&
      !physical.contains("RunningWindowFunction") &&
      !physical.contains(" Window "), s"Window survived:\n$physical")
  }

  /** Ground truths below keep the rank column so the rewrite declines —
    * but CollapseProject merges a select(..., "rn").drop("rn") back into
    * the eligible shape before extraOptimizations runs, so the plan must
    * be CHECKED, not assumed: a ground truth that was itself rewritten
    * would compare GroupTopK against GroupTopK and prove nothing. */
  private def assertUntouched(df: org.apache.spark.sql.DataFrame): Unit = {
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("GroupTopK "),
      s"ground truth was rewritten too — the equality check is vacuous:\n$physical")
    assert(physical.contains("Window") || physical.contains("WindowGroupLimit"),
      s"ground truth lost its Window plan:\n$physical")
  }

  test("rewritten plan returns exactly the window idiom's rows") {
    val viaRewrite = rankIdiom(3).collect().toSet
    // same idiom with the rank column KEPT in the result (rewrite
    // declines) = the untouched Window plan, our ground truth; the rank
    // is sliced off AFTER collect, driver-side, so no Project exists for
    // CollapseProject to merge away
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val groundDf = lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_returnflag", "l_orderkey", "l_extendedprice", "rn")
    assertUntouched(groundDf)
    val ground = groundDf.collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val got = viaRewrite.map(r => (r.get(0), r.get(1), r.get(2)))
    assert(got == ground)
  }

  test("declines when the rank column is still referenced downstream") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val df = lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("l_returnflag", "l_orderkey", "rn")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("GroupTopK "),
      s"rewrote despite rank in output:\n$physical")
  }

  test("rank() <= k rewrites tie-aware: the whole boundary tie class " +
    "is kept, result equals the window plan on tie-heavy data") {
    // l_quantity is integral-valued in the fixture → dense ties
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc)
    def idiom(keepRank: Boolean) = {
      val base = lineitem
        .withColumn("rn", rank().over(w))
        .filter(col("rn") <= 3)
      if (keepRank)
        base.select("l_returnflag", "l_orderkey", "l_quantity", "rn")
      else base.select("l_returnflag", "l_orderkey", "l_quantity")
    }
    val physical = idiom(keepRank = false).queryExecution.executedPlan.toString
    assert(physical.contains("GroupTopK "), s"no GroupTopK:\n$physical")
    assert(!physical.contains(" Window "), s"Window survived:\n$physical")
    val groundDf = idiom(keepRank = true)
    assertUntouched(groundDf)
    val viaRewrite = idiom(keepRank = false).collect().toSet
    val ground = groundDf.collect()
      .map(r => Row(r.get(0), r.get(1), r.get(2))).toSet
    assert(viaRewrite == ground)
    // ties actually exercised: more than 3·groups rows came back
    val groups = viaRewrite.map(_.getString(0)).size
    assert(viaRewrite.size > 3 * groups,
      s"fixture produced no boundary ties (${viaRewrite.size} rows)")
  }

  test("dense_rank() <= k rewrites: every row of the k best distinct " +
    "order-values, equals the window plan") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc)
    def idiom(keepRank: Boolean) = {
      val base = lineitem
        .withColumn("rn", dense_rank().over(w))
        .filter(col("rn") <= 2)
      if (keepRank)
        base.select("l_returnflag", "l_orderkey", "l_quantity", "rn")
      else base.select("l_returnflag", "l_orderkey", "l_quantity")
    }
    val physical = idiom(keepRank = false).queryExecution.executedPlan.toString
    assert(physical.contains("GroupTopK "), s"no GroupTopK:\n$physical")
    val groundDf = idiom(keepRank = true)
    assertUntouched(groundDf)
    val viaRewrite = idiom(keepRank = false).collect().toSet
    assert(viaRewrite == groundDf.collect()
      .map(r => Row(r.get(0), r.get(1), r.get(2))).toSet)
    // exactly 2 distinct quantities per group survive
    viaRewrite.groupBy(_.getString(0)).foreach { case (g, rows) =>
      assert(rows.map(_.get(2)).size == 2,
        s"group $g kept a wrong distinct-value count")
    }
  }

  test("rn = 1 (latest-per-key idiom) rewrites with k = 1") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val df = lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_returnflag", "l_orderkey")
    assert(df.queryExecution.executedPlan.toString.contains("GroupTopK "))
    assert(df.count() == 3) // one row per returnflag
  }
}
