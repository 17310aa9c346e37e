package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** TopKRewrite: the window-rank idiom becomes the bounded-heap operator
  * exactly when it may, and declines when it must. */
class TopKRewriteSpec extends SparkTestBase {

  GroupTopK.enableRewrite(spark)

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

  test("rewritten plan returns exactly the window idiom's rows") {
    val viaRewrite = rankIdiom(3).collect().toSet
    // same idiom with the rank column KEPT (rewrite declines) = the
    // untouched Window plan, our ground truth
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val ground = lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_returnflag", "l_orderkey", "l_extendedprice", "rn")
      .drop("rn").collect().toSet
    assert(viaRewrite == ground)
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

  test("declines for rank() — ties could admit more than k rows") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc)
    val df = lineitem
      .withColumn("rn", rank().over(w))
      .filter(col("rn") <= 5)
      .select("l_returnflag", "l_orderkey")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("GroupTopK "),
      s"rewrote a rank() filter:\n$physical")
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
