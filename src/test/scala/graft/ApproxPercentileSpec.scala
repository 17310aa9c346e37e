package graft

import org.apache.spark.sql.functions._

/** Pins q59's accuracy contract: approx_percentile(_, p, accuracy) is a
  * Greenwald-Khanna summary whose guarantee is on RANK, not value —
  * the returned element's rank is within ε·n of the target rank, with
  * ε = 1/accuracy. That (not value closeness) is what survives merging
  * partial sketches across partitions, so it's the property a cluster
  * run can rely on.
  */
class ApproxPercentileSpec extends SparkTestBase {

  test("approx_percentile rank error is within eps*n of the target rank") {
    val accuracy = 100
    val eps = 1.0 / accuracy
    val qs = Seq(0.5, 0.95)

    val perGroup = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_quantity"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getDouble(1)).sorted }

    val approx = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_quantity, array(${qs.mkString(",")}), $accuracy)")
        .as("ap"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap

    assert(approx.keySet == perGroup.keySet && approx.nonEmpty)
    for ((g, sorted) <- perGroup; (q, est) <- qs.zip(approx(g))) {
      val n = sorted.length
      // rank of the estimate = how many values are <= it
      val rank = sorted.count(_ <= est)
      val target = q * n
      assert(math.abs(rank - target) <= eps * n + 1,
        s"group $g q=$q: est=$est rank=$rank target=$target n=$n")
      // and the estimate must be an actual element of the multiset
      assert(sorted.contains(est), s"group $g q=$q: $est not in data")
    }
  }
}
