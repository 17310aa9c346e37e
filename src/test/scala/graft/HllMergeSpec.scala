package graft

import org.apache.spark.sql.functions._

/** q87's HLL sketch-merge workflow: exactness in the sparse regime,
  * merge ≡ one-shot, associative re-merge, and the quantified
  * approximate path on the unbounded domain. */
class HllMergeSpec extends SparkTestBase {

  private def events = Tables.events(spark, sf0001)

  test("sparse regime: merged estimate equals the exact distinct count") {
    val est = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id % 1000, 20)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val exact = events.select(expr("user_id % 1000")).distinct().count()
    assert(est == exact, s"sparse-mode estimate $est != exact $exact")
  }

  test("merge of day sketches equals the one-shot sketch") {
    val merged = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 20)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val oneShot = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 20))").as("est"))
      .collect().head.getLong(0)
    assert(merged == oneShot,
      s"day-merge estimate $merged != one-shot $oneShot")
  }

  test("re-merge is associative: (day → week → total) = (day → total)") {
    val daySk = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 20)").as("sk"))
      .withColumn("wk", expr("date_trunc('week', day)"))
    val viaWeeks = daySk
      .groupBy(col("wk")).agg(expr("hll_union_agg(sk)").as("wsk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(wsk))").as("est"))
      .collect().head.getLong(0)
    val direct = daySk
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    assert(viaWeeks == direct)
  }

  test("dense regime stays within the documented error bound") {
    // full user_id domain at lgk=12 — past sparse mode at larger SFs;
    // DataSketches HLL rse at lgk=12 is ~0.8%, so 3% is generous
    val est = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .collect().head.getLong(0)
    val exact = events.select(col("user_id")).distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.03,
      s"estimate $est vs exact $exact exceeds 3%")
  }
}
