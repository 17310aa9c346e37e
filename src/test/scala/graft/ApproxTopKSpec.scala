package graft

import org.apache.spark.sql.functions._

/** Pins the two claims q82/q83 lean on:
  *  - EXACT-WHEN-SMALL: with maxItemsTracked >= #distinct items the
  *    frequent-items sketch never evicts, so every returned count is
  *    the true count (this is what makes the DuckDB oracle exact);
  *  - MERGE EQUIVALENCE: accumulate-per-group → combine → estimate
  *    returns the same answer as the one-shot aggregate — the property
  *    that lets 100 TB build sketches map-side and shuffle only sketch
  *    bytes.
  */
class ApproxTopKSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val words = Seq.tabulate(1000) { i =>
    // skewed: w0 x 500, w1 x 300, w2 x 120, rest spread over w3..w10
    val w = if (i < 500) "w0" else if (i < 800) "w1" else if (i < 920) "w2"
    else s"w${3 + i % 8}"
    (i.toLong, w)
  }.toDF("id", "w")

  private def trueCounts: Map[String, Long] =
    words.groupBy($"w").count().as[(String, Long)].collect().toMap

  test("exact when maxItemsTracked covers the domain") {
    val got = words.agg(expr("approx_top_k(w, 3, 64)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as[String], $"e.count".as[Long])
      .collect().toSeq
    assert(got.map(_._1) == Seq("w0", "w1", "w2"))
    val tc = trueCounts
    got.foreach { case (w, n) => assert(n == tc(w), s"$w: $n != ${tc(w)}") }
  }

  test("accumulate->combine->estimate equals the one-shot aggregate") {
    val oneShot = words.agg(expr("approx_top_k(w, 3, 64)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as[String], $"e.count".as[Long]).collect().toSet
    val merged = words.groupBy($"id" % 7)
      .agg(expr("approx_top_k_accumulate(w, 64)").as("sk"))
      .agg(expr("approx_top_k_combine(sk, 64)").as("c"))
      .select(explode(expr("approx_top_k_estimate(c, 3)")).as("e"))
      .select($"e.item".as[String], $"e.count".as[Long]).collect().toSet
    assert(merged == oneShot)
  }

  test("under eviction the sketch still surfaces the dominant item") {
    // 600 distinct tail items vs maxItemsTracked=8: heavy eviction,
    // but the guarantee (estimate bounds contain the true count;
    // a sufficiently dominant item is never lost) must hold for w0
    val skewed = (Seq.fill(400)("hot") ++ (0 until 600).map(i => s"t$i"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val got = skewed.agg(expr("approx_top_k(w, 1, 8)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as[String], $"e.count".as[Long]).collect().head
    assert(got._1 == "hot")
    assert(got._2 >= 400L, s"estimate ${got._2} below true count 400")
  }
}
