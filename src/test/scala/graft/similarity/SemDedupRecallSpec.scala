package graft.similarity

import graft.{SparkEntry, SparkTestBase, Tables}

/** x66's eval contract beyond the oracle hash compare: the per-band
  * (n_truth, n_cell_hits) table must equal a driver-side recompute
  * from first principles — collected embeddings, a plain cosine loop
  * in CosineSimF's accumulation order, and the collected cell
  * assignments — so a bug shared by the Spark plan and the generated
  * DuckDB SQL (both derive bands from the same constants) cannot
  * survive here.
  */
class SemDedupRecallSpec extends SparkTestBase {
  import spark.implicits._

  private val MinCosine = 0.3 // SemDupMinCosine — x39/x66's threshold
  private val ProbeMax = 50L

  test("x66: per-band counts equal a first-principles recompute") {
    val rows = Ivf.withCell(Tables.embeddings(spark, sf0001))
      .select($"vec_id", $"embedding", $"cell")
      .as[(Long, Seq[Float], Int)].collect().sortBy(_._1)
    assert(rows.length >= ProbeMax, "fixture smaller than the probe set")

    // same fused loop as CosineSimF.nullSafeEval: one pass, element
    // order, double accumulators — bit-identical rounding inputs
    def cos(a: Seq[Float], b: Seq[Float]): Option[Double] = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) None
      else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    // x66 precomputes norms and divides the dot (the nearestNeighbors
    // identity); on fixed-Dim corpora that is bit-identical to the
    // fused form, which this recompute asserts implicitly: a mismatch
    // at a band boundary would break the count equality below.
    val probes = rows.filter(_._1 < ProbeMax)
    val expected = scala.collection.mutable.Map[Int, (Long, Long)]()
    for {
      (pid, pEmb, pCell) <- probes
      (vid, emb, cell) <- rows if vid != pid
      c <- cos(pEmb, emb)
      r = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if r >= MinCosine
    } {
      val band = math.floor(r * 10).toInt
      val (t, h) = expected.getOrElse(band, (0L, 0L))
      expected(band) = (t + 1, h + (if (cell == pCell) 1L else 0L))
    }
    assert(expected.nonEmpty, "fixture has no above-threshold pairs")

    val got = SparkEntry.queries("x66_semdedup_recall")(spark, sf0001)
      .select($"cos_band", $"n_truth", $"n_cell_hits")
      .as[(Int, Long, Long)].collect()
      .map { case (b, t, h) => b -> ((t, h)) }.toMap
    assert(got == expected.toMap,
      s"band table mismatch:\n got      $got\n expected $expected")
    // the eval is meaningful only if BOTH outcomes occur somewhere:
    // at least one covered pair and at least one cell-boundary miss
    val (tt, hh) = expected.values.foldLeft((0L, 0L)) {
      case ((t, h), (t2, h2)) => (t + t2, h + h2)
    }
    assert(hh > 0, "no within-cell pair in the truth set — vacuous eval")
    assert(hh < tt, "every truth pair was within-cell — the miss rate " +
      "this eval exists to measure is unexercised on the fixture")
  }
}
