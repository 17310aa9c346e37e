package graft.dedup

import graft.{SparkEntry, SparkTestBase, Tables}

/** x63's eval contract beyond the oracle hash compare: the per-band
  * recall table must equal the literal set intersection of its two
  * generators (each of which has its own correctness spec — DedupSpec
  * for the exact jaccard pairs, the x03 oracle for the LSH candidates),
  * recomputed here from collected sets instead of a join plan.
  */
class LshRecallSpec extends SparkTestBase {
  import spark.implicits._

  // x63's operating constants — the same vals the query reads, so a
  // constant change can never silently desynchronize the truth set
  private val MaxDf = graft.queries.DedupQueries.JaccardMaxDf
  private val Threshold = graft.queries.DedupQueries.JaccardThreshold

  test("x63: per-band counts equal the collected-set intersection of " +
    "truth and LSH candidates") {
    val docs = Tables.documents(spark, sf0001)
    val truth = Dedup.ngramJaccardPairs(docs, MaxDf, Threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(truth.nonEmpty, "fixture has no pairs above the threshold")
    val cand = Dedup.lshCandidatePairs(docs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    val byBand = truth.groupBy(t => math.floor(t._3 * 10).toInt)
    val res = SparkEntry.queries("x63_lsh_dedup_recall")(spark, sf0001)
      .select($"jaccard_band", $"n_truth", $"n_lsh_hits")
      .as[(Int, Long, Long)].collect()

    assert(res.map(_._1).toSet == byBand.keySet,
      "bands partition exactly the truth pair set")
    res.foreach { case (band, nTruth, nHits) =>
      assert(band >= 5 && band <= 10,
        s"band $band outside the threshold-0.5 range")
      val members = byBand(band)
      assert(nTruth == members.length, s"band $band truth count")
      val hits = members.count(p => cand.contains((p._1, p._2)))
      assert(nHits == hits, s"band $band hit count: $nHits != $hits")
      assert(nHits <= nTruth)
      info(f"band $band: recall ${nHits.toDouble / nTruth}%.3f " +
        s"($nHits/$nTruth)")
    }
  }

  test("x63: exact duplicates (band 10) are fully recalled when no " +
    "bucket is capped") {
    // identical texts have identical MinHash signatures, so they share
    // every band bucket; with no bucket over MaxBucketOccupancy the
    // pair survives the capped expansion in all Bands bands — recall
    // at jaccard = 1.0 must be exactly 1. The corpus fixture has NO
    // jaccard=1.0 pairs (the r13 advisor's vacuous-pass finding — the
    // old per-row foreach asserted nothing), so the guarantee is
    // pinned on a CONSTRUCTED corpus with known exact-dup pairs,
    // running the same two generators x63 composes.
    // texts are distinct by construction: the seed is PART of the text
    // (the original arithmetic recipe collided — seed*7 mod 26 made
    // text(55) == text(3), turning "distinct" docs into extra dup-pair
    // members; asserted below so the fixture can't silently regress)
    val words = ('a' to 'z').map(_.toString)
    def text(seed: Int): String =
      (s"s$seed" +: (0 until 12).map(i => words((seed * 7 + i * 3) % 26)))
        .mkString(" ")
    val dups = (0 until 4).flatMap(i =>
      Seq((100L + 2 * i, text(i)), (101L + 2 * i, text(i))))
    val distincts = (0 until 12).map(i => (200L + i, text(40 + 5 * i)))
    assert((dups.map(_._2) ++ distincts.map(_._2)).toSet.size == 16,
      "constructed texts collided — dup pairs are not isolated")
    val docs = (dups ++ distincts).toDF("doc_id", "text")

    val maxOcc = Dedup.bandBuckets(docs)
      .groupBy($"band", $"bucket").count()
      .agg(org.apache.spark.sql.functions.max($"count")).as[Long].head()
    assert(maxOcc <= Dedup.MaxBucketOccupancy,
      s"constructed corpus grew a hot bucket ($maxOcc) — band-10 " +
        "recall no longer guaranteed by construction")

    val truth10 = Dedup.ngramJaccardPairs(docs, MaxDf, Threshold)
      .filter($"jaccard" >= 1.0)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(truth10.size >= 4,
      s"constructed corpus lost its exact-dup pairs ($truth10)")
    val cand = Dedup.lshCandidatePairs(docs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val missed = truth10 -- cand
    assert(missed.isEmpty,
      s"exact-dup recall must be 1.0 uncapped; LSH missed $missed")
  }
}
