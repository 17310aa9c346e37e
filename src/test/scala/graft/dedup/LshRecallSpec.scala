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

  test("x63: exact duplicates (band 10) are fully recalled on the " +
    "uncapped fixture") {
    // identical texts have identical MinHash signatures, so they share
    // every band bucket; with no bucket over MaxBucketOccupancy (true
    // for the fixture, asserted here so a fixture change can't silently
    // weaken the test) the pair survives the capped expansion in all
    // Bands bands — recall at jaccard = 1.0 must be exactly 1.
    val docs = Tables.documents(spark, sf0001)
    val maxOcc = Dedup.bandBuckets(docs)
      .groupBy($"band", $"bucket").count()
      .agg(org.apache.spark.sql.functions.max($"count")).as[Long].head()
    assume(maxOcc <= Dedup.MaxBucketOccupancy,
      s"fixture grew a hot bucket ($maxOcc) — band-10 recall no longer " +
        "guaranteed by construction")
    val band10 = SparkEntry.queries("x63_lsh_dedup_recall")(spark, sf0001)
      .filter($"jaccard_band" === 10)
      .select($"n_truth", $"n_lsh_hits").as[(Long, Long)].collect()
    band10.foreach { case (nTruth, nHits) =>
      assert(nHits == nTruth,
        s"exact-dup recall must be 1.0 uncapped: $nHits/$nTruth")
    }
  }
}
