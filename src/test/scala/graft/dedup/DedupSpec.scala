package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (1L, "alpha beta gamma delta epsilon"),      // exact dup of 0
    (2L, "alpha beta gamma delta zeta"),          // near dup of 0
    (3L, "one two three four five six seven"),    // unrelated
    (4L, "unrelated words entirely different here")
  ).toDF("doc_id", "text")

  test("identical texts are always LSH candidates; disjoint texts never") {
    val pairs = Dedup.lshCandidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"identical docs must collide: $pairs")
    assert(!pairs.contains((3L, 4L)) && !pairs.contains((0L, 3L)))
  }

  test("simhash: identical texts get identical fingerprints") {
    val sims = Dedup.withSimhash(docs)
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(1L))
    assert(sims(0L) != sims(3L))
    // 48-bit range
    assert(sims.values.forall(v => v >= 0 && v < (1L << 48)))
  }

  test("simhashPairs finds the exact-dup pair with hamming 0") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select($"doc_a", $"doc_b", $"hamming").as[(Long, Long, Int)]
      .collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
  }

  test("bucket-occupancy cap: 10k identical docs degrade to star pairs, not n²/2") {
    // Uncapped, one band bucket holding all 10k ids would materialize
    // 10k·9999/2 ≈ 50 M pair structs (~800 MB) in a single task row.
    // With the cap the expansion is the star pattern: n-1 pairs per
    // bucket, identical across bands → n-1 distinct pairs total.
    val n = 10000
    val many = spark.range(n).selectExpr(
      "id AS doc_id", "'same boilerplate page text here' AS text")
    val cnt = Dedup.lshCandidatePairs(many).count()
    assert(cnt == n - 1, s"expected star degradation to ${n - 1} pairs, got $cnt")
    val sh = Dedup.simhashPairs(many, maxHamming = 3).count()
    assert(sh == n - 1, s"expected star degradation to ${n - 1} pairs, got $sh")
  }

  test("ngramJaccardPairs leaves no cached relation after its first action") {
    val d2 = Seq(
      (0L, "a b c d e"), (1L, "a b c d x"), (2L, "q r s t u")
    ).toDF("doc_id", "text")
    spark.catalog.clearCache()
    // other suites may have un-GC'd localCheckpoint RDDs lingering;
    // assert only that THIS call leaves no new persistent RDD behind
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.ngramJaccardPairs(d2, maxDf = 10, threshold = 0.4).count()
    // the unpersist listener is async on the listener bus
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def cacheEmpty: Boolean =
      spark.sparkContext.getPersistentRDDs.keySet.subsetOf(baseline)
    while (!cacheEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cacheEmpty, "shingle-table InMemoryRelation survived the action")
  }

  test("gram hashes are collision-free on the fixture (narrow jaccard is exact)") {
    // ngramJaccardPairs represents shingle sets by their 60-bit hashes;
    // the oracle computes on strings — equality of the two requires no
    // hash collisions among the fixture's distinct grams
    import org.apache.spark.sql.functions.{explode, expr}
    val docsTab = graft.Tables.documents(spark, sf0001)
    val grams = Dedup.withShingles(docsTab)
      .select(explode($"gs").as("gram")).distinct()
    val nGrams = grams.count()
    val nHashes = grams
      .select(expr("graft_hash60_array(array(gram), 0)")(0).as("h"))
      .distinct().count()
    assert(nGrams == nHashes, s"hash collision: $nGrams grams, $nHashes hashes")
  }

  test("dupClusters: transitive closure via label propagation") {
    // components {1,2,3} (chained), {7,9}; cluster = min member
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("PPJoin prefix filtering shrinks candidates and loses no fixture pair") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Dedup.ngramJaccardPairs(docs, maxDf = 10, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet

    // reference: candidates from the df-window alone (no prefix), exact
    // jaccard over the string shingle sets — the pre-PPJoin semantics
    val g = Dedup.withShingles(docs).select($"doc_id", $"gs")
    val ex = g.select($"doc_id", explode($"gs").as("gram"))
    val dfTab = ex.groupBy("gram").agg(count(lit(1)).as("df"))
    val rare = dfTab.filter($"df" >= 2 && $"df" <= 10).select("gram")
    val candOld = ex.join(rare, "gram")
      .groupBy("gram").agg(collect_list($"doc_id").as("ids"))
      .select(explode(expr(s"graft_pairs(array_sort(ids), 1024)")).as("p"))
      .select($"p.l".as("doc_a"), $"p.r".as("doc_b")).distinct()
    val expected = candOld
      .join(g.select($"doc_id".as("doc_a"), $"gs".as("gs_a")), "doc_a")
      .join(g.select($"doc_id".as("doc_b"), $"gs".as("gs_b")), "doc_b")
      .withColumn("ni", size(array_intersect($"gs_a", $"gs_b")))
      .withColumn("jaccard", round($"ni".cast("double") /
        (size($"gs_a") + size($"gs_b") - $"ni"), 6))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet

    assert(got == expected)

    // and the prefix actually prunes: posted grams < rare posted grams
    val nOld = ex.join(rare, "gram").count()
    val w = Window.partitionBy($"doc_id").orderBy($"df", $"gram")
    val nNew = ex.join(dfTab.filter($"df" >= 2), "gram")
      .join(g.select($"doc_id", size($"gs").as("n_gs")), "doc_id")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= $"n_gs" - ceil($"n_gs" * lit(0.5)) + lit(1))
      .filter($"df" <= 10)
      .count()
    info(s"posted grams: df-blocking=$nOld, +prefix=$nNew")
    assert(nNew < nOld)
  }

  test("ngramJaccard computes exact jaccard on candidates") {
    // shingles(0) = {a b c, b c d, c d e}; shingles(2) swaps last word:
    // {a b g, b g d... } — build a pair with known jaccard instead
    val d2 = Seq(
      (0L, "a b c d e"),   // 3-grams {abc, bcd, cde}
      (1L, "a b c d x"),   // 3-grams {abc, bcd, cdx} → inter 2, union 4
      (2L, "q r s t u")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d2, maxDf = 10, threshold = 0.4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.length == 1)
    assert(pairs.head._1 == 0L && pairs.head._2 == 1L)
    assert(math.abs(pairs.head._3 - 0.5) < 1e-9)
  }

  test("high-df grams count toward exact jaccard via the survivor refine") {
    // df("a b c") = 3 > maxDf=2: excluded from candidacy blocking but
    // MUST count toward |A∩B| — (0,1) gets candidacy from the window
    // gram "b c d" (df 2) and passes 0.4 ONLY with the high gram
    // counted: inter {abc,bcd} = 2, union 4 -> 0.5. Without the high
    // contribution the jaccard would read 1/5 = 0.2 and the pair would
    // be lost. (3,4) is a candidate via "p q r" (df 2) but its true
    // jaccard 1/5 = 0.2 fails the threshold — the upper-bound gate
    // must drop it without fetching any array.
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d x"),
      (2L, "a b c z y"),
      (3L, "p q r s t"),
      (4L, "p q r u v")
    ).toDF("doc_id", "text")
    // smallCorpusMaxDocs = 0 forces the COUNT regime (ub-gate +
    // survivor refine) — the default gate would route 5 docs to the
    // array regime, which is inherently exact at any df
    val got = Dedup.ngramJaccardPairs(docs, maxDf = 2, threshold = 0.4,
      smallCorpusMaxDocs = 0)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 1L, 0.5)))
  }

  test("with high-df grams present, pairs match the string brute force " +
    "(fixture, maxDf=3)") {
    // sf0.001's df distribution reaches 6, so maxDf=3 forces a real
    // high-df population through the ub-gate + survivor-refine path;
    // the reference is candidates from the df-window alone (prefix
    // filtering loses no pair at or above the threshold) with exact
    // jaccard over the string shingle sets.
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Dedup.ngramJaccardPairs(docs, maxDf = 3, threshold = 0.5,
      smallCorpusMaxDocs = 0) // force the count regime under high df
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // and the ARRAY regime (the default gate at this corpus size) must
    // produce the identical pair set — the regime switch is a physical
    // choice, never a semantic one
    val gotArray = Dedup.ngramJaccardPairs(docs, maxDf = 3, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == gotArray, "verify regimes disagree")
    val g = Dedup.withShingles(docs).select($"doc_id", $"gs")
    val ex = g.select($"doc_id", explode($"gs").as("gram"))
    val dfTab = ex.groupBy("gram").agg(count(lit(1)).as("df"))
    assert(dfTab.filter($"df" > 3).count() > 0,
      "fixture must exercise the high-df path at maxDf=3")
    val rare = dfTab.filter($"df" >= 2 && $"df" <= 3).select("gram")
    val candOld = ex.join(rare, "gram")
      .groupBy("gram").agg(collect_list($"doc_id").as("ids"))
      .select(explode(expr(s"graft_pairs(array_sort(ids), 1024)")).as("p"))
      .select($"p.l".as("doc_a"), $"p.r".as("doc_b")).distinct()
    val expected = candOld
      .join(g.select($"doc_id".as("doc_a"), $"gs".as("gs_a")), "doc_a")
      .join(g.select($"doc_id".as("doc_b"), $"gs".as("gs_b")), "doc_b")
      .withColumn("ni", size(array_intersect($"gs_a", $"gs_b")))
      .withColumn("jaccard", round($"ni".cast("double") /
        (size($"gs_a") + size($"gs_b") - $"ni"), 6))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("ngramJaccard wide-hash mode agrees with 60-bit mode on real docs") {
    // Same candidates by construction (posting stays 60-bit); the
    // verify counts agree wherever 60-bit collisions are absent — i.e.
    // everywhere at fixture scale. Past ~10^8 distinct grams only the
    // wide mode keeps the exact-jaccard claim (DedupKernelsSpec pins
    // the collision behavior at kernel level).
    val docs = graft.Tables.documents(spark, sf0001).limit(300)
    val narrow = Dedup.ngramJaccardPairs(docs, maxDf = 10, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    val wide = Dedup.ngramJaccardPairs(docs, maxDf = 10, threshold = 0.5,
      wideHash = true)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    assert(narrow.nonEmpty)
    assert(narrow.toSeq == wide.toSeq)
  }

  test("contamination: a leaked test doc scores 1.0, a clean one 0.0") {
    import org.apache.spark.unsafe.types.UTF8String
    def bucket(id: Long): Long =
      graft.functions.DedupKernels.hash60(
        UTF8String.fromString(id.toString), 42) % 100
    // pick real split members by the same hash the operator uses
    val trainId = (0L until 1000L).find(bucket(_) < 80).get
    val ids = (0L until 1000L).filter(bucket(_) >= 90)
    val (leakedId, cleanId) = (ids.head, ids(1))
    val docs = Seq(
      (trainId, "the cat sat on the mat today"),
      (leakedId, "the cat sat on the mat today"), // identical -> leaked
      (cleanId, "completely unrelated novel words here")
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(docs)
      .select($"doc_id", $"containment").as[(Long, Double)].collect().toMap
    assert(got.size == 2)
    assert(got(leakedId) == 1.0)
    assert(got(cleanId) == 0.0)
  }
}
