package graft.queries

import graft.{SparkEntry, SparkTestBase}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Invariants of x60 (rolling dedup ingest) beyond the oracle hash:
  * the persisted-log pipeline must equal an independent in-memory fold
  * of the same day-over-day semantics, and reruns must be idempotent
  * (fixed overwrite subdirs, no stale accumulation). */
class RollingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val days = Seq("src7", "src8", "src9")

  /** Reference fold: no persistence, plain DataFrame unions. Day k
    * probes the capped view of base + admitted-days<k postings;
    * admitted docs (and ONLY those) contribute postings to day k+1. */
  private def rollingFold(
      docs: org.apache.spark.sql.DataFrame): Set[(Int, Long)] = {
    var postings = Dedup.bandBuckets(docs.filter(!col("source").isin(days: _*)))
    days.zipWithIndex.flatMap { case (day, i) =>
      val batch = docs.filter(col("source") === day)
      val dup = Dedup.lshProbePairs(Dedup.capPostings(postings), batch)
        .select($"new_doc").distinct().as[Long].collect().toSet
      val adm = batch.select($"doc_id").as[Long].collect()
        .filterNot(dup).toSet
      postings = postings.unionByName(Dedup.bandBuckets(
        batch.filter($"doc_id".isInCollection(adm))))
      adm.map(id => (i + 1, id))
    }.toSet
  }

  private def referenceRolling(): Set[(Int, Long)] =
    rollingFold(graft.Tables.documents(spark, sf0001))

  test("x60: persisted rolling pipeline equals the in-memory reference fold") {
    // force the session BEFORE SparkEntry.queries: defs construction
    // trains the IVF/PQ/k-means codebooks, which need an active (or
    // default) session — evaluating the map sessionless latches those
    // entries rows-only for the whole test JVM (the BenchSpec tripwire
    // caught exactly this ordering on this spec's first version)
    spark.sparkContext
    val got = SparkEntry.queries("x60_rolling_dedup_ingest")(spark, sf0001)
      .select($"ingest_day", $"doc_id").as[(Int, Long)].collect().toSet
    val expected = referenceRolling()
    assert(got == expected,
      s"rolling mismatch: got-only=${(got -- expected).toSeq.sorted.take(5)}, " +
        s"expected-only=${(expected -- got).toSeq.sorted.take(5)}")
    // every batch doc is either admitted or rejected, never duplicated
    val perDay = got.groupBy(_._1).view.mapValues(_.size).toMap
    days.indices.foreach { i =>
      val n = perDay.getOrElse(i + 1, 0)
      assert(n >= 1 && n <= 25, s"day ${i + 1} admitted $n of 25")
    }
  }

  test("x60: rerun in the same JVM is idempotent (no stale log state)") {
    spark.sparkContext // session before defs — see test 1
    val fn = SparkEntry.queries("x60_rolling_dedup_ingest")
    val first = fn(spark, sf0001)
      .select($"ingest_day", $"doc_id").as[(Int, Long)].collect().toSet
    val second = fn(spark, sf0001)
      .select($"ingest_day", $"doc_id").as[(Int, Long)].collect().toSet
    assert(first == second)
  }

  test("s26: streaming rolling ingest converges to the batch pipeline " +
    "(stream ≡ x60, the s23≡x51 contract one composition level up)") {
    spark.sparkContext // session before defs — see test 1
    val stream = SparkEntry.queries("s26_stream_rolling_ingest")(spark, sf0001)
      .select($"ingest_day", $"doc_id", $"n_chars")
      .as[(Int, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("x60_rolling_dedup_ingest")(spark, sf0001)
      .select($"ingest_day", $"doc_id", $"n_chars")
      .as[(Int, Long, Long)].collect().toSet
    assert(stream == batch,
      s"stream-only=${(stream -- batch).toSeq.sorted.take(5)}, " +
        s"batch-only=${(batch -- stream).toSeq.sorted.take(5)}")
  }

  test("posting append via semi-join equals bandBuckets(admitted) — the " +
    "r17 one-signature-pass restructure's equivalence") {
    // x60/s26 now compute the batch's postings ONCE and append the
    // admitted docs' postings by semi-joining that table on the
    // admitted ids, instead of re-running the shingle+md5 signature
    // pass over the admitted subset. Postings are a per-doc
    // deterministic function, so the two must be row-identical.
    val docs = graft.Tables.documents(spark, sf0001)
    val batch = docs.filter(col("source") === "src7")
    // src-keyed fixtures stride doc_id by the source count, so split on
    // a coarser modulus (mod 2/4 would be constant across one source)
    val admittedIds = batch.filter(pmod(col("doc_id"), lit(40)) < 20)
      .select($"doc_id")
    assert(admittedIds.count() > 0 && admittedIds.count() < batch.count(),
      "test split must be a strict non-empty subset")
    val viaSemiJoin = Dedup.bandBuckets(batch)
      .join(admittedIds, Seq("doc_id"), "left_semi")
      .as[(Long, Int, String)].collect().toSet
    val viaRecompute = Dedup.bandBuckets(
      batch.join(admittedIds, Seq("doc_id")))
      .as[(Long, Int, String)].collect().toSet
    assert(viaSemiJoin == viaRecompute && viaSemiJoin.nonEmpty)
  }

  test("x60: day-2 gating sees day-1 admissions (state the isolated " +
    "x51/s25 shapes cannot)") {
    // DIRECT construction, not a monotonicity claim (admission is NOT
    // monotone in postings — adding day-1 postings can push a bucket
    // past the occupancy cap and drop it from the probed view, which
    // can ADMIT a day-2 doc the base-only gate rejected): a day-2 doc
    // that duplicates an ADMITTED day-1 doc and matches nothing in the
    // base corpus must be rejected by the rolling fold but admitted by
    // a base-only gate — the difference IS the day-1 state.
    val textA = "alpha beaver cactus delta eagle falcon grape hotel " +
      "igloo jaguar kepler lemon"
    val docs = Seq(
      (1L, "src0", "one unrelated base document with plenty distinct words"),
      (2L, "src0", "another base document full of different vocabulary here"),
      (10L, "src7", textA), // day 1: unique vs base -> admitted
      (11L, "src7", "second day one document nothing like the others at all"),
      (20L, "src8", textA), // day 2: exact dup of ADMITTED day-1 doc 10
      (30L, "src9", "final day three document with its own words entirely")
    ).toDF("doc_id", "source", "text")
    val rolling = rollingFold(docs)
    assert(rolling.contains((1, 10L)) && rolling.contains((1, 11L)),
      s"day-1 docs should be admitted: $rolling")
    assert(!rolling.exists(_ == (2, 20L)),
      s"day-2 duplicate of an admitted day-1 doc must be REJECTED: $rolling")
    assert(rolling.contains((3, 30L)), s"unique day-3 doc admitted: $rolling")
    // the base-only gate (no day-1 state) ADMITS doc 20 — proving the
    // rejection above is attributable to day-1's postings, not the base
    val base = Dedup.bandBuckets(docs.filter(!col("source").isin(days: _*)))
    val d2 = docs.filter(col("source") === "src8")
    val baseOnlyAdmitted = d2.join(
      Dedup.lshProbePairs(Dedup.capPostings(base), d2)
        .select($"new_doc".as("doc_id")).distinct(), Seq("doc_id"),
      "left_anti").select($"doc_id").as[Long].collect().toSet
    assert(baseOnlyAdmitted.contains(20L),
      s"base-only gate should admit doc 20: $baseOnlyAdmitted")
  }
}
