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
  private def referenceRolling(): Set[(Int, Long)] = {
    val docs = graft.Tables.documents(spark, sf0001)
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

  test("x60: day-2 gating sees day-1 admissions (state the isolated " +
    "x51/s25 shapes cannot)") {
    // day-2 duplicates of ADMITTED day-1 docs must be rejected even
    // when they match nothing in the base corpus: verify that the set
    // of postings day 2 is gated on is exactly base + day-1 admitted
    // (not base alone) by showing the reference fold with day-1
    // admissions withheld admits a SUPERSET on day 2.
    val docs = graft.Tables.documents(spark, sf0001)
    val base = Dedup.bandBuckets(docs.filter(!col("source").isin(days: _*)))
    val d2 = docs.filter(col("source") === "src8")
    val withoutDay1 = d2.join(
      Dedup.lshProbePairs(Dedup.capPostings(base), d2)
        .select($"new_doc".as("doc_id")).distinct(), Seq("doc_id"),
      "left_anti").select($"doc_id").as[Long].collect().toSet
    val rolling = referenceRolling().collect { case (2, id) => id }
    assert(rolling.subsetOf(withoutDay1),
      "day-2 admissions must only shrink when day-1 postings are added")
  }
}
