package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins q68's two claims about the binned interval×point join:
  *   - the physical plan is a shuffled equi-join on the bin key, with
  *     NO BroadcastNestedLoop anywhere (the thing binning exists to
  *     eliminate for big×big inputs);
  *   - pair-for-pair equivalence with the naive NL range join on the
  *     fixture, proving the bin replication neither drops nor
  *     duplicates a single qualifying pair (a point's home bin is
  *     unique, so no DISTINCT is needed).
  */
class RangeJoinBinnedSpec extends SparkTestBase {

  private def sides() = {
    val ev = Tables.events(spark, sf0001)
    val iv = ev.select(col("event_id").as("ivl_id"), col("ts").as("s"),
      expr("ts + make_interval(0, 0, 0, 0, 0, " +
        "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as("e"))
    val pt = ev.select(col("event_id").as("pt_id"), col("ts").as("t"))
    (iv, pt)
  }

  test("binned plan is an equi-join, never a nested loop") {
    val (iv, pt) = sides()
    val joined = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", 3600)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"binned range join fell back to a non-equi plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"no hash/merge equi-join found in plan:\n$plan")
  }

  test("binned result matches the naive NL range join exactly") {
    val (iv, pt) = sides()
    val binned = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", 3600)
      .select(col("ivl_id"), col("pt_id"))
    val naive = iv.join(pt, col("t") >= col("s") && col("t") < col("e"))
      .select(col("ivl_id"), col("pt_id"))
    assert(binned.count() == naive.count(), "pair count differs")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "pair multiset differs between binned and NL range join")
  }

  test("overlap join: owner-bin rule gives exactly-once pairs, no NL") {
    val ev = Tables.events(spark, sf0001)
    def ivls(id: String, sN: String, eN: String, parity: Int) =
      ev.filter(col("event_id") % 2 === parity)
        .select(col("event_id").as(id), col("ts").as(sN),
          expr("ts + make_interval(0, 0, 0, 0, 0, " +
            "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as(eN))
    val a = ivls("a_id", "s1", "e1", 0)
    val b = ivls("b_id", "s2", "e2", 1)
    val binned = RangeJoin.binnedOverlapJoin(a, b, "s1", "e1", "s2", "e2", 3600)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join fell back to a non-equi plan:\n$plan")
    val got = binned.select(col("a_id"), col("b_id"))
    val naive = a.join(b, col("s1") < col("e2") && col("s2") < col("e1"))
      .select(col("a_id"), col("b_id"))
    assert(got.count() == naive.count(), "overlap pair count differs")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "overlap pair multiset differs between binned and NL join")
  }

  test("bin-width sweep: pair set invariant and replication bounded " +
    "across 3+ orders of magnitude of binSeconds") {
    // binSeconds is a COST knob, never a correctness knob: the result
    // must be identical at any width, and the interval-side replication
    // must follow the span/binWidth+1 model (too-small bins explode
    // rows predictably, never silently). Fixture intervals span ≤60min.
    val (iv, pt) = sides()
    val widths = Seq(60L, 600L, 3600L, 36000L, 86400L)
    val pairCounts = widths.map { w =>
      val joined = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", w)
        .select(col("ivl_id"), col("pt_id"))
      w -> joined.count()
    }.toMap
    assert(pairCounts.values.toSet.size == 1,
      s"pair count varies with bin width: $pairCounts")
    // spot-check full multiset equality at the two extremes
    val lo = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", widths.head)
      .select(col("ivl_id"), col("pt_id"))
    val hi = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", widths.last)
      .select(col("ivl_id"), col("pt_id"))
    assert(lo.exceptAll(hi).isEmpty && hi.exceptAll(lo).isEmpty,
      "pair multiset differs between 60s and 86400s bins")

    // replication model: each interval lands on floor(e/w)-floor(s/w)+1
    // bins ≤ span/w + 2; spans are ≤3600s, so the 60s-bin blowup is
    // bounded at 62× and the ≥3600s widths at ≤3×
    val nIntervals = iv.count()
    widths.foreach { w =>
      val replicated = iv.select(
        (floor(unix_micros(col("e")) / (w * 1000000L)) -
          floor(unix_micros(col("s")) / (w * 1000000L)) + 1).as("n"))
        .agg(sum(col("n"))).head.getLong(0)
      val cap = nIntervals * (3600 / w + 2)
      assert(replicated <= cap,
        s"bin=$w: replication $replicated exceeds model cap $cap")
    }

    // same invariance for the overlap join at three widths
    val ev = Tables.events(spark, sf0001)
    def ivls(id: String, sN: String, eN: String, parity: Int) =
      ev.filter(col("event_id") % 2 === parity)
        .select(col("event_id").as(id), col("ts").as(sN),
          expr("ts + make_interval(0, 0, 0, 0, 0, " +
            "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as(eN))
    val a = ivls("a_id", "s1", "e1", 0)
    val b = ivls("b_id", "s2", "e2", 1)
    val overlapCounts = Seq(60L, 3600L, 86400L).map { w =>
      w -> RangeJoin.binnedOverlapJoin(a, b, "s1", "e1", "s2", "e2", w).count()
    }.toMap
    assert(overlapCounts.values.toSet.size == 1,
      s"overlap pair count varies with bin width: $overlapCounts")
  }

  test("derived bin width: the median-span statistic lands in-range " +
    "and the no-width overloads join identically (r15 verdict #5)") {
    val (iv, pt) = sides()
    // fixture spans are uniform-ish over [60s, 3600s] (value clamp
    // 1..60 min): the median must sit strictly inside, nowhere near
    // either degenerate end
    val w = RangeJoin.derivedBinSeconds(iv, "s", "e")
    assert(w >= 60L && w <= 3600L, s"derived width $w outside the " +
      "fixture's span range [60, 3600]")
    assert(w > 300L && w < 3400L,
      s"derived width $w is not a central statistic of 1..60 min spans")
    // the derived-width overload is the same join, bit for bit
    val derived = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t")
      .select(col("ivl_id"), col("pt_id"))
    val explicit = RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", 3600)
      .select(col("ivl_id"), col("pt_id"))
    assert(derived.exceptAll(explicit).isEmpty &&
      explicit.exceptAll(derived).isEmpty,
      "derived-width interval join differs from explicit-width result")

    val ev = Tables.events(spark, sf0001)
    def ivls(id: String, sN: String, eN: String, parity: Int) =
      ev.filter(col("event_id") % 2 === parity)
        .select(col("event_id").as(id), col("ts").as(sN),
          expr("ts + make_interval(0, 0, 0, 0, 0, " +
            "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as(eN))
    val a = ivls("a_id", "s1", "e1", 0)
    val b = ivls("b_id", "s2", "e2", 1)
    val dOv = RangeJoin.binnedOverlapJoin(a, b, "s1", "e1", "s2", "e2")
      .select(col("a_id"), col("b_id"))
    val eOv = RangeJoin.binnedOverlapJoin(a, b, "s1", "e1", "s2", "e2", 3600)
      .select(col("a_id"), col("b_id"))
    assert(dOv.exceptAll(eOv).isEmpty && eOv.exceptAll(dOv).isEmpty,
      "derived-width overlap join differs from explicit-width result")

    // degenerate inputs: empty interval side and zero-length spans
    // derive the 1-second floor instead of failing
    val empty = iv.filter(lit(false))
    assert(RangeJoin.derivedBinSeconds(empty, "s", "e") == 1L)
    val zero = iv.withColumn("e", col("s"))
    assert(RangeJoin.derivedBinSeconds(zero, "s", "e") == 1L)
  }
}
