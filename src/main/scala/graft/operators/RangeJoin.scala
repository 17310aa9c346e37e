package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-replicated interval join: the big×big scale path for range
  * predicates.
  *
  * q21's shape (broadcast nested loop) is right when one side fits in
  * a broadcast; when BOTH sides are large — every "which readings fall
  * inside which sessions" question at 100 TB — an NL join is O(|L|·|R|)
  * and a shuffle can't help because there is no equality key. Binning
  * manufactures one: carve time into fixed-width bins, replicate each
  * interval onto every bin it overlaps (sequence + explode), tag each
  * point with the single bin containing it, then run a plain shuffled
  * equi-join on the bin id followed by the exact range predicate.
  *
  * Correctness without dedup: a point lives in EXACTLY one bin, so a
  * qualifying (interval, point) pair meets in exactly one bin — no
  * duplicate pairs, no DISTINCT pass. (Interval×interval overlap joins
  * would need the floor(greatest(s1,s2)/w)-ownership trick; this
  * operator is the interval×point case.)
  *
  * Cost model: shuffle volume is |points| + |intervals|·(span/binWidth
  * + 1). Pick binWidth near the TYPICAL interval span: too small
  * explodes the interval side, too large degrades each bin to a local
  * NL over unrelated rows. Bin-level skew (a hot hour) is ordinary
  * equi-join skew — AQE's skew-join split applies, unlike an NL join
  * which AQE cannot touch.
  *
  * Ref behavior anchor: the reference's only range predicate is the
  * both-inclusive time window pushed into its scans
  * (`cmd/backup.go:170-178`); interval×point containment is engine
  * surface it has no answer for at any scale.
  */
object RangeJoin {

  /** Stats-derived bin width (r15 verdict #5): the MEDIAN interval
    * span in whole seconds (≥ 1), from ONE column-pruned aggregate
    * pre-pass — `approx_percentile` is a GK sketch with map-side
    * partials, so the pre-pass shuffles sketch summaries (not rows)
    * and the scan reads only the two endpoint columns. The cost model
    * in the class doc says "pick binWidth near the TYPICAL interval
    * span"; the median IS that statistic: half the intervals replicate
    * onto ≤ 2 bins, and bins stay tight enough that the exact
    * predicate does the residual work. A caller with domain knowledge
    * (or a skewed span distribution worth a fatter quantile) keeps the
    * explicit-width overloads. */
  def derivedBinSeconds(intervals: DataFrame, sCol: String,
                        eCol: String): Long = {
    val r = intervals.select(expr(
      s"approx_percentile(unix_micros($eCol) - unix_micros($sCol), 0.5)")
      .as("p")).head()
    if (r.isNullAt(0)) 1L
    else math.max(1L, (r.getLong(0) + 999999L) / 1000000L)
  }

  /** [[binnedIntervalJoin]] with the bin width derived from the
    * interval-side median span. */
  def binnedIntervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      sCol: String,
      eCol: String,
      tCol: String): DataFrame =
    binnedIntervalJoin(intervals, points, sCol, eCol, tCol,
      derivedBinSeconds(intervals, sCol, eCol))

  /** Join `intervals` (columns `sCol`,`eCol`: timestamp, half-open
    * [s, e)) with `points` (column `tCol`: timestamp) on containment.
    * Column sets must be disjoint. Returns the joined frame with
    * helper columns removed. */
  def binnedIntervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      sCol: String,
      eCol: String,
      tCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val w = binSeconds * 1000000L // work in microseconds
    val ivl = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(sCol)) / w),
        // floor(e/w) is a superset bound when e sits on a bin edge;
        // the exact predicate below removes the empty slack
        floor(unix_micros(col(eCol)) / w))))
    val pts = points.withColumn("__bin",
      floor(unix_micros(col(tCol)) / w))
    ivl.join(pts, Seq("__bin"))
      .filter(col(tCol) >= col(sCol) && col(tCol) < col(eCol))
      .drop("__bin")
  }

  /** [[binnedOverlapJoin]] with the bin width derived from the LARGER
    * of the two sides' median spans: with w ≥ both medians, a typical
    * interval on either side overlaps ≤ 2 bins, bounding replication
    * at ~2× while keeping bins as tight as that bound allows (a width
    * under the larger median would replicate that side ∝ span/w for
    * half its rows). */
  def binnedOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      s1: String, e1: String,
      s2: String, e2: String): DataFrame =
    binnedOverlapJoin(left, right, s1, e1, s2, e2,
      math.max(derivedBinSeconds(left, s1, e1),
        derivedBinSeconds(right, s2, e2)))

  /** Interval×interval overlap join ([s1,e1) ∩ [s2,e2) ≠ ∅), both
    * sides large. Both sides replicate onto their bins, so a
    * qualifying pair meets in EVERY bin their spans share — the
    * owner-bin rule keeps only the bin containing the overlap's start
    * (floor(max(s1,s2)/w)), restoring exactly-once semantics without a
    * DISTINCT over the (potentially huge) pair set. Column sets must
    * be disjoint. */
  def binnedOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      s1: String, e1: String,
      s2: String, e2: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val w = binSeconds * 1000000L
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin",
        explode(sequence(
          floor(unix_micros(col(s)) / w),
          floor(unix_micros(col(e)) / w))))
    binned(left, s1, e1).join(binned(right, s2, e2), Seq("__bin"))
      .filter(col(s1) < col(e2) && col(s2) < col(e1) &&
        col("__bin") ===
          floor(unix_micros(greatest(col(s1), col(s2))) / w))
      .drop("__bin")
  }
}
