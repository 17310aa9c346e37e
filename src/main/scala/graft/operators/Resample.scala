package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Resampling / regularization façade — the reusable operator behind
  * the q43/q75/q76/q77 query family: turn an IRREGULAR event stream
  * (the reference's data model: rows at arbitrary `time` points,
  * `cmd/backup.go:240-248` orders by it) into a REGULAR series on a
  * fixed grid, with the four fill/downsample semantics a telemetry
  * pipeline needs:
  *
  *  - [[gapFillLocf]]  — last-observation-carried-forward onto a dense
  *    bucket grid (metering: "what was the level during this hour")
  *  - [[gapFillLerp]]  — linear interpolation between the bracketing
  *    observations (smooth quantities: prices, temperatures)
  *  - [[timeWeightedAvg]] — each sample weighted by how long it was
  *    current (the correct mean under irregular sampling; a plain avg
  *    over-weights bursts)
  *  - [[ohlc]]         — open/high/low/close/volume candlesticks (the
  *    canonical tick downsample)
  *
  * Scale shape (the 100 TB contract, same scaladoc discipline as
  * [[Compact]]/[[Expectations]]):
  *  - ONE full-data shuffle per call — the bucket hash-aggregation (or
  *    the per-(key,day) window for TWA/OHLC). Everything after operates
  *    on #keys × #buckets grid rows, whose size is independent of the
  *    input row count.
  *  - The dense grid is generated declaratively (`sequence` + `explode`
  *    over the observed span, cross-joined with the distinct keys) —
  *    never by scanning the raw stream a second time. The span
  *    aggregate is a single-row broadcast.
  *  - Fill windows partition BY KEY: sequential within a key, parallel
  *    across keys — the partition axis a 1000-executor cluster has.
  *  - No UDFs, no driver-side loops; every expression is codegen'd.
  *
  * Numeric discipline (cross-engine exactness, see
  * `TpchQueries.asD`): values go DECIMAL(12,2) before any arithmetic,
  * weights stay integral, and doubles are only produced through the
  * digit string (`cast(string).cast(double)`) so results are
  * bit-identical with a DuckDB/Trino oracle at any magnitude.
  */
object Resample {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def asD(c: Column): Column = c.cast("string").cast("double")

  /** Observed buckets: the one full-data shuffle. Returns
    * (`keyCol`, bucket, n_events, sum_value DECIMAL). */
  private def bucketize(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, every: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc(every, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(dec(col(valueCol))).as("sum_value"))

  /** Dense (key × bucket) grid spanning the observed range. Grid size =
    * #keys × #buckets — input-row-count independent. */
  private def denseGrid(df: DataFrame, obs: DataFrame, keyCol: String,
                        every: String): DataFrame = {
    val buckets = obs
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"interval 1 $every"))).as("bucket"))
    df.select(col(keyCol)).distinct().crossJoin(buckets)
  }

  /** Regularize onto a dense `every` grid with LOCF fill. Output per
    * (key, bucket): `n_events` (0 on gaps), `sum_value` (0.0 on gaps),
    * `filled_value` (last observed sum carried forward; -1.0 sentinel
    * when the key has no history yet — a NULL double would round-trip
    * as NaN through some oracle paths), `was_gap`. Values are
    * digit-string doubles. */
  def gapFillLocf(df: DataFrame, keyCol: String = "event_type",
                  tsCol: String = "ts", valueCol: String = "value",
                  every: String = "hour"): DataFrame = {
    val obs = bucketize(df, keyCol, tsCol, valueCol, every)
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    denseGrid(df, obs, keyCol, every)
      .join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        asD(coalesce(col("sum_value"), dec(lit(0)))).as("sum_value"),
        asD(coalesce(last(col("sum_value"), ignoreNulls = true).over(fill),
          dec(lit(-1)))).as("filled_value"),
        col("n_events").isNull.as("was_gap"))
  }

  /** Regularize onto a dense `every` grid, filling gaps on the LINE
    * between the bracketing observations. Boundary semantics: leading
    * gaps take the next observation, trailing gaps the previous, a key
    * with no observations the -1.0 sentinel. The lerp is a FIXED
    * parenthesization of IEEE double ops over digit-string doubles and
    * exact integer bucket indices — evaluated identically on any
    * IEEE-754 engine — and is emitted per row, never summed. */
  /** Microseconds per grid step for the date_trunc units the grid
    * generator understands (week+ units are not fixed-width in µs and
    * are deliberately absent). */
  private val UnitMicros: Map[String, Long] = Map(
    "minute" -> 60000000L,
    "hour" -> 3600000000L,
    "day" -> 86400000000L)

  def gapFillLerp(df: DataFrame, keyCol: String = "event_type",
                  tsCol: String = "ts", valueCol: String = "value",
                  every: String = "hour"): DataFrame = {
    val stepMicros = UnitMicros.getOrElse(every,
      throw new IllegalArgumentException(
        s"gapFillLerp supports ${UnitMicros.keys.mkString("/")}, not $every" +
          " (the lerp needs a fixed-width integer bucket index)"))
    val obs = bucketize(df, keyCol, tsCol, valueCol, every)
      .drop("n_events")
    val j = denseGrid(df, obs, keyCol, every)
      .join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("t", expr(s"unix_micros(bucket) div ${stepMicros}L"))
      .withColumn("obs_t", when(col("sum_value").isNotNull, col("t")))
      .withColumn("obs_v", asD(col("sum_value")))
    val back = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j.withColumn("pt", last(col("obs_t"), ignoreNulls = true).over(back))
      .withColumn("pv", last(col("obs_v"), ignoreNulls = true).over(back))
      .withColumn("nt", first(col("obs_t"), ignoreNulls = true).over(fwd))
      .withColumn("nv", first(col("obs_v"), ignoreNulls = true).over(fwd))
      .select(col(keyCol), col("bucket"),
        col("obs_t").isNull.as("was_gap"),
        when(col("pv").isNull && col("nv").isNull, lit(-1.0))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .when(col("nt") === col("pt"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("t") - col("pt")).cast("double") /
              (col("nt") - col("pt")).cast("double")))
          .as("filled"))
  }

  /** Per (key, day) time-weighted average: each observation weighted by
    * the whole-second gap to the NEXT observation in the same day (the
    * final observation of a day carries no weight; zero-gap pairs are
    * excluded). `tieCol` breaks equal-timestamp ordering so both
    * engines agree on lead(). Weights stay BIGINT seconds, values
    * DECIMAL, and the division is digit-string-double / double. */
  def timeWeightedAvg(df: DataFrame, keyCol: String = "event_type",
                      tsCol: String = "ts", valueCol: String = "value",
                      tieCol: String = "event_id"): DataFrame = {
    val win = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), to_date(col(tsCol)).as("day"), col(tsCol),
        col(tieCol), dec(col(valueCol)).as("v"))
      .withColumn("nxt", lead(col(tsCol), 1).over(win))
      .withColumn("dt",
        expr(s"(unix_micros(nxt) - unix_micros($tsCol)) div 1000000"))
      .filter(col("nxt").isNotNull && col("dt") > 0)
      .groupBy(col(keyCol), col("day"))
      .agg((asD(sum(col("v") * col("dt"))) /
          sum(col("dt")).cast("double")).as("twa"),
        count(lit(1)).as("n_weights"))
  }

  /** Per (key, day) OHLC candlestick: open/close picked by row_number
    * over the unique (`tsCol`, `tieCol`) order — deterministic under
    * timestamp ties, where a bare min_by(ts) would not be. Two windows
    * + one aggregate, all partition-local until the per-group row. */
  def ohlc(df: DataFrame, keyCol: String = "event_type",
           tsCol: String = "ts", valueCol: String = "value",
           tieCol: String = "event_id"): DataFrame = {
    val asc = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col(tsCol), col(tieCol))
    val desc = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.select(col(keyCol), to_date(col(tsCol)).as("day"), col(tsCol),
        col(tieCol), dec(col(valueCol)).as("v"))
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col(keyCol), col("day"))
      .agg(asD(min(when(col("rn_a") === 1, col("v")))).as("open"),
        asD(max(col("v"))).as("high"),
        asD(min(col("v"))).as("low"),
        asD(min(when(col("rn_d") === 1, col("v")))).as("close"),
        count(lit(1)).as("n"),
        asD(sum(col("v"))).as("volume"))
  }
}
