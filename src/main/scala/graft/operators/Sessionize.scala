package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization façade — the batch sibling of the
  * streaming `session_window` jobs and the second member of the
  * time-series operator family next to [[Resample]]: split each key's
  * irregular event stream into sessions wherever the gap to the
  * previous event exceeds `gapSeconds` (STRICTLY — an exactly-gap-long
  * silence does not split, matching `session_window`'s gap semantics
  * and the reference's time-window inclusivity discipline,
  * `cmd/backup.go:170-178` both-inclusive bounds).
  *
  * Scale shape: ONE shuffle on the key, one per-key sort — the same
  * cost profile as any per-key window chain. The gap flag and the
  * running session ordinal ride the SAME window spec, so Catalyst
  * plans a single Window operator (no second sort, no second
  * exchange); the stats aggregation on (key, session) is map-side
  * combinable and reuses the shuffle's partitioning where AQE allows.
  * Sequential within a key, parallel across keys — the axis a
  * 1000-executor cluster has.
  *
  * Determinism: ordering ties on the timestamp are broken by `tieCol`
  * (a unique id), so session ordinals — and therefore every downstream
  * number — are identical run-to-run and engine-to-engine.
  */
object Sessionize {

  /** Tag every row with a dense 1-based `session_id` per key. */
  def withSessionIds(df: DataFrame, keyCol: String = "user_id",
                     tsCol: String = "ts", tieCol: String = "event_id",
                     gapSeconds: Long = 1800): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) >
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** One row per (key, session): start/end, event count, whole-second
    * duration (exact integer µs difference floor-divided — identical
    * on any engine). */
  def sessionStats(df: DataFrame, keyCol: String = "user_id",
                   tsCol: String = "ts", tieCol: String = "event_id",
                   gapSeconds: Long = 1800): DataFrame =
    withSessionIds(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_seconds",
        expr("(unix_micros(session_end) - unix_micros(session_start)) " +
          "div 1000000"))

  /** Per-key session/event counts — q22's shape. */
  def sessionCounts(df: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "ts", tieCol: String = "event_id",
                    gapSeconds: Long = 1800): DataFrame =
    withSessionIds(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol))
      .agg(max(col("session_id")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
}
