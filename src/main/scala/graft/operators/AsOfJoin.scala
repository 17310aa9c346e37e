package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, the latest right row whose time
  * is <= the left row's time, matched per key (inclusive, like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`).
  *
  * Spark has no built-in as-of join. The scalable composition (preference
  * (a) from the build rules — no custom physical operator needed) is
  * union + running `last(..., ignoreNulls)` window:
  *
  *   1. tag both sides, union on (key, time),
  *   2. one shuffle on the key + one sort on (time, side),
  *   3. each left row reads the most recent right payload via a running
  *      window — O(n log n) per partition, no nested-loop, no range
  *      explosion; AQE handles key skew.
  *
  * At cluster scale both inputs shuffle exactly once on the join key —
  * same cost profile as a sort-merge join.
  *
  * Right-side ties on (key, time) are the caller's contract to resolve
  * (pre-aggregate/dedup the right side), as in any as-of semantics.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matching left rows
    *                     (null when no right row precedes the left row).
    * @param toleranceSeconds when set, a match older than this many
    *                     seconds before the left time is rejected
    *                     (payload nulls out) — pandas merge_asof's
    *                     `tolerance`: "the latest right row, but only
    *                     if it is recent enough". Match-then-reject
    *                     keeps the window composition unchanged; the
    *                     staleness test is one codegen'd comparison on
    *                     exact integer µs per left row.
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightPayload.contains),
      "rightPayload column names must not collide with left columns")
    require(toleranceSeconds.forall(_ > 0), "tolerance must be positive")

    // the matched right TIME rides inside the payload struct so the
    // tolerance test can see it after the window
    val payloadStruct = struct(
      col(rightTime).as("__rt") +: rightPayload.map(col): _*)
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), payloadStruct.as("__payload"))
    // align schemas for the union
    val rAligned = r.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__payload")): _*)

    // right rows sort before left rows at equal time → inclusive match
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined0 = l.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val joined = toleranceSeconds match {
      case Some(tol) => joined0.withColumn("__match",
        when(unix_micros(col("__t")) -
          unix_micros(col("__match").getField("__rt")) <= tol * 1000000L,
          col("__match")))
      case None => joined0
    }

    val out = leftCols.map(col) ++
      rightPayload.map(p => col("__match").getField(p).as(p))
    joined.select(out: _*)
  }
}
