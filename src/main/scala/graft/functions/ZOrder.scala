package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * technique behind parquet data skipping at warehouse scale: bit-
  * interleaving two dimension keys makes files written in z-value
  * ranges carry TIGHT min/max statistics on BOTH dimensions, so a box
  * predicate (a BETWEEN … AND b BETWEEN …) prunes row groups/files on
  * either column — a single-column sort only ever skips on its one
  * leading column.
  *
  * The z-value is pure long arithmetic composed from builtin codegen'd
  * expressions (shifts, masks, adds) — it stays inside whole-stage
  * codegen with no custom Expression needed, and a DuckDB oracle
  * reproduces it with the same integer arithmetic.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * columns: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. `bits` ≤ 31 (result stays in a signed long). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same interleave in DuckDB SQL (for oracles): `a`/`b` are SQL
    * expressions yielding non-negative BIGINTs. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a) // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((($b) // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Cluster `df` for box-predicate pruning on (a, b): range-partition
    * by z-value into `files` output files and sort each file by z, so
    * every file covers a compact z-range — i.e. a tight (a, b)
    * rectangle — and parquet min/max stats prune files/row-groups on
    * EITHER dimension. The write is one range exchange + local sort;
    * no shuffle skew (range boundaries come from sampling). */
  def clusterByZ(df: DataFrame, a: String, b: String, files: Int,
                 bits: Int = 16): DataFrame =
    df.withColumn("z_val", zValue(col(a), col(b), bits))
      .repartitionByRange(files, col("z_val"))
      .sortWithinPartitions(col("z_val"))
      // pure layout transform: the helper column is derivable at read
      // time, so don't persist 8 bytes/row of it (the projection keeps
      // the established per-partition order at write time)
      .drop("z_val")
}
