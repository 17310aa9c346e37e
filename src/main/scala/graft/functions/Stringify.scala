package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Faithful-output projection: the reference stringifies every scalar
  * leaf and replaces SQL NULL with the literal string "NULL"
  * (`helpers/helpers.go:5-10`), recursing through ROW / ARRAY /
  * TIMESERIES composites (`helpers/helpers.go:12-63`).
  *
  * Re-expressed as a generated `Column` expression tree over the input
  * `StructType` — no UDF, so the whole projection stays inside
  * whole-stage codegen. Composite nulls stay null (the reference checks
  * `NullValue` only at scalar leaves).
  */
object Stringify {

  private val Sentinel = "NULL"

  /** Recursively stringify one column of the given type. */
  def expr(c: Column, dt: DataType): Column = dt match {
    case StructType(fields) =>
      // when() keeps a null struct null — struct() alone never is
      when(c.isNotNull, struct(
        fields.map(f => expr(c.getField(f.name), f.dataType).as(f.name)).toSeq: _*))
    case ArrayType(et, _) =>
      transform(c, x => expr(x, et))
    case MapType(kt, vt, _) =>
      // TIMESERIES analogue: map keyed by (time-)string → stringified value
      map_from_arrays(
        transform(map_keys(c), k => expr(k, kt)),
        transform(map_values(c), v => expr(v, vt)))
    case _ =>
      coalesce(c.cast(StringType), lit(Sentinel))
  }

  /** Stringify every column of a schema, preserving names. */
  def columns(schema: StructType): Seq[Column] =
    schema.fields.toSeq.map(f => expr(col(f.name), f.dataType).as(f.name))
}
