package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectations: declarative row-level rules validated in
  * ONE pass over the table.
  *
  * The shape is the whole point at 100 TB: R rules compile into R
  * conditional counters inside a single hash aggregate over a single
  * scan — violation counting is map-side partial, the shuffle carries
  * one row per partition, and adding a rule costs one counter, not one
  * more full-table pass (the naive per-rule `WHERE NOT p` loop is R
  * scans). The wide 1×(R+1) aggregate row is then unpivoted into
  * (rule, n_checked, n_violations, pass) rows — a zero-shuffle reshape
  * of a single row.
  *
  * Rules are SQL predicate STRINGS that must hold for every row. A
  * predicate evaluating to NULL (three-valued logic, see q66) counts
  * as a violation — "unknown" is not "held", which is the contract a
  * pipeline gate needs.
  */
object Expectations {

  final case class Rule(name: String, predicate: String)

  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names")
    val counters =
      count(lit(1)).as("n_checked") +:
        rules.map(r => count_if(!coalesce(expr(r.predicate), lit(false)))
          .as(s"v_${r.name}"))
    val wide = df.agg(counters.head, counters.tail: _*)
    wide.unpivot(
        ids = Array(col("n_checked")),
        values = rules.map(r => col(s"v_${r.name}")).toArray,
        variableColumnName = "rule",
        valueColumnName = "n_violations")
      .select(
        expr("substring(rule, 3)").as("rule"), // strip the v_ prefix
        col("n_checked"),
        col("n_violations"),
        (col("n_violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }
}
