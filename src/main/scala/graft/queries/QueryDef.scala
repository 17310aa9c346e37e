package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (when SQL-expressible)
  * an ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names MUST match between the two — the driver sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)

  /** Fixed scratch dir per (query, sf), reused across runs with
    * mode=overwrite writes — repeated Verify/Bench invocations replace
    * the previous copy instead of leaking a fresh temp dir per run.
    */
  def scratchDir(name: String, sfDir: String): String = {
    val sf = new java.io.File(sfDir).getName
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch_${name}_$sf"
  }
}
