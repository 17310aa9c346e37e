package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the [EXT] LLM-pipeline set);
  * `oracleSql` carries a DuckDB-runnable ANSI-SQL equivalent for every
  * SQL-expressible query (same column names — the driver hash-compares).
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    RefQueries.defs ++ TpchQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs ++ StreamingQueries.defs ++
      SourceQueries.defs ++ BucketQueries.defs ++ TimeSeriesQueries.defs ++
      SqlSurfaceQueries.defs ++ CboQueries.defs ++ PipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core question: partition values in a time range with
    * their per-partition row counts, newest-first data available.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("r4_partition_counts")(spark, "/root/testdata/sf0.001")

  /** ONE consistent snapshot of the surface: each QueryDef pairs its run
    * function with its oracle SQL atomically, so a consumer that derives
    * BOTH views from a single `defs` call can never pair a rows-only
    * fallback run (x37's train-failed branch) with the oracle SQL of a
    * later, successful evaluation — which would verify a corpus-trained
    * result against fixture-trained SQL and report a spurious hash
    * mismatch (r11 advisor). Bench and Verify snapshot through here;
    * `queries`/`oracleSql` below remain for the driver contract and are
    * each internally consistent (one evaluation per call). */
  def defs: Map[String, QueryDef] = allDefs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, d) => k -> d.fn }

  def oracleSql: Map[String, String] =
    defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
