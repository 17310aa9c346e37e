package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cost-based optimization surface (q71): ANALYZE TABLE statistics
  * driving a join-strategy decision the size-only planner gets wrong.
  *
  * Without statistics Spark's size-only estimator propagates a scan's
  * FILE size through a filter unchanged, so a dimension whose file is
  * over the broadcast threshold plans a sort-merge join even when the
  * filter keeps 1/15 of it. With `spark.sql.cbo.enabled` and column
  * statistics, FilterEstimation multiplies the two equality
  * selectivities (1/ndv each), the post-filter estimate drops under
  * the threshold, and the SAME un-hinted query plans a broadcast hash
  * join. At 100 TB this is the difference between hinting every query
  * by hand and letting ANALYZE-maintained stats steer the planner;
  * CboSpec pins the flip (SMJ stats-less → BHJ with stats) at a
  * threshold both sides of which the fixture actually crosses.
  *
  * AQE is deliberately OFF in this session: AQE re-plans from RUNTIME
  * sizes and would mask whether the STATIC cost model did its job —
  * the runtime complement is covered by q28/AQE elsewhere.
  */
object CboQueries {

  /** Broadcast threshold the demo pivots around. Measured at sf0.01:
    * size-only estimate of the pruned+filtered dim = 44.8 KiB (file
    * size scaled only by column pruning — predicates ignored); CBO
    * estimate with column stats = ~3.6 KiB (1/5 × 1/3 equality
    * selectivity × ~1/10 key range). 16 KiB sits ≥2.8× from both
    * sides, so the flip is robust to fixture regeneration. */
  val ThresholdBytes: Long = 16L * 1024

  private def cboSession(s: SparkSession): SparkSession = {
    val c = s.newSession()
    c.conf.set("spark.sql.cbo.enabled", "true")
    c.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    c.conf.set("spark.sql.autoBroadcastJoinThreshold",
      ThresholdBytes.toString)
    c.conf.set("spark.sql.adaptive.enabled", "false")
    c.conf.set("spark.sql.shuffle.partitions", "8")
    c
  }

  /** (Re)create the catalog tables the demo joins. Returns the
    * CBO-configured session they live in (catalog is shared with the
    * caller's session; the conf is not). */
  def setupTables(s0: SparkSession, dir: String): SparkSession = {
    val s = cboSession(s0)
    val scratch = QueryDef.scratchDir("q71_cbo", dir)
    s.sql("DROP TABLE IF EXISTS graft_cbo_fact")
    s.sql("DROP TABLE IF EXISTS graft_cbo_dim")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.option("path", s"$scratch/fact").mode("overwrite")
      .saveAsTable("graft_cbo_fact")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
      .write.option("path", s"$scratch/dim").mode("overwrite")
      .saveAsTable("graft_cbo_dim")
    s
  }

  def analyze(s: SparkSession): Unit = {
    s.sql("ANALYZE TABLE graft_cbo_fact COMPUTE STATISTICS")
    s.sql("ANALYZE TABLE graft_cbo_fact COMPUTE STATISTICS " +
      "FOR COLUMNS l_orderkey")
    s.sql("ANALYZE TABLE graft_cbo_dim COMPUTE STATISTICS")
    s.sql("ANALYZE TABLE graft_cbo_dim COMPUTE STATISTICS " +
      "FOR COLUMNS o_orderkey, o_orderpriority, o_orderstatus")
  }

  /** Dim predicate: two equality conjuncts (1/ndv each) plus an
    * estimable key range (~10% of [min,max]) — together they push the
    * CBO estimate ~40× below the size-only one, so the strategy flip
    * does not hinge on a hair-thin threshold. */
  val KeyCap = 1500L

  /** The un-hinted join whose strategy the statistics decide. Planning
    * is forced under the CBO session being ACTIVE: Catalyst reads
    * cbo.enabled from the thread-local active conf, and a caller (test
    * harness, Verify) may hold a different active session. The planned
    * QueryExecution is cached on the Dataset, so downstream actions
    * reuse exactly this plan. */
  def statsJoin(s: SparkSession): DataFrame = {
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(s)
    try {
      val df = s.table("graft_cbo_fact")
        .join(s.table("graft_cbo_dim"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F" && col("o_orderkey") <= KeyCap)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)"))
            .cast("string").cast("double").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
      df.queryExecution.executedPlan // pin the plan under this conf
      df
    } finally {
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  val defs: Map[String, QueryDef] = Map(
    "q71_cbo_stats_join" -> QueryDef(
      """SELECT o.o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS VARCHAR)
        |    AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
        |  AND o.o_orderkey <= 1500
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s0, dir) =>
      val s = setupTables(s0, dir)
      analyze(s)
      statsJoin(s)
    }
  )
}
