package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-table co-located join (SURVEY.md §8): persist both fact
  * tables bucketed by the join key, then join WITHOUT any shuffle —
  * each bucket pair is read co-located. This is the 100 TB answer to a
  * repeated lineitem⋈orders join: the one-time bucketed write amortizes
  * the shuffle across every subsequent join on the key, which is how a
  * production warehouse stores its hot fact tables. The only Exchange
  * in the plan is the final small aggregation; BucketJoinSpec asserts
  * the join itself has none.
  */
object BucketQueries {

  val Buckets = 8

  /** Write both sides bucketed+sorted by the join key (one file per
    * bucket via repartition on the key) and return the joined view.
    * Sort-merge hint: the demo is exchange-free SMJ, not a broadcast.
    * Only the columns the downstream join/agg reads are bucketed — the
    * measured cost is the CO-LOCATED JOIN plus a right-sized one-time
    * write, not a 16-column table copy (a production deployment buckets
    * whatever column set its workload needs; the plan shape — zero
    * Exchange on the join — is identical either way, and BucketJoinSpec
    * pins it).
    */
  def colocatedJoin(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val scratch = QueryDef.scratchDir("q27_bucket", dir)
    s.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    s.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .repartition(Buckets, col("l_orderkey"))
      .write.bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$scratch/li").mode("overwrite")
      .saveAsTable("graft_li_bucketed")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .repartition(Buckets, col("o_orderkey"))
      .write.bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$scratch/ord").mode("overwrite")
      .saveAsTable("graft_ord_bucketed")
    s.table("graft_li_bucketed").hint("merge")
      .join(s.table("graft_ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
  }

  val defs: Map[String, QueryDef] = Map(

    // salted skew join: events has 5 event_types, so a shuffle join on
    // event_type puts ~1/5 of the table in ONE task; the salted variant
    // spreads each hot key across 8 partitions and must produce the
    // row-identical result (the oracle runs the PLAIN join)
    "q28_salted_join" -> QueryDef(
      """WITH d AS (SELECT event_type, count(*) AS type_total
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n_rows, min(d.type_total) AS type_total
        |FROM events e JOIN d USING (event_type)
        |GROUP BY e.event_type""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
      val dim = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_total"))
      graft.operators.SkewJoin
        .saltedJoin(e.select(col("event_type"), col("event_id")),
          dim, "event_type", "event_id", r = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), min(col("type_total")).as("type_total"))
    },

    "q27_colocated_join" -> QueryDef(
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      colocatedJoin(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double").as("sum_price"))
    },

    // dynamic partition pruning: the fact table is laid out partitioned
    // by the join key; the dim side's predicate is only known at RUN
    // time (it's a join, not a literal filter on the fact), yet the
    // scan must still skip every partition the dim doesn't select —
    // Spark reuses the dim's broadcast result as a runtime partition
    // filter. At 100 TB this is the difference between scanning one
    // partition and scanning the lake. DppSpec asserts the
    // dynamicpruning expression sits in the scan's PartitionFilters.
    "q50_dpp" -> QueryDef(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
        |    AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      dppJoin(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)"))
            .cast("string").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }
  )

  /** Partition-key-partitioned fact joined to a runtime-filtered dim:
    * the construction DppSpec plan-asserts. The dim carries a
    * NON-partition-column predicate (`category = 'keep'`), so static
    * pruning can't apply — only DPP can skip fact partitions.
    */
  def dppJoin(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val scratch = QueryDef.scratchDir("q50_dpp", dir)
    val factPath = s"$scratch/lineitem_by_rf"
    // one-time partitioned layout (reused across runs in one JVM)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(factPath)
    import s.implicits._
    // dim must be a FILE-backed scan: an in-memory LocalRelation's
    // filter constant-folds before the DPP rule looks for a selective
    // predicate, and no pruning subquery is inserted
    val dimPath = s"$scratch/rf_dim"
    Seq(("A", "keep"), ("N", "drop"), ("R", "drop"))
      .toDF("rf", "category")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath).filter(col("category") === "keep")
    s.read.parquet(factPath).join(dim, col("l_returnflag") === col("rf"))
  }
}
