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
    }
  )
}
