package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.AsOfJoin

/** The engine-surface breadth the reference lacks entirely (SURVEY.md §2
  * [ABSENT] rows): joins, full aggregation set, window functions, set
  * ops, top-k, scalar function families — all Spark built-ins over the
  * TPC-H-ish star schema, each hash-checked against a DuckDB oracle.
  *
  * Numeric discipline (shared with every other query group): money
  * doubles are cast to DECIMAL(12,2) *before* arithmetic/aggregation so
  * both engines accumulate exactly, and final aggregates are cast back
  * to DOUBLE so output types/scales can't drift. Raw double sums would
  * differ between Spark and DuckDB in the last bits (summation order).
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  /** Exact-decimal → double through the decimal's DIGIT STRING, not a
    * direct cast. Both engines' string→double parses are correctly
    * rounded (Double.parseDouble / strtod), so the doubles are
    * bit-identical at ANY magnitude. A direct decimal→double diverges
    * once the scaled integer exceeds 2^53: DuckDB converts int128 →
    * double then divides by 10^scale (two roundings) while the JVM's
    * BigDecimal→double rounds once — the sf1 oracle run surfaced this
    * as 1-ulp mismatches on q01/q41 group sums. Below 2^53 both routes
    * are exact, which is why sf0.01/sf0.1 never saw it. Oracle SQL on
    * sums that can cross 2^53 mirrors this as
    * CAST(CAST(x AS VARCHAR) AS DOUBLE). */
  private def asD(c: Column): Column = c.cast("string").cast("double")
  private val DiscPrice: Column = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
  private val DiscPriceSql = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"

  val defs: Map[String, QueryDef] = Map(

    // ---- aggregation --------------------------------------------------

    // TPC-H Q1 shape: the full scalar-aggregate set with exact decimal
    // accumulation; Catalyst plans partial+final HashAggregate.
    "q01_pricing_summary" -> QueryDef(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
         |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(sum($DiscPriceSql) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         |  CAST(CAST(sum($DiscPriceSql * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
         |  CAST(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1999-12-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asD(sum(dec(col("l_quantity")))).as("sum_qty"),
          asD(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          asD(sum(DiscPrice)).as("sum_disc_price"),
          asD(sum(DiscPrice * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
          (asD(sum(dec(col("l_quantity")))) / count(lit(1))).cast("double").as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // TPC-H Q6 shape: tight filter + single exact sum — the pushdown/
    // pruning showcase (filters reach the parquet scan).
    "q06_forecast_revenue" -> QueryDef(
      s"""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(asD(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"))
    },

    // distinct + exact distinct-aggregate (HLL variant is q15, rows-only)
    "q14_distinct_agg" -> QueryDef(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // approximate distinct (HLL) — oracle-EXACT via the exact-when-sparse
    // regime (same argument as q87's merge workflow): a DataSketches HLL
    // at lgConfigK=20 stays in coupon LIST/SET mode until ~3/4·2^17
    // distinct hashes, so on the fixture domains (l_partkey ≤ 20k,
    // l_suppkey ≤ 1k at every correctness SF) the estimate IS the true
    // distinct count and count(DISTINCT) is a valid oracle. At 100 TB
    // the same plan degrades gracefully to ±0.4% dense-mode estimates
    // while still shuffling kilobyte sketches, never value multisets.
    "q15_approx_distinct" -> QueryDef(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS approx_parts,
        |  count(DISTINCT l_suppkey) AS approx_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 20))")
          .as("approx_parts"),
          expr("hll_sketch_estimate(hll_sketch_agg(l_suppkey, 20))")
            .as("approx_supps"))
    },

    // rollup: hierarchical subtotals (NULL-marked grouping rows)
    "q11_rollup" -> QueryDef(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(asD(sum(dec(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("n"))
    },

    // cube: all grouping combinations
    "q12_cube" -> QueryDef(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          asD(sum(dec(col("o_totalprice")))).as("sum_price"))
    },

    // grouping sets via SQL front-end (spark.sql IS the SQL parser)
    "q24_grouping_sets" -> QueryDef(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q24_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM q24_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
    },

    // ---- joins --------------------------------------------------------

    // broadcast hash join: small dim (part) explicitly broadcast
    "q02_brand_revenue" -> QueryDef(
      s"""SELECT p_brand,
         |  CAST(sum($DiscPriceSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(asD(sum(DiscPrice)).as("revenue"), count(lit(1)).as("n_items"))
    },

    // 3-way join + top-k with deterministic tie-break (TPC-H Q3 shape)
    "q03_shipping_priority" -> QueryDef(
      s"""SELECT o_orderkey,
         |  CAST(sum($DiscPriceSql) AS DOUBLE) AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("c_mktsegment") === "BUILDING" &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(asD(sum(DiscPrice)).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // semi-join (EXISTS): orders with at least one late lineitem
    "q04_order_priority" -> QueryDef(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // 6-way star join: region→nation→customer→orders→lineitem→supplier
    "q05_region_revenue" -> QueryDef(
      s"""SELECT n_name,
         |  CAST(sum($DiscPriceSql) AS DOUBLE) AS revenue
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(asD(sum(DiscPrice)).as("revenue"))
    },

    // anti-join (NOT EXISTS): customers with no large order, per nation
    "q07_idle_customers" -> QueryDef(
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 250000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
    },

    // z-order (Morton) clustering key — the multi-dimensional layout op
    // for parquet data skipping: bit-interleaved (partkey, suppkey)
    // buckets. The per-flag sum is an exact checksum over EVERY row's
    // z-value, so the oracle validates the full interleave arithmetic;
    // ZOrderSpec proves the layout's pruning benefit on real files.
    "q33_zorder_key" -> QueryDef({
      val z = graft.functions.ZOrder.zValueSql(
        "l_partkey % 256", "l_suppkey % 256", 8)
      s"""WITH z AS (SELECT l_returnflag, $z AS z_val FROM lineitem)
         |SELECT l_returnflag, count(*) AS n_rows,
         |  CAST(sum(z_val) AS BIGINT) AS sum_z,
         |  min(z_val) AS min_z, max(z_val) AS max_z
         |FROM z GROUP BY l_returnflag""".stripMargin
    }) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("z_val", graft.functions.ZOrder.zValue(
          col("l_partkey") % 256, col("l_suppkey") % 256, 8))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("z_val")).cast("long").as("sum_z"),
          min(col("z_val")).as("min_z"), max(col("z_val")).as("max_z"))
    },

    // left outer join: row preservation + null-side accounting (every
    // customer kept; order-less customers counted via the null probe)
    "q31_left_outer_join" -> QueryDef(
      """SELECT c.c_mktsegment, count(*) AS n_rows,
        |  count(o.o_orderkey) AS n_orders,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_order
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0))
            .cast("long").as("n_no_order"))
    },

    // full outer join: both sides preserved — filtered per-nation
    // customer counts vs supplier counts, where either side can be
    // missing a nation (coalesce resolves the surviving key)
    "q32_full_outer_join" -> QueryDef(
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust
        |           FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey, count(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust,
        |  coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.c_nationkey = s.s_nationkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, dir)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    },

    // time-based RANGE window frame (q10 covers ROWS frames): rolling
    // 7-day spend per customer — Spark expresses the time range as
    // rangeBetween over epoch seconds, DuckDB as RANGE BETWEEN INTERVAL;
    // both are inclusive [t-7d, t]. Decimal accumulation for exactness.
    // TIMEZONE INVARIANT: o_orderdate is TimestampType, and
    // unix_timestamp(TimestampType) is the internal epoch value — NO
    // session-timezone parse is involved, so the 604800-second frame
    // equals DuckDB's timezone-less INTERVAL 7 DAY arithmetic under ANY
    // session zone, DST or not (RangeFrameSpec pins this under a DST
    // zone). Were the column a DATE, unix_timestamp would localize it
    // and day-based datediff arithmetic would be required instead.
    "q36_range_frame" -> QueryDef(
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS spend_7d
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-7L * 86400L, 0L)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(14,2)")).over(w)
            .cast("double").as("spend_7d"))
    },

    // SCD2 history build from a change log: collapse each user's
    // consecutive same-type events into versioned rows with
    // [valid_from, valid_to) intervals (valid_to NULL = current) — the
    // slowly-changing-dimension shape every warehouse derives from CDC
    // streams. µs truncation + event_id tie-break per the repo's
    // timestamp discipline.
    "q37_scd2_history" -> QueryDef(
      """WITH marked AS (
        |  SELECT user_id, event_type, date_trunc('microsecond', ts) AS ts,
        |         event_id,
        |         lag(event_type) OVER w AS prev_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY date_trunc('microsecond', ts), event_id)),
        |changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev_type IS NULL OR prev_type != event_type)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S.%f') AS valid_to
        |FROM changes
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      changes.select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
        date_format(lead(col("ts"), 1).over(w2),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"))
    },

    // ordered funnel analysis: per user, first view → first later click
    // → first later purchase; stage counts measure drop-off. Strict
    // event-time ordering on the µs-truncation discipline.
    "q38_funnel" -> QueryDef(
      """WITH e AS (SELECT user_id, event_type,
        |             date_trunc('microsecond', ts) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t FROM e
        |      JOIN v ON v.user_id = e.user_id AND e.ts > v.t
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t FROM e
        |      JOIN c ON c.user_id = e.user_id AND e.ts > c.t
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_view_click,
        |       (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_v"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t_v"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_c"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t_c"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_p"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
    },

    // CDC merge/upsert by rewrite: a deterministic changeset (balance
    // bumps for custkey%10=0, deletes for custkey%97=0, 5 synthetic
    // inserts) applied to the customer base in one declarative plan;
    // the aggregated result checks every merge branch at once
    "q35_merge_upsert" -> QueryDef(
      """WITH upd AS (
        |  SELECT c_custkey, c_mktsegment,
        |         c_acctbal + 1000 AS c_acctbal, FALSE AS del
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal, TRUE AS del
        |  FROM customer WHERE c_custkey % 97 = 0 AND c_custkey % 10 != 0
        |  UNION ALL
        |  SELECT 1000000 + i AS c_custkey, 'MACHINERY' AS c_mktsegment,
        |         100.0 * i AS c_acctbal, FALSE AS del
        |  FROM range(1, 6) t(i)),
        |base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
        |merged AS (
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = b.c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM upd WHERE NOT del)
        |SELECT c_mktsegment, count(*) AS n_rows,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
        |FROM merged GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val bumps = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000)
        .withColumn("del", lit(false))
      val deletes = base
        .filter(col("c_custkey") % 97 === 0 && col("c_custkey") % 10 =!= 0)
        .withColumn("del", lit(true))
      val inserts = s.range(1, 6).toDF("i")
        .select((col("i") + 1000000).as("c_custkey"),
          lit("MACHINERY").as("c_mktsegment"),
          (col("i") * 100.0).as("c_acctbal"),
          lit(false).as("del"))
      val changeset = bumps.unionByName(deletes).unionByName(inserts)
      graft.operators.Merge.merge(base, changeset, "c_custkey",
        deleteFlag = Some("del"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("c_acctbal").cast("decimal(14,2)"))
            .cast("double").as("total_bal"))
    },

    // partition-scoped merge (q35 merges a logical view; this one proves
    // the 100 TB path): the customer base is written parquet-partitioned
    // by segment, the changeset touches 3 of the 5 segments, and
    // Merge.mergePartitioned reads + rewrites ONLY those (partition
    // pruning on the scan, dynamic partition overwrite on the write —
    // MergeSpec asserts untouched directories keep their files
    // byte-for-byte). The full-table aggregate then checks both halves:
    // merged segments carry the changes, untouched segments are intact.
    "q40_merge_partitioned" -> QueryDef(
      """WITH upd AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal + 1000 AS c_acctbal,
        |         FALSE AS del
        |  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal, TRUE AS del
        |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey % 97 = 0
        |  UNION ALL
        |  SELECT 2000000 + i AS c_custkey, 'FURNITURE' AS c_mktsegment,
        |         50.0 * i AS c_acctbal, FALSE AS del
        |  FROM range(1, 6) t(i)),
        |base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
        |merged AS (
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = b.c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM upd WHERE NOT del)
        |SELECT c_mktsegment, count(*) AS n_rows,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
        |FROM merged GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val basePath = QueryDef.scratchDir("q40_base", dir)
      val staging = QueryDef.scratchDir("q40_staging", dir)
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      base.write.mode("overwrite").partitionBy("c_mktsegment").parquet(basePath)
      val bumps = base
        .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000)
        .withColumn("del", lit(false))
      val deletes = base
        .filter(col("c_mktsegment") === "AUTOMOBILE" && col("c_custkey") % 97 === 0)
        .withColumn("del", lit(true))
      val inserts = s.range(1, 6).toDF("i")
        .select((col("i") + 2000000).as("c_custkey"),
          lit("FURNITURE").as("c_mktsegment"),
          (col("i") * 50.0).as("c_acctbal"),
          lit(false).as("del"))
      graft.operators.Merge.mergePartitioned(s, basePath,
        bumps.unionByName(deletes).unionByName(inserts),
        "c_custkey", "c_mktsegment", staging, deleteFlag = Some("del")): Unit
      s.read.parquet(basePath)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("c_acctbal").cast("decimal(14,2)"))
            .cast("double").as("total_bal"))
    },

    // scalar subquery: customers above the mean account balance
    // group-wise top-k via the custom GroupTopKNode/Strategy/Exec
    // operator (bounded per-group heaps, partial + final around one
    // winners-only shuffle) — the oracle states the same contract with
    // the window-rank idiom
    "q30_group_topk" -> QueryDef(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      graft.plans.GroupTopK.topK(
        Tables.orders(s, dir)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_orderpriority"), "o_totalprice", k = 3, desc = true,
        tieBreak = "o_orderkey")
    },

    // q30's operator reached through the OPTIMIZER instead of the API:
    // the user writes the standard row_number idiom, TopKRewrite
    // (plans/TopKRewrite.scala) swaps in GroupTopKNode because the rank
    // column is dropped — same plan as q30, zero API adoption needed.
    // The oracle runs the SAME idiom text in DuckDB, so the hash match
    // proves the rewrite is semantics-preserving, not just plan-shaped
    // (TopKRewriteSpec pins the plan side: GroupTopKExec present, the
    // Window gone, and the decline cases). The rewrite is registered at
    // SESSION BUILD (GraftSparkExtensions in Verify/Bench/tests), never
    // from inside a query closure — so no query's plan depends on which
    // queries ran before it (r13 verdict #1; PlanDeterminismSpec).
    "q93_topk_rewrite" -> QueryDef(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    },

    // q93's idiom with rank(): the tie-CLASS top-k — every order tying
    // at the boundary price band comes back, which is the semantics a
    // "top 3 price bands per priority" report actually wants. The
    // TopKRewrite fires in RankMode (tie-aware buckets, not a blind
    // k-heap): the emitted row SET is tie-invariant by definition, so
    // no tie-break column is needed for determinism — the oracle runs
    // the identical idiom text. o_totalprice is decimal with dense
    // collisions at fixture scale; both engines keep whole tie classes.
    "q97_rank_topk" -> QueryDef(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY floor(o_totalprice / 10000) DESC) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(floor(col("o_totalprice") / 10000).desc)
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("band", floor(col("o_totalprice") / 10000))
        .withColumn("rn", rank().over(
          Window.partitionBy(col("o_orderpriority")).orderBy(col("band").desc)))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    },

    // dense_rank() variant: every order in the k best DISTINCT bands
    // per priority — rank() skips bands after a fat tie class,
    // dense_rank() does not, and the rewrite's DenseRankMode keeps
    // exactly the k best distinct order-values' rows.
    "q98_dense_rank_topk" -> QueryDef(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    dense_rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY floor(o_totalprice / 10000) DESC) AS rn
        |  FROM orders)
        |WHERE rn <= 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("band", floor(col("o_totalprice") / 10000))
        .withColumn("rn", dense_rank().over(
          Window.partitionBy(col("o_orderpriority")).orderBy(col("band").desc)))
        .filter(col("rn") <= 2)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    },

    // ---- q100: cohort retention -------------------------------------
    // The BI primitive behind every "month-N retention" dashboard:
    // customers cohort by FIRST order month; retention at offset k =
    // fraction of the cohort active k months later. All counts are
    // exact BIGINTs; the only float op is one exactly-rounded IEEE
    // division (both operands < 2^53). Plan: two keyed aggregations
    // (min-date per customer, distinct activity months — both
    // map-side combined), an equi-join on o_custkey (co-partitioned
    // after the shuffles, AQE picks the strategy), a (cohort, offset)
    // roll-up, and a BROADCAST join of the tiny cohort-size side —
    // #cohorts rows, constant at any corpus scale. No window, no
    // cross join; every shuffle is on a real key.
    "q100_cohort_retention" -> QueryDef(
      """WITH firsts AS (
        |  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_ts
        |  FROM orders GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS m
        |  FROM orders),
        |ret AS (
        |  SELECT f.cohort_ts,
        |         date_diff('month', f.cohort_ts, a.m) AS month_offset,
        |         count(*) AS n_active
        |  FROM activity a JOIN firsts f USING (o_custkey)
        |  GROUP BY 1, 2),
        |sizes AS (SELECT cohort_ts, count(*) AS n_cohort FROM firsts GROUP BY 1)
        |SELECT strftime(r.cohort_ts, '%Y-%m') AS cohort, r.month_offset,
        |  r.n_active, s.n_cohort,
        |  CAST(r.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE) AS retention
        |FROM ret r JOIN sizes s USING (cohort_ts)""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val firsts = orders.groupBy(col("o_custkey"))
        .agg(date_trunc("month", min(col("o_orderdate"))).as("cohort_ts"))
      val activity = orders
        .select(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .distinct()
      val ret = activity.join(firsts, "o_custkey")
        .groupBy(col("cohort_ts"),
          months_between(col("m"), col("cohort_ts")).cast("long")
            .as("month_offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = firsts.groupBy(col("cohort_ts"))
        .agg(count(lit(1)).as("n_cohort"))
      ret.join(broadcast(sizes), "cohort_ts")
        .select(date_format(col("cohort_ts"), "yyyy-MM").as("cohort"),
          col("month_offset"), col("n_active"), col("n_cohort"),
          (col("n_active").cast("double") / col("n_cohort").cast("double"))
            .as("retention"))
    },

    // exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the linear-interpolation definition; both
    // rounded to 6 decimals to absorb last-bit interpolation order
    "q29_percentiles" -> QueryDef(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"))
    },

    "q26_above_avg_balance" -> QueryDef(
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) FROM customer)
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("q26_customer")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n
          |FROM q26_customer
          |WHERE c_acctbal > (SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) FROM q26_customer)
          |GROUP BY c_mktsegment""".stripMargin)
    },

    // as-of join: for each event, the user's latest order on/before the
    // event time — union+window composition, one shuffle per side
    // (graft.operators.AsOfJoin; oracle uses DuckDB's native ASOF JOIN).
    "q20_asof_join" -> QueryDef(
      """WITH latest_order AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, o.o_orderkey AS matched_orderkey
        |FROM events e ASOF LEFT JOIN latest_order o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin) { (s, dir) =>
      // dedup right side on (key, time): keep max orderkey
      val latest = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.leftAsOf(
        Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
        latest,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey").as("matched_orderkey"))
    },

    // range/interval join: events against 3-day sliding buckets — small
    // interval side broadcast, so the inequality join stays a broadcast
    // nested loop over 30 rows, not a shuffle explosion
    "q21_range_join" -> QueryDef(
      """WITH buckets AS (
        |  SELECT d AS bucket_start, d + INTERVAL 3 DAY AS bucket_end
        |  FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |                       TIMESTAMP '2024-01-28 00:00:00',
        |                       INTERVAL 1 DAY) AS t(d)
        |)
        |SELECT strftime(bucket_start, '%Y-%m-%d') AS bucket,
        |       count(e.event_id) AS n_events,
        |       CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM buckets b JOIN events e
        |  ON e.ts >= b.bucket_start AND e.ts < b.bucket_end
        |GROUP BY bucket""".stripMargin) { (s, dir) =>
      val buckets = s.range(0, 28)
        .select((lit("2024-01-01 00:00:00").cast("timestamp") +
          make_dt_interval(col("id"))).as("bucket_start"))
        .withColumn("bucket_end", col("bucket_start") + make_dt_interval(lit(3)))
      Tables.events(s, dir).join(broadcast(buckets),
          col("ts") >= col("bucket_start") && col("ts") < col("bucket_end"))
        .groupBy(date_format(col("bucket_start"), "yyyy-MM-dd").as("bucket"))
        .agg(count(col("event_id")).as("n_events"),
          asD(sum(dec(col("value")))).as("sum_value"))
    },

    // ---- windows ------------------------------------------------------

    // ranking: top-3 orders per customer (row_number, deterministic ties)
    "q09_window_rank" -> QueryDef(
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    },

    // analytic frame: running revenue per supplier over ship time
    "q10_window_running" -> QueryDef(
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem WHERE l_suppkey < 4""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .filter(col("l_suppkey") < 4)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          asD(sum(dec(col("l_extendedprice"))).over(w)).as("running_rev"))
    },

    // lag/lead + gap-based sessionization (30-min inactivity gap).
    // Gap compare is at exact microsecond precision on BOTH sides
    // (Spark ts is µs-truncated at load; oracle µs-truncates too), so a
    // gap like 1800.4s can't diverge between engines at any SF.
    "q22_sessionize" -> QueryDef(
      """WITH gaps AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(date_trunc('microsecond', ts))
        |        - epoch_us(date_trunc('microsecond', lag(ts) OVER w))
        |      > 1800000000 OR lag(ts) OVER w IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY date_trunc('microsecond', ts), event_id)
        |)
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM gaps GROUP BY user_id""".stripMargin) { (s, dir) =>
      // operator façade: graft.operators.Sessionize owns the
      // gap-flag + running-ordinal window chain (one Window operator)
      graft.operators.Sessionize.sessionCounts(
        Tables.events(s, dir), keyCol = "user_id", tsCol = "ts",
        tieCol = "event_id", gapSeconds = 1800)
    },

    // ---- sorts / limits / top-k --------------------------------------

    // global top-k → TakeOrderedAndProject (no full sort at scale)
    "q08_topk_orders" -> QueryDef(
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))
    },

    // ---- set operations ----------------------------------------------

    "q13_setops" -> QueryDef(
      """SELECT 'union' AS op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin) { (s, dir) =>
      val building = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bigOrders = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      def counted(op: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      counted("union", building.union(bigOrders).distinct())
        .unionByName(counted("intersect", building.intersect(bigOrders)))
        .unionByName(counted("except", building.except(bigOrders)))
    },

    // ---- pivot --------------------------------------------------------

    "q23_pivot" -> QueryDef(
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY day""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // ---- scalar function families ------------------------------------

    "q16_string_funcs" -> QueryDef(
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  length(c_name) AS name_len,
        |  substr(c_name, 1, 8) AS prefix,
        |  concat_ws('|', c_mktsegment, c_name) AS tagged,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  replace(c_name, '#', '-') AS replaced
        |FROM customer""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "#", "-").as("replaced"))
    },

    "q17_math_funcs" -> QueryDef(
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS abs_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  round(CAST(l_extendedprice AS DECIMAL(12,2)) / 100, 1) AS hundredths,
        |  sqrt(l_quantity) AS sqrt_qty,
        |  CAST(l_orderkey % 7 AS BIGINT) AS mod7,
        |  CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
        |FROM lineitem WHERE l_orderkey < 500""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).filter(col("l_orderkey") < 500).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        round(dec(col("l_extendedprice")) / 100, 1).as("hundredths"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        (col("l_orderkey") % 7).cast("long").as("mod7"),
        signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
    },

    "q18_array_funcs" -> QueryDef(
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_words,
        |  array_to_string(string_split(text, ' ')[1:3], '-') AS first3,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct
        |FROM documents""".stripMargin) { (s, dir) =>
      val words = split(col("text"), " ")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(words).as("n_words"),
        concat_ws("-", slice(words, 1, 3)).as("first3"),
        array_contains(words, "spark").as("has_spark"),
        size(array_distinct(words)).as("n_distinct"))
    },

    // statistical aggregate family (corr / covariance / stddev / var):
    // composed from EXACT decimal power sums via the closed forms, so
    // both engines feed bit-identical doubles into the same scalar
    // expression — a direct corr()/stddev_samp() aggregate is an
    // order-dependent float fold that can differ in the last ulp
    // between engines (and between Spark runs). StatsAggSpec pins that
    // Spark's native corr/covar_samp/stddev_samp agree with these
    // closed forms to 1e-6, so the built-in surface is covered too.
    "q41_stats_agg" -> QueryDef(
      """WITH s AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
        |             CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
        |             CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
        |  (sxy - sx * sy / n) / (n - 1) AS covar_samp_qty_price,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_samp_qty,
        |  (syy - sy * sy / n) / (n - 1) AS var_samp_price
        |FROM s""".stripMargin) { (s, dir) =>
      val st = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          asD(sum(dec(col("l_quantity")))).as("sx"),
          asD(sum(dec(col("l_extendedprice")))).as("sy"),
          asD(sum(dec(col("l_quantity")) * dec(col("l_extendedprice")))).as("sxy"),
          asD(sum(dec(col("l_quantity")) * dec(col("l_quantity")))).as("sxx"),
          asD(sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))).as("syy"))
      st.select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_price"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
          .as("covar_samp_qty_price"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("stddev_samp_qty"),
        ((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1))
          .as("var_samp_price"))
    },

    // window distribution family (q09 covers ranking, q10/q36 frames):
    // ntile / percent_rank / cume_dist over a deterministic total order
    // (acctbal, custkey). All three are rank-derived — integer counts
    // and single divisions both engines compute identically, no float
    // accumulation to diverge.
    "q42_window_dist" -> QueryDef(
      """SELECT c_custkey, c_mktsegment,
        |  ntile(4) OVER w AS bal_quartile,
        |  percent_rank() OVER w AS bal_pct_rank,
        |  cume_dist() OVER w AS bal_cume_dist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal, c_custkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("bal_quartile"),
          percent_rank().over(w).as("bal_pct_rank"),
          cume_dist().over(w).as("bal_cume_dist"))
    },

    // window navigation family (completes §2.5 alongside ranking q09,
    // frames q10/q36, lag/lead q22, distribution q42): first_value over
    // a running frame, last_value and nth_value over the full-partition
    // frame — frames are EXPLICIT on both sides because the engines'
    // default last_value frame (…AND CURRENT ROW) is a classic
    // silent-wrong-answer trap. (o_orderdate, o_orderkey) is a total
    // order, so navigation targets are unique.
    "q47_window_nav" -> QueryDef(
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(first_value(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER w_run AS VARCHAR) AS DOUBLE) AS first_price,
        |  CAST(CAST(last_value(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER w_full AS VARCHAR) AS DOUBLE) AS last_price,
        |  CAST(CAST(coalesce(nth_value(CAST(o_totalprice AS DECIMAL(12,2)), 2)
        |    OVER w_full, -1) AS VARCHAR) AS DOUBLE) AS second_price
        |FROM orders
        |WINDOW
        |  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val base = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = base.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          asD(first(dec(col("o_totalprice"))).over(wRun)).as("first_price"),
          asD(last(dec(col("o_totalprice"))).over(wFull)).as("last_price"),
          // single-order customers have no 2nd row: a NULL double here
          // round-trips as NaN through some oracle paths, so pin a
          // sentinel on both sides instead of emitting NULL
          asD(coalesce(nth_value(dec(col("o_totalprice")), 2).over(wFull),
            dec(lit(-1)))).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // incremental rollup maintenance (materialized-view pattern): the
    // base corpus and a late-arriving delta are PARTIALLY aggregated
    // independently — count + exact decimal sum are the mergeable state
    // — then merged by re-aggregation; derived avg comes from merged
    // state, never from averaging averages. At 100 TB this is the only
    // affordable refresh: the delta partial touches just the new data,
    // the merge touches only aggregate state (#groups rows). The oracle
    // recomputes from scratch, so merge == full recompute is the
    // correctness claim.
    "q48_incremental_rollup" -> QueryDef(
      """WITH merged AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n AS n_items,
        |  CAST(CAST(sq AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(CAST(sq AS VARCHAR) AS DOUBLE) / n AS DOUBLE) AS avg_qty
        |FROM merged ORDER BY 1""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val cutoff = lit("1997-06-01 00:00:00").cast("timestamp")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).as("sq"))
      partial(li.filter(col("l_shipdate") < cutoff))
        .unionAll(partial(li.filter(col("l_shipdate") >= cutoff)))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("n")).as("n_items"),
          sum(col("sq")).cast("decimal(12,2)").as("sq_m"))
        .select(col("l_returnflag"), col("n_items"),
          asD(col("sq_m")).as("sum_qty"),
          (asD(col("sq_m")) / col("n_items")).cast("double").as("avg_qty"))
        .orderBy(col("l_returnflag"))
    },

    // lateral correlated subquery (SQL-surface sibling of the GroupTopK
    // custom plan, q30): per-customer top-2 orders via `, LATERAL (…
    // ORDER BY … LIMIT 2)`. Catalyst DECORRELATES this into a
    // WindowGroupLimit (partial+final rank pruning around the shuffle)
    // + broadcast join — no per-row subquery execution exists in the
    // physical plan, which is what makes the SQL shape safe at scale.
    "q49_lateral_topn" -> QueryDef(
      """SELECT c.c_custkey, t.o_orderkey,
        |  CAST(CAST(CAST(t.o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        |    AS DOUBLE) AS price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_custkey % 50 = 0
        |ORDER BY 1, 3 DESC, 2""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer_q49")
      Tables.orders(s, dir).createOrReplaceTempView("orders_q49")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey,
          |  CAST(CAST(CAST(t.o_totalprice AS DECIMAL(12,2)) AS STRING)
          |    AS DOUBLE) AS price
          |FROM customer_q49 c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_q49 o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c.c_custkey % 50 = 0
          |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin)
    },

    // fuzzy string matching: edit-distance-≤2 pairs, grouped fuzzy-join
    // shape. Three scale facts drove this plan (all measured in the r6
    // sf1 campaign): (1) the naive brand-block join is block² — 11×
    // wall for 10× data; (2) the fixture's name VOCABULARY is tiny and
    // grows sublinearly (433 → 1 544 distinct (brand,name) for 10×
    // rows) while duplication grows linearly — so ALL string work
    // happens on DISTINCT names only; (3) the d≤2 result is
    // output-bound (duplicate-name cliques), so clique expansion back
    // to key pairs must be plain integer row generation, never string
    // work. Candidates over distinct names use a DELETION-NEIGHBORHOOD
    // join (FastSS, Bocek et al. 2007): an edit script of cost ≤2
    // decomposes into ≤2 deletions per side reaching a common variant,
    // so distance-≤2 names share a variant — an equality join on
    // (brand, variant), never name × name. Thresholded
    // levenshtein(_,_,2) (banded DP, early exit, -1 above threshold)
    // verifies the few candidates; exact-equal pairs (dist 0) come
    // straight from the clique self-join.
    "q51_fuzzy_match" -> QueryDef(
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |       levenshtein(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE a.p_partkey % 4 = 0 AND b.p_partkey % 4 = 0
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY dist, key_a, key_b LIMIT 200""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
        .filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val names = p.select(col("p_brand"), col("p_name")).distinct()

      // all variants reachable by deleting ≤2 chars (identity + single
      // + ordered double deletions); delete(s,i) = left(s,i) ++ s[i+2..]
      val variants =
        """array_distinct(flatten(array(
          |  array(p_name),
          |  transform(sequence(0, length(p_name)-1),
          |    i -> concat(left(p_name, i), substring(p_name, i+2))),
          |  flatten(transform(sequence(0, length(p_name)-1),
          |    i -> transform(sequence(0, length(p_name)-2),
          |      j -> concat(
          |        left(concat(left(p_name, i), substring(p_name, i+2)), j),
          |        substring(concat(left(p_name, i), substring(p_name, i+2)),
          |          j+2))))))))""".stripMargin
      val ex = names.select(col("p_brand"), col("p_name"),
        explode(expr(variants)).as("v"))
      val nameMatches = ex
        .join(ex.select(col("p_brand").as("brand_b"),
            col("p_name").as("name_b"), col("v").as("v_b")),
          col("p_brand") === col("brand_b") && col("v") === col("v_b") &&
            col("p_name") < col("name_b"))
        .select(col("p_brand"), col("p_name"), col("name_b"))
        .distinct() // a name pair can share several variants
        .withColumn("dist", levenshtein(col("p_name"), col("name_b"), 2))
        .filter(col("dist") >= 1) // dist-0 pairs come from the clique join

      // clique expansion: key-level pairs via integer-only joins
      val keysA = p.select(col("p_brand").as("ba"), col("p_name").as("na"),
        col("p_partkey").as("ka"))
      val keysB = p.select(col("p_brand").as("bb"), col("p_name").as("nb"),
        col("p_partkey").as("kb"))
      val d0 = keysA.join(keysB,
          col("ba") === col("bb") && col("na") === col("nb") &&
            col("ka") < col("kb"))
        .select(col("ka").as("key_a"), col("kb").as("key_b"),
          lit(0).as("dist"))
      val dk = nameMatches
        .join(keysA, col("p_brand") === col("ba") && col("p_name") === col("na"))
        .join(keysB, col("p_brand") === col("bb") && col("name_b") === col("nb"))
        .select(least(col("ka"), col("kb")).as("key_a"),
          greatest(col("ka"), col("kb")).as("key_b"), col("dist"))
      d0.unionAll(dk)
        .orderBy(col("dist"), col("key_a"), col("key_b"))
        .limit(200)
    },

    // rolling exact median: an ORDER-STATISTIC aggregate over a moving
    // ROWS frame — `percentile` runs as a window aggregate (per-frame
    // recompute is O(frame log frame); the 7-row frame keeps it
    // constant-bounded per row, and frames never cross the per-key
    // partition). Interpolation parity with DuckDB's quantile_cont is
    // the q29 invariant; inputs go decimal → digit-string → double so
    // the doubles the two engines interpolate between are identical.
    "q52_rolling_median" -> QueryDef(
      """WITH daily AS (
        |  SELECT l_returnflag, time_bucket(INTERVAL 1 DAY, l_shipdate) AS day,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(day AS VARCHAR) AS day_str,
        |  CAST(CAST(quantile_cont(CAST(CAST(rev AS VARCHAR) AS DOUBLE), 0.5)
        |    OVER (PARTITION BY l_returnflag ORDER BY day
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR)
        |    AS DOUBLE) AS rolling_median_rev
        |FROM daily ORDER BY 1, 2 LIMIT 500""".stripMargin) { (s, dir) =>
      val daily = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), date_trunc("day", col("l_shipdate")).as("day"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily
        .select(col("l_returnflag"),
          date_format(col("day"), "yyyy-MM-dd HH:mm:ss").as("day_str"),
          asD(expr("percentile(CAST(CAST(rev AS STRING) AS DOUBLE), 0.5)")
            .over(w)).as("rolling_median_rev"))
        .orderBy(col("l_returnflag"), col("day_str"))
        .limit(500)
    },

    // map-function family (closes the SURVEY §2.8 partial: map fns ran
    // only inside the Stringify/Restore lattice before this): build the
    // §1.2 TIMESERIES shape — a per-order MAP(linenumber → total qty) —
    // then exercise map_keys / map_values / element_at / map_entries
    // directly, projected to scalars/CSV the DuckDB oracle reproduces
    // with ordered string_agg. (l_orderkey, l_linenumber) is NOT unique
    // in the synthetic data, so a per-line pre-aggregation feeds the map
    // builder (duplicate map keys are an error in Spark by default);
    // collect_list is order-nondeterministic, so array_sort fixes the
    // entry order before map_from_entries — map_keys/map_entries then
    // iterate in that sorted order on both engines. Integer-cast
    // quantities keep both sums in exact integer arithmetic (DuckDB
    // sum(INT) is HUGEINT — cast back to BIGINT at every step).
    "q39_map_funcs" -> QueryDef(
      """WITH per AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS qty
        |  FROM lineitem WHERE l_orderkey < 2000
        |  GROUP BY l_orderkey, l_linenumber)
        |SELECT l_orderkey,
        |  count(*) AS n_entries,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
        |    AS keys_csv,
        |  CAST(sum(qty) AS BIGINT) AS qty_sum,
        |  CAST(coalesce(max(CASE WHEN l_linenumber = 1 THEN qty END), -1)
        |    AS BIGINT) AS qty_line1,
        |  string_agg(CAST(l_linenumber AS VARCHAR) || ':' || CAST(qty AS VARCHAR),
        |             ';' ORDER BY l_linenumber) AS entries_csv
        |FROM per GROUP BY l_orderkey""".stripMargin) { (s, dir) =>
      val per = Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 2000)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity").cast("int")).as("qty"))
      val m = per.groupBy(col("l_orderkey"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("l_linenumber").as("key"), col("qty").as("value")))))
          .as("m"))
      m.select(col("l_orderkey"),
        size(map_keys(col("m"))).cast("long").as("n_entries"),
        concat_ws(",",
          transform(map_keys(col("m")), k => k.cast("string"))).as("keys_csv"),
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("qty_sum"),
        // element_at is null for orders lacking line 1; coalesce to a
        // sentinel so the column stays non-null BIGINT through the
        // driver's pandas path (nullable int degrades to float64 there)
        coalesce(element_at(col("m"), lit(1)), lit(-1L)).as("qty_line1"),
        concat_ws(";", transform(map_entries(col("m")), e =>
          concat_ws(":", e.getField("key").cast("string"),
            e.getField("value").cast("string")))).as("entries_csv"))
    },

    "q19_json_funcs" -> QueryDef(
      """SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY k_bucket""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("k")).cast("int").as("min_k"),
          max(col("k")).cast("int").as("max_k"))
    }
  )
}
