package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Time-series / lateral / schema-evolution surface (round 6): the
  * operations a timestream analytics engine is *for* beyond plain
  * aggregation — regularizing an irregular event stream onto a fixed
  * grid (q43), positional explode as the generator/lateral-view family
  * (q44), schema-evolution reads across parquet generations (q45), and
  * interval-overlap concurrency via a distributed sweep-line (q46).
  *
  * Numeric discipline matches TpchQueries: DECIMAL(12,2) before
  * arithmetic/aggregation, and decimal → double through the digit
  * string (`cast(string).cast(double)`) so the doubles are
  * bit-identical with DuckDB at any magnitude (see
  * TpchQueries.asD scaladoc for the 2^53 rationale).
  */
object TimeSeriesQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def asD(c: Column): Column = c.cast("string").cast("double")

  val defs: Map[String, QueryDef] = Map(

    // ---- q43: resample + gap-fill -----------------------------------
    // Regularize the irregular event stream onto an hourly grid per
    // key: observed buckets come from ONE hash aggregation (the only
    // full-data shuffle); the dense grid is generated declaratively
    // (sequence + explode over the observed span × distinct keys — its
    // size is #keys × #buckets, independent of row count, so the
    // cross join never touches the raw stream); missing buckets are
    // forward-filled with `last(..., ignoreNulls)` per key. The fill
    // window is per-key sequential but parallel across keys — the
    // partition axis a 1000-executor cluster actually has. 215 of the
    // 3 600 grid cells are gaps at sf0.01, so the fill path is real.
    "q43_gapfill" -> QueryDef(
      """WITH obs AS (
        |  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
        |         count(*) AS n_events,
        |         sum(CAST(value AS DECIMAL(12,2))) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM obs),
        |grid AS (
        |  SELECT t.event_type, g.b AS bucket
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
        |              FROM span) g)
        |SELECT g.event_type, CAST(g.bucket AS VARCHAR) AS bucket_str,
        |  coalesce(o.n_events, 0) AS n_events,
        |  CAST(CAST(coalesce(o.sum_value, 0) AS VARCHAR) AS DOUBLE) AS sum_value,
        |  CAST(CAST(coalesce(last_value(o.sum_value IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS VARCHAR)
        |    AS DOUBLE) AS filled_value,
        |  (o.n_events IS NULL) AS was_gap
        |FROM grid g
        |LEFT JOIN obs o ON g.event_type = o.event_type AND g.bucket = o.bucket
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // operator façade: graft.operators.Resample owns the grid/fill
      // plan shape and the numeric discipline; this query only formats
      graft.operators.Resample.gapFillLocf(Tables.events(s, dir))
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket_str"),
          col("n_events"), col("sum_value"), col("filled_value"),
          col("was_gap"))
        .orderBy(col("event_type"), col("bucket_str"))
    },

    // ---- q44: generator / lateral-view family -----------------------
    // posexplode is Spark's lateral view: one input row → N output rows
    // WITH ordinal position. The generator runs inside the scan stage
    // (no shuffle to explode); only the word aggregation shuffles.
    // pos is 0-based on both sides (DuckDB: generate_series(1,len)-1).
    "q44_posexplode" -> QueryDef(
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS word,
        |    unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT word, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs,
        |       min(pos) AS first_pos,
        |       CAST(CAST(sum(CAST(pos AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
        |         AS sum_pos
        |FROM w WHERE length(word) >= 4
        |GROUP BY word HAVING count(*) >= 5
        |ORDER BY n_occurrences DESC, word LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(length(col("word")) >= 4)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("pos")).cast("long").as("first_pos"),
          asD(sum(dec(col("pos")))).as("sum_pos"))
        .filter(col("n_occurrences") >= 5)
        .orderBy(col("n_occurrences").desc, col("word"))
        .limit(100)
    },

    // ---- q45: schema-evolution read ---------------------------------
    // Two parquet generations of the same table — v1 before the
    // `o_orderpriority` column existed, v2 after — read as ONE dataset
    // via mergeSchema; v1 rows surface NULL for the added column
    // (exactly how a 100 TB lake accretes schema over years without a
    // rewrite). The oracle recomputes the expected union from the base
    // table, so the write→evolve→read round-trip must be lossless.
    "q45_schema_evolution" -> QueryDef(
      """WITH evolved AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p,
        |         CAST(NULL AS VARCHAR) AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p,
        |         o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(o_orderpriority, '<pre-evolution>') AS priority,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(p) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM evolved GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val scratch = QueryDef.scratchDir("q45_evolution", dir)
      val orders = Tables.orders(s, dir)
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$scratch/v1")
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$scratch/v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$scratch/v1", s"$scratch/v2")
        .groupBy(coalesce(col("o_orderpriority"), lit("<pre-evolution>"))
          .as("priority"))
        .agg(count(lit(1)).as("n_orders"),
          asD(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("priority"))
    },

    // ---- q46: interval-overlap concurrency (distributed sweep-line) --
    // Peak concurrent intervals per key via the classic +1/−1 sweep —
    // but the running sum is computed as a TWO-PHASE distributed prefix
    // scan, not one global window: within-chunk running sums run in
    // parallel across (key, day) partitions, chunk totals (a tiny
    // #keys × #days frame) get a cumulative offset on the driver-sized
    // side and broadcast back. A single global orderBy window would
    // serialize the whole stream through one partition at 100 TB; this
    // shape never does. Chunk boundaries align with the sort key
    // (chunk = floor(t) to the day), so within-chunk order + offset
    // equals the global prefix sum exactly. Interval ends use
    // floor(): DuckDB CAST(double AS INT) *rounds* while Spark
    // truncates — floor on both sides pins identical widths.
    "q46_concurrency" -> QueryDef(
      """WITH iv AS (
        |  SELECT event_id, event_type, ts AS s,
        |    ts + INTERVAL 1 MINUTE *
        |      CAST(floor(least(greatest(value, 1), 60)) AS INT) AS e
        |  FROM events),
        |pts AS (
        |  SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
        |  UNION ALL
        |  SELECT event_type, e AS t, -1 AS delta, event_id FROM iv),
        |run AS (
        |  SELECT event_type, t, delta,
        |    CAST(sum(delta) OVER (
        |      PARTITION BY event_type ORDER BY t, delta, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS conc
        |  FROM pts)
        |SELECT event_type, max(conc) AS peak_concurrency,
        |  count(*) AS n_points,
        |  CAST(sum(CASE WHEN conc = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_idle_points
        |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val iv = Tables.events(s, dir).select(
        col("event_id"), col("event_type"), col("ts").as("s"),
        expr("ts + make_interval(0, 0, 0, 0, 0, " +
          "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as("e"))
      val pts = iv.select(col("event_type"), col("s").as("t"),
          lit(1L).as("delta"), col("event_id"))
        .unionAll(iv.select(col("event_type"), col("e").as("t"),
          lit(-1L).as("delta"), col("event_id")))
        .withColumn("chunk", date_trunc("day", col("t")))
      val within = Window.partitionBy(col("event_type"), col("chunk"))
        .orderBy(col("t"), col("delta"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = pts.groupBy(col("event_type"), col("chunk"))
        .agg(sum(col("delta")).as("chunk_total"))
        .select(col("event_type"), col("chunk"),
          coalesce(sum(col("chunk_total")).over(
            Window.partitionBy(col("event_type")).orderBy(col("chunk"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as("offset"))
      pts.withColumn("within_run", sum(col("delta")).over(within))
        .join(broadcast(offsets), Seq("event_type", "chunk"))
        .withColumn("conc", col("within_run") + col("offset"))
        .groupBy(col("event_type"))
        .agg(max(col("conc")).as("peak_concurrency"),
          count(lit(1)).as("n_points"),
          sum(when(col("conc") === 0, 1L).otherwise(0L)).as("n_idle_points"))
        .orderBy(col("event_type"))
    },

    // ---- q67: small-file compaction (OPTIMIZE) ----------------------
    // The operational rewrite every streaming/CDC table needs at scale:
    // a day-partitioned events layout is first fragmented into 8 hash
    // files per partition (the residue a micro-batch sink leaves), then
    // Compact bin-packs each partition back to ceil(bytes/target) files
    // — one metadata listing + ONE shuffle on (day, bucket), which
    // parallelizes within a partition so a skewed 2 TB day never
    // becomes a single 2 TB task (see operators/Compact scaladoc). The
    // oracle aggregates the COMPACTED table per day against DuckDB on
    // the raw fixture: compaction must be row-lossless end to end.
    // CompactionSpec pins the file-count geometry (≤ ceil per
    // partition, 8× → 1× here) and per-partition caps.
    "q67_compaction" -> QueryDef(
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR)
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Compact
      val scratch = QueryDef.scratchDir("q67_compact", dir)
      val smallPath = s"$scratch/events_small"
      val outPath = s"$scratch/events_compacted"
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .repartition(col("day"), pmod(col("event_id"), lit(8)))
        .write.mode("overwrite").partitionBy("day").parquet(smallPath)
      Compact.compact(s, smallPath, outPath, partitionCol = "day",
        bucketBy = "event_id", targetBytes = 4L * 1024 * 1024)
      s.read.parquet(outPath)
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          asD(sum(dec(col("value")))).as("sum_value"))
        .orderBy(col("day"))
    },

    // ---- q68: big×big range join via binning ------------------------
    // Interval×point containment where BOTH sides are the full events
    // table — the case q21's broadcast-NL shape cannot survive at
    // scale. operators/RangeJoin replicates each interval onto the
    // 1-hour bins it overlaps (spans are clamped to ≤60 min, so ≤2
    // bins each) and equi-joins points on their single home bin: a
    // plain shuffled join + exact predicate, no NL anywhere, AQE
    // skew-split applicable. A point's bin is unique → pair appears
    // exactly once, no DISTINCT needed. RangeJoinBinnedSpec pins the
    // no-BroadcastNestedLoop plan and equivalence to the NL result.
    "q68_binned_range_join" -> QueryDef(
      """WITH iv AS (
        |  SELECT event_id AS ivl_id, event_type, ts AS s,
        |    ts + INTERVAL 1 MINUTE *
        |      CAST(floor(least(greatest(value, 1), 60)) AS INT) AS e
        |  FROM events),
        |pt AS (SELECT event_id AS pt_id, ts AS t FROM events)
        |SELECT iv.event_type, count(*) AS n_pairs,
        |  count(DISTINCT pt.pt_id) AS n_points,
        |  count(DISTINCT iv.ivl_id) AS n_intervals
        |FROM iv JOIN pt ON pt.t >= iv.s AND pt.t < iv.e
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.RangeJoin
      val ev = Tables.events(s, dir)
      val iv = ev.select(col("event_id").as("ivl_id"), col("event_type"),
        col("ts").as("s"),
        expr("ts + make_interval(0, 0, 0, 0, 0, " +
          "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)").as("e"))
      val pt = ev.select(col("event_id").as("pt_id"), col("ts").as("t"))
      RangeJoin.binnedIntervalJoin(iv, pt, "s", "e", "t", binSeconds = 3600)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("pt_id")).as("n_points"),
          countDistinct(col("ivl_id")).as("n_intervals"))
        .orderBy(col("event_type"))
    },

    // ---- q69: interval×interval overlap join ------------------------
    // Purchase sessions overlapped by view sessions — both sides big
    // interval sets, so both replicate onto hourly bins and the
    // OWNER-BIN rule (keep the pair only in the bin holding the
    // overlap's start) restores exactly-once without a DISTINCT over
    // the pair blowup (see RangeJoin.binnedOverlapJoin). Overlap
    // duration is computed in integer epoch-µs (ts is ms-precision →
    // exact on both engines). The oracle recomputes the whole pair set
    // with a plain inequality join.
    "q69_overlap_join" -> QueryDef(
      """WITH pu AS (
        |  SELECT event_id AS pu_id, ts AS s1,
        |    ts + INTERVAL 1 MINUTE *
        |      CAST(floor(least(greatest(value, 1), 60)) AS INT) AS e1
        |  FROM events WHERE event_type = 'purchase'),
        |vw AS (
        |  SELECT event_id AS vw_id, ts AS s2,
        |    ts + INTERVAL 1 MINUTE *
        |      CAST(floor(least(greatest(value, 1), 60)) AS INT) AS e2
        |  FROM events WHERE event_type = 'view')
        |SELECT strftime(s1, '%Y-%m-%d') AS day, count(*) AS n_pairs,
        |  count(DISTINCT pu_id) AS n_purchases,
        |  CAST(sum((epoch_us(least(e1, e2)) -
        |            epoch_us(greatest(s1, s2))) // 1000000) AS BIGINT)
        |    AS sum_overlap_s
        |FROM pu JOIN vw ON s1 < e2 AND s2 < e1
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.RangeJoin
      val ev = Tables.events(s, dir)
      def ivls(tpe: String, id: String, sN: String, eN: String) =
        ev.filter(col("event_type") === tpe)
          .select(col("event_id").as(id), col("ts").as(sN),
            expr("ts + make_interval(0, 0, 0, 0, 0, " +
              "CAST(floor(least(greatest(value, 1), 60)) AS INT), 0)")
              .as(eN))
      val pu = ivls("purchase", "pu_id", "s1", "e1")
      val vw = ivls("view", "vw_id", "s2", "e2")
      RangeJoin.binnedOverlapJoin(pu, vw, "s1", "e1", "s2", "e2", 3600)
        .groupBy(date_format(col("s1"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("pu_id")).as("n_purchases"),
          sum(expr("(unix_micros(least(e1, e2)) - " +
            "unix_micros(greatest(s1, s2))) div 1000000"))
            .cast("bigint").as("sum_overlap_s"))
        .orderBy(col("day"))
    },

    // ---- q75: time-weighted average -----------------------------------
    // THE irregular-sampling aggregate: each observation's value is
    // weighted by how long it was current (gap to the next sample,
    // floored to whole seconds — identical integer floors on both
    // engines). A plain avg() over-weights bursts; TWA is what a
    // metering/pricing pipeline actually needs. One window (lead) per
    // (type, day) partition + one hash aggregate; weights stay BIGINT
    // seconds and values DECIMAL until the final digit-string division,
    // so the doubles are bit-identical cross-engine.
    "q75_time_weighted_avg" -> QueryDef(
      """WITH s AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, ts,
        |    CAST(value AS DECIMAL(12,2)) AS v,
        |    lead(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |                   ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |w AS (SELECT event_type, day, v,
        |        (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS dt
        |      FROM s WHERE nxt IS NOT NULL)
        |SELECT event_type, CAST(day AS VARCHAR) AS day,
        |  CAST(CAST(sum(v * dt) AS VARCHAR) AS DOUBLE) /
        |    CAST(sum(dt) AS DOUBLE) AS twa,
        |  count(*) AS n_weights
        |FROM w WHERE dt > 0 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, dir) =>
      graft.operators.Resample.timeWeightedAvg(Tables.events(s, dir))
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("twa"), col("n_weights"))
        .orderBy(col("event_type"), col("day"))
    },

    // ---- q76: OHLC candlestick resampling ----------------------------
    // The canonical downsample for tick-style series: per (type, day)
    // the first value (open), extrema (high/low), last value (close),
    // count and sum. Open/close are picked by row_number over the
    // unique (ts, event_id) order — both engines agree on ties by
    // construction, where a bare min_by(ts) would be
    // tie-nondeterministic. Two windows + one aggregate, all partition-
    // local until the final per-group row.
    "q76_ohlc" -> QueryDef(
      """WITH s AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
        |    CAST(value AS DECIMAL(12,2)) AS v
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day
        |                       ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM s)
        |SELECT event_type, CAST(day AS VARCHAR) AS day,
        |  CAST(CAST(min(CASE WHEN rn_a = 1 THEN v END) AS VARCHAR)
        |    AS DOUBLE) AS open,
        |  CAST(CAST(max(v) AS VARCHAR) AS DOUBLE) AS high,
        |  CAST(CAST(min(v) AS VARCHAR) AS DOUBLE) AS low,
        |  CAST(CAST(min(CASE WHEN rn_d = 1 THEN v END) AS VARCHAR)
        |    AS DOUBLE) AS close,
        |  count(*) AS n,
        |  CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE) AS volume
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.operators.Resample.ohlc(Tables.events(s, dir))
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("open"), col("high"), col("low"), col("close"), col("n"),
          col("volume"))
        .orderBy(col("event_type"), col("day"))
    },

    // ---- q77: linear-interpolation gap fill --------------------------
    // q43 fills gaps by carrying the last observation (LOCF); q77
    // fills them on the LINE between the surrounding observations —
    // what a telemetry/pricing resampler wants for smooth quantities.
    // Two IGNORE-NULLS windows find the bracketing observations and
    // their hour indices; the lerp itself is a fixed parenthesization
    // of IEEE double ops over digit-string doubles and exact integer
    // hour offsets, evaluated identically on both engines — and the
    // result is emitted PER ROW, never summed (double accumulation
    // order would differ between engines; per-row doubles are exact).
    "q77_lerp_gapfill" -> QueryDef(
      """WITH obs AS (
        |  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
        |         sum(CAST(value AS DECIMAL(12,2))) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM obs),
        |grid AS (
        |  SELECT t.event_type, g.b AS bucket
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |                AS b FROM span) g),
        |j AS (
        |  SELECT g.event_type, g.bucket,
        |    epoch_us(g.bucket) // 3600000000 AS t,
        |    CASE WHEN o.sum_value IS NOT NULL
        |         THEN epoch_us(g.bucket) // 3600000000 END AS obs_t,
        |    CAST(CAST(o.sum_value AS VARCHAR) AS DOUBLE) AS obs_v
        |  FROM grid g LEFT JOIN obs o
        |    ON g.event_type = o.event_type AND g.bucket = o.bucket),
        |b AS (
        |  SELECT *,
        |    last_value(obs_t IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    last_value(obs_v IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(obs_t IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
        |    first_value(obs_v IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM j)
        |SELECT event_type, CAST(bucket AS VARCHAR) AS bucket_str,
        |  (obs_t IS NULL) AS was_gap,
        |  CASE WHEN pv IS NULL AND nv IS NULL THEN CAST(-1 AS DOUBLE)
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       WHEN nt = pt THEN pv
        |       ELSE pv + (nv - pv) *
        |         (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
        |  END AS filled
        |FROM b ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.operators.Resample.gapFillLerp(Tables.events(s, dir))
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket_str"),
          col("was_gap"), col("filled"))
        .orderBy(col("event_type"), col("bucket_str"))
    },

    // ---- q78: rolling correlation -------------------------------------
    // 7-day rolling Pearson correlation between two derived series
    // (daily purchase vs view revenue) — the co-movement signal behind
    // pair monitoring and anomaly detection. Everything up to the last
    // expression is EXACT integer arithmetic: values as cents, the
    // five co-moments as BIGINT rolling sums over a ROWS frame (all
    // bounded ≤5·10¹³ at fixture geometry), and the final Pearson is
    // one fixed parenthesization of casts, sqrt and divide — IEEE
    // correctly-rounded ops on identical inputs, so cross-engine
    // bit-identity holds (same discipline as q77). Zero-variance
    // windows pin 0 instead of dividing by zero. The unpartitioned
    // window runs over the DAILY series — one row per calendar day
    // after the distributed aggregate, bounded by the calendar, not
    // the corpus.
    "q78_rolling_corr" -> QueryDef(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'view'
        |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |roll AS (
        |  SELECT day,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
        |    sum(x * y) OVER w AS sxy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT CAST(day AS VARCHAR) AS day, n,
        |  CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
        |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
        |       THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
        |            (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |             sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |  END AS corr
        |FROM roll ORDER BY day""".stripMargin) { (s, dir) =>
      def cents(tpe: String) =
        sum(when(col("event_type") === tpe,
          (dec(col("value")) * 100).cast("bigint")).otherwise(0L))
          .cast("bigint")
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(cents("purchase").as("x"), cents("view").as("y"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      val roll = daily.select(col("day"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"),
        sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"),
        sum(col("x") * col("y")).over(w).as("sxy"))
      val varX = col("n") * col("sxx") - col("sx") * col("sx")
      val varY = col("n") * col("syy") - col("sy") * col("sy")
      roll.select(col("day").cast("string").as("day"), col("n"),
          col("sx"), col("sy"),
          when(varX <= 0 || varY <= 0, lit(0.0))
            .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt(varX.cast("double")) * sqrt(varY.cast("double"))))
            .as("corr"))
        .orderBy(col("day"))
    },

    // ---- q79: per-session statistics (Sessionize façade) -------------
    // q22 reports per-USER session counts; q79 is the per-SESSION view
    // a funnel/engagement pipeline actually consumes: start, size and
    // whole-second duration of every session. Same one-shuffle window
    // chain (graft.operators.Sessionize); all outputs exact integers /
    // formatted timestamps, so the hash compare is bit-stable.
    "q79_session_stats" -> QueryDef(
      """WITH gaps AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(date_trunc('microsecond', ts))
        |         - epoch_us(date_trunc('microsecond', lag(ts) OVER w))
        |         > 1800000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY date_trunc('microsecond', ts), event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (
        |      PARTITION BY user_id
        |      ORDER BY date_trunc('microsecond', ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM gaps)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events,
        |  (epoch_us(date_trunc('microsecond', max(ts)))
        |    - epoch_us(date_trunc('microsecond', min(ts)))) // 1000000
        |    AS duration_seconds
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      graft.operators.Sessionize.sessionStats(Tables.events(s, dir))
        .select(col("user_id"), col("session_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          col("n_events"), col("duration_seconds"))
    },

    // ---- q80: as-of join with tolerance ------------------------------
    // q20's "latest right row at or before t" plus the recency bound
    // every real enrichment needs (pandas merge_asof `tolerance`): a
    // match older than 7 days is no match. Same union+window plan; the
    // staleness test is one codegen'd integer-µs comparison per row.
    // -1 sentinel for "no recent-enough match": a NULL-bearing BIGINT
    // degrades to float64 NaN through the driver's pandas pull and
    // hash-mismatches Spark's int64 on every row (q20 dodges this only
    // because every event there has SOME preceding order).
    "q80_asof_tolerance" -> QueryDef(
      """WITH latest_order AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id,
        |  COALESCE(CASE WHEN o.o_orderdate IS NOT NULL
        |    AND epoch_us(date_trunc('microsecond', e.ts))
        |        - epoch_us(date_trunc('microsecond', o.o_orderdate))
        |        <= 604800000000
        |  THEN o.o_orderkey END, -1) AS matched_orderkey
        |FROM events e ASOF LEFT JOIN latest_order o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin) {
      (s, dir) =>
      val latest = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsOfJoin.leftAsOf(
        Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
        latest,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey"),
        toleranceSeconds = Some(7L * 24 * 3600))
        .select(col("event_id"),
          coalesce(col("o_orderkey"), lit(-1L)).as("matched_orderkey"))
    },

    // ---- q96: rolling z-score anomaly flags --------------------------
    // The monitoring primitive over a metric stream: flag the hours
    // where a series departs >3σ from its own trailing window. The
    // z-test runs in EXACT integers — (x−μ)² > 9σ² over the trailing
    // window's (n, Σx, Σx²) cross-multiplies to
    //   (n·x − sx)² > 9·(n·sxx − sx²)
    // so there is no float mean/stddev for the engines to round apart
    // (the q78 co-moment discipline; sqrt never happens). The trailing
    // frame EXCLUDES the current row — an anomaly must not damp its
    // own baseline — and fewer than 5 prior hours means no verdict
    // (flag 0; -1/0/1 keeps the column BIGINT for the pandas pull).
    // Plan: one distributed hourly aggregate (map-side combined), then
    // the window runs per event_type over calendar-bounded rows.
    // Intermediates stay under BIGINT at fixture geometry (n ≤ 20,
    // cents sums ≤ 10⁸ → (n·x)² ≤ 4·10¹⁸); the 100 TB path lifts the
    // co-moments to DECIMAL first.
    "q96_rolling_anomaly" -> QueryDef(
      """WITH hourly AS (
        |  SELECT event_type,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hr,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |roll AS (
        |  SELECT event_type, hr, x,
        |    count(*) OVER w AS n,
        |    COALESCE(sum(x) OVER w, 0) AS sx,
        |    COALESCE(sum(x * x) OVER w, 0) AS sxx
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hr, x, n,
        |  CASE WHEN n < 5 THEN 0
        |       WHEN (n * x - sx) * (n * x - sx) >
        |            9 * (n * sxx - sx * sx) THEN 1
        |       ELSE -1 END AS anomaly
        |FROM roll""".stripMargin) { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .filter(col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
            .as("hr"))
        .agg(sum((dec(col("value")) * 100).cast("bigint")).cast("bigint")
          .as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(-20, -1)
      val roll = hourly.select(col("event_type"), col("hr"), col("x"),
        count(lit(1)).over(w).as("n"),
        coalesce(sum(col("x")).over(w), lit(0L)).as("sx"),
        coalesce(sum(col("x") * col("x")).over(w), lit(0L)).as("sxx"))
      val dev = col("n") * col("x") - col("sx")
      roll.select(col("event_type"), col("hr"), col("x"), col("n"),
        when(col("n") < 5, lit(0))
          .when(dev * dev > lit(9L) * (col("n") * col("sxx") -
            col("sx") * col("sx")), lit(1))
          .otherwise(lit(-1)).as("anomaly"))
    },

    // ---- q99: exponentially weighted moving average -------------------
    // The smoothing primitive next to q96's anomaly flags: a truncated
    // EWMA (α = 1/2, window 16) over the hourly metric series, in EXACT
    // integers — lag i carries weight 2^(15-i), so the weighted sum and
    // the weight mass are BIGINTs (x ≤ 10⁸ cents × Σ2^i < 2^53) and the
    // only float op is ONE exactly-rounded IEEE division at the end,
    // identical in both engines. Warm-up rows (fewer than 16 trailing
    // hours) renormalize over the weights actually present — the
    // standard adjusted-EWMA convention — which the per-lag den terms
    // encode without a special case. Plan: one map-side-combined hourly
    // aggregate, then 16 lag() reads inside ONE window sort per
    // event_type — per-key sequential, parallel across keys, no
    // self-join and no second shuffle.
    "q99_ewma" -> {
      val terms = (0 until 16).map { i =>
        val wt = 1L << (15 - i)
        if (i == 0) (s"x * $wt", s"$wt")
        else (s"coalesce(lag(x, $i) OVER w * $wt, 0)",
          s"(CASE WHEN lag(x, $i) OVER w IS NOT NULL THEN $wt ELSE 0 END)")
      }
      QueryDef(
        s"""WITH hourly AS (
           |  SELECT event_type,
           |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hr,
           |    CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
           |      AS BIGINT) AS x
           |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
           |r AS (
           |  SELECT event_type, hr, x,
           |    ${terms.map(_._1).mkString("(", " + ", ")")} AS num,
           |    ${terms.map(_._2).mkString("(", " + ", ")")} AS den
           |  FROM hourly
           |  WINDOW w AS (PARTITION BY event_type ORDER BY hr))
           |SELECT event_type, hr, x, num, den,
           |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma
           |FROM r""".stripMargin) { (s, dir) =>
        val hourly = Tables.events(s, dir)
          .filter(col("event_type").isNotNull)
          .groupBy(col("event_type"),
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
              .as("hr"))
          .agg(sum((dec(col("value")) * 100).cast("bigint")).cast("bigint")
            .as("x"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        val cols = (0 until 16).map { i =>
          val wt = 1L << (15 - i)
          if (i == 0) (col("x") * wt, lit(wt))
          else {
            val lv = lag(col("x"), i).over(w)
            (coalesce(lv * wt, lit(0L)),
              when(lv.isNotNull, lit(wt)).otherwise(lit(0L)))
          }
        }
        hourly
          .select(col("event_type"), col("hr"), col("x"),
            cols.map(_._1).reduce(_ + _).as("num"),
            cols.map(_._2).reduce(_ + _).as("den"))
          .select(col("event_type"), col("hr"), col("x"), col("num"),
            col("den"),
            (col("num").cast("double") / col("den").cast("double"))
              .as("ewma"))
      }
    },

    // ---- q101: event-sequence pattern matching ------------------------
    // The MATCH_RECOGNIZE-style primitive Spark has no operator for
    // (q38's funnel counts stage REACHES; this matches ORDERED REGEX
    // patterns): each user's history becomes a character string — one
    // char per event, in (ts, event_id) order — and the pattern
    // `view click* purchase` is the regex 'vc*p' counted
    // non-overlapping. Leftmost-earliest regex semantics agree across
    // engines for this alternation-free pattern class. Per-user
    // sequence building is exactly what a MATCH_RECOGNIZE engine
    // buffers per partition: ONE groupBy shuffle, state bounded by a
    // user's own event count, parallel across users — the partition
    // axis the cluster has. array_sort on (ts, event_id) makes the
    // encoding deterministic under any shuffle order.
    "q101_event_seq_match" -> QueryDef(
      """WITH seqs AS (
        |  SELECT user_id, count(*) AS n_events,
        |         string_agg(substr(event_type, 1, 1), ''
        |           ORDER BY ts, event_id) AS seq
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY user_id)
        |SELECT user_id, n_events,
        |  length(seq)::BIGINT AS seq_len,
        |  len(regexp_extract_all(seq, 'vc*p'))::BIGINT AS n_funnel
        |FROM seqs""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          concat_ws("",
            expr("transform(array_sort(collect_list(" +
              "struct(ts, event_id, substring(event_type, 1, 1) AS ch)" +
              ")), x -> x.ch)")).as("seq"))
        .select(col("user_id"), col("n_events"),
          length(col("seq")).cast("long").as("seq_len"),
          expr("regexp_count(seq, 'vc*p')").cast("long").as("n_funnel"))
    },

    // ---- q102: conversion-lag distribution ----------------------------
    // Time-to-convert — the companion to q100's "did they convert":
    // per user, the lag from FIRST signup to the first purchase AT OR
    // AFTER it, summarized as interpolated percentiles (the q29
    // engine-parity discipline: quantile_cont ≡ percentile, rounded to
    // 6 after one shared /1e6). Lags are exact BIGINT microseconds
    // until that division. Plan: two filtered keyed aggregations, an
    // equi-join on user_id with the time predicate as a residual
    // filter, then ONE single-row global aggregate crossed with the
    // single-row signup count — both sides broadcast, nothing big
    // moves. At 100 TB the join is the only real shuffle, on the key
    // the data already clusters by.
    "q102_conversion_lag" -> QueryDef(
      """WITH su AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' AND user_id IS NOT NULL
        |  GROUP BY 1),
        |conv AS (
        |  SELECT s.user_id,
        |    epoch_us(date_trunc('microsecond', min(p.ts)))
        |      - epoch_us(date_trunc('microsecond', s.signup_ts)) AS lat_us
        |  FROM su s JOIN events p
        |    ON p.user_id = s.user_id AND p.event_type = 'purchase'
        |   AND p.ts >= s.signup_ts
        |  GROUP BY s.user_id, s.signup_ts)
        |SELECT (SELECT count(*) FROM su)::BIGINT AS n_signups,
        |  count(*)::BIGINT AS n_converted,
        |  round(quantile_cont(lat_us, 0.5) / 1e6, 6) AS median_latency_s,
        |  round(quantile_cont(lat_us, 0.9) / 1e6, 6) AS p90_latency_s,
        |  CAST(count(*) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM su) AS DOUBLE) AS conversion_rate
        |FROM conv""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val conv = su.join(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("p_ts")),
          Seq("user_id"))
        .filter(col("p_ts") >= col("signup_ts"))
        .groupBy(col("user_id"), col("signup_ts"))
        .agg(min(col("p_ts")).as("first_purchase_ts"))
        .select((unix_micros(col("first_purchase_ts"))
          - unix_micros(col("signup_ts"))).as("lat_us"))
      val summary = conv.agg(
        count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_us, 0.5)") / 1e6, 6)
          .as("median_latency_s"),
        round(expr("percentile(lat_us, 0.9)") / 1e6, 6)
          .as("p90_latency_s"))
      val nSignups = su.agg(count(lit(1)).as("n_signups"))
      summary.crossJoin(broadcast(nSignups))
        .select(col("n_signups"), col("n_converted"),
          col("median_latency_s"), col("p90_latency_s"),
          (col("n_converted").cast("double")
            / col("n_signups").cast("double")).as("conversion_rate"))
    },

    // ---- q103: sliding DAU / WAU / stickiness -------------------------
    // EXACT sliding-window distinct counts — the engagement dashboard
    // primitive. A naive per-window COUNT(DISTINCT) over a RANGE frame
    // can't be exact-distributed; the scalable shape is the day-explode:
    // each (user, active-day) row fans out to the ≤7 trailing windows
    // it participates in (a CONSTANT ×7, independent of corpus size),
    // then one distinct-count per window end. DAU joins back on the
    // window day with missing days as 0; stickiness = DAU/WAU is the
    // single IEEE division. The span row broadcasts; every shuffle is
    // keyed.
    "q103_sliding_dau" -> QueryDef(
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL),
        |span AS (SELECT min(d) AS lo, max(d) AS hi FROM act),
        |win AS (
        |  SELECT a.user_id, (a.d + x.i * INTERVAL 1 DAY)::DATE AS w
        |  FROM act a
        |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i) x
        |  CROSS JOIN span
        |  WHERE (a.d + x.i * INTERVAL 1 DAY)::DATE BETWEEN lo AND hi),
        |wau AS (SELECT w, count(DISTINCT user_id) AS wau FROM win GROUP BY w),
        |dau AS (SELECT d, count(*) AS dau FROM act GROUP BY d)
        |SELECT strftime(wau.w, '%Y-%m-%d') AS day,
        |  coalesce(dau.dau, 0)::BIGINT AS dau, wau.wau::BIGINT AS wau,
        |  CAST(coalesce(dau.dau, 0) AS DOUBLE)
        |    / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM wau LEFT JOIN dau ON dau.d = wau.w""".stripMargin) { (s, dir) =>
      val act = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val span = act.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val win = act.crossJoin(broadcast(span))
        .select(col("user_id"), col("d"), col("lo"), col("hi"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .withColumn("w", date_add(col("d"), col("i")))
        .filter(col("w").between(col("lo"), col("hi")))
      val wau = win.groupBy(col("w"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val dau = act.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      wau.join(dau, wau("w") === dau("d"), "left")
        .select(date_format(col("w"), "yyyy-MM-dd").as("day"),
          coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
          (coalesce(col("dau"), lit(0L)).cast("double")
            / col("wau").cast("double")).as("stickiness"))
    }
  )
}
