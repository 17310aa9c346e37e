package graft.queries

import graft.streaming.StreamingJobs

/** Streaming query surface: each runs a Structured Streaming job to
  * completion over the finite events fixture, so a batch DuckDB oracle
  * can hash-check the final state (streaming results == batch results
  * on bounded input).
  */
object StreamingQueries {

  // lazy (matching SimilarityQueries): s24's oracle-vs-rows-only choice
  // forces PQ codebook training, which needs an ACTIVE SparkSession — a
  // strict val would make that choice at class-load time, and a JVM
  // that touches StreamingQueries before any session exists would
  // silently and permanently lose s24's oracle (advisor r9)
  lazy val defs: Map[String, QueryDef] = Map(

    // UPDATE output mode: per-batch emission of only the changed
    // groups, over time-ordered staged chunks whose mid-window
    // boundaries force multi-batch updates of the same window; the
    // monotone max(n)/max_by finalizer makes the bounded result equal
    // batch aggregation under any batch split (see
    // StreamingJobs.updateModeCounts).
    // stream-stream LEFT OUTER join: null-side emission driven by the
    // watermark via a both-roles flush sentinel (see
    // StreamingJobs.streamStreamLeftJoin); bounded result equals the
    // batch LEFT JOIN. Unmatched purchases are -1, not NULL (BIGINT
    // survives the driver's pandas pull).
    "s15_stream_stream_left_join" -> QueryDef(
      """SELECT c.user_id, c.event_id AS click_event,
        |  COALESCE(p.event_id, -1) AS purchase_event
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click') c
        |LEFT JOIN (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin) {
      (s, dir) => StreamingJobs.streamStreamLeftJoin(s, dir)
    },

    // stream-stream FULL OUTER join: null-side emission on BOTH roles
    // (unmatched clicks and unmatched purchases), watermark-driven via
    // the same both-roles flush sentinel; bounded result equals the
    // batch FULL JOIN.
    "s19_stream_stream_full_join" -> QueryDef(
      """SELECT COALESCE(c.user_id, p.user_id) AS user_id,
        |  COALESCE(c.event_id, -1) AS click_event,
        |  COALESCE(p.event_id, -1) AS purchase_event
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click') c
        |FULL JOIN (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin) {
      (s, dir) => StreamingJobs.streamStreamFullJoin(s, dir)
    },

    // streaming CDC apply: per-batch last-writer-wins collapse +
    // apply-if-newer Merge.merge rewrite of a serving table; final
    // table equals the batch per-user argmax under any batch split.
    "s20_stream_cdc_merge" -> QueryDef(
      """SELECT user_id, event_id AS latest_event,
        |  event_type AS latest_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin) {
      (s, dir) => StreamingJobs.cdcMergeStream(s, dir)
    },

    // stateful aggregation on the RocksDB state store provider with
    // changelog checkpointing — the off-heap production state backend;
    // the job fails loudly if the checkpoint lacks RocksDB artifacts.
    "s21_rocksdb_state" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, dir) => StreamingJobs.rocksdbStateCounts(s, dir)
    },

    // native streaming write through the connector's StreamingWrite
    // (epoch-marker exactly-once), read back through the same
    // connector — no foreachBatch/file-sink detour.
    "s22_streaming_backup_native" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y%m%d') AS date_dir,
        |  count(*) AS n_rows, sum(user_id)::BIGINT AS sum_uid
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) => StreamingJobs.streamingBackupNative(s, dir)
    },

    "s14_stream_update_mode" -> QueryDef(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type""".stripMargin) {
      (s, dir) => StreamingJobs.updateModeCounts(s, dir)
    },

    // tumbling event-time windows + watermark (complete mode)
    "s01_stream_tumbling" -> QueryDef(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type""".stripMargin) {
      (s, dir) => StreamingJobs.tumblingCounts(s, dir)
    },

    // Trigger.AvailableNow: bounded-batch backlog catch-up that
    // self-terminates — the scheduled-incremental production mode
    "s17_stream_available_now" -> QueryDef(
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_rows,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1""".stripMargin) {
      (s, dir) => StreamingJobs.availableNowCatchup(s, dir)
    },

    // stateful running per-partition counts (reference A3, streaming)
    "s02_stream_partition_counts" -> QueryDef(
      """SELECT event_type, count(*) AS n_rows
        |FROM events GROUP BY event_type""".stripMargin) {
      (s, dir) => StreamingJobs.partitionCounts(s, dir)
    },

    // stream-static join: per-batch re-planned static dimension joined
    // into the stream before a stateful aggregation
    "s05_stream_static_join" -> QueryDef(
      """WITH d AS (SELECT event_type, count(*) AS type_total
        |           FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n_rows, min(d.type_total) AS type_total
        |FROM events e JOIN d USING (event_type)
        |GROUP BY e.event_type""".stripMargin) {
      (s, dir) => StreamingJobs.streamStaticJoin(s, dir)
    },

    // streaming exact dedup: one state entry per key, first arrival
    // emitted (append mode) — the streaming face of x01/x02
    "s04_stream_dedup" -> QueryDef(
      "SELECT DISTINCT user_id FROM events") {
      (s, dir) => StreamingJobs.streamDedupKeys(s, dir)
    },

    // bounded-state streaming dedup: dropDuplicatesWithinWatermark ages
    // expired keys out of the state store — the production shape when
    // the key space is unbounded. The watermark delay covers the whole
    // fixture span, so the emitted key set equals batch DISTINCT.
    "s06_stream_dedup_watermark" -> QueryDef(
      "SELECT DISTINCT user_id FROM events") {
      (s, dir) => StreamingJobs.streamDedupKeysWatermarked(s, dir)
    },

    // event-time session windows (dynamic gap-close) in append mode:
    // sessions finalize when the watermark passes their close, driven
    // past the last real session by a staged flush sentinel. The oracle
    // is batch gap-sessionization with session_window's boundary rule
    // (exact-gap deltas MERGE — new session only when delta > gap,
    // pinned by StreamingSpec's edge test), on the same µs-truncation
    // discipline as q22.
    "s07_stream_session_window" -> QueryDef(
      """WITH gaps AS (
        |  SELECT user_id, date_trunc('microsecond', ts) AS ts,
        |    CASE WHEN epoch_us(date_trunc('microsecond', ts))
        |        - epoch_us(date_trunc('microsecond', lag(ts) OVER w))
        |      > 1800000000 OR lag(ts) OVER w IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY date_trunc('microsecond', ts))
        |),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM gaps)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin) {
      (s, dir) => StreamingJobs.sessionCounts(s, dir)
    },

    // sliding event-time windows: every event contributes to
    // width/slide = 2 overlapping windows; the oracle expands both
    // candidate window starts per event and keeps the containing ones
    "s09_stream_sliding" -> QueryDef(
      """WITH t AS (SELECT event_type, date_trunc('microsecond', ts) AS ts
        |           FROM events),
        |w AS (
        |  SELECT event_type, ts, unnest([
        |    ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND,
        |    ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND
        |       - INTERVAL 30 MINUTE]) AS ws
        |  FROM t)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n
        |FROM w
        |WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
        |GROUP BY ws, event_type""".stripMargin) {
      (s, dir) => StreamingJobs.slidingCounts(s, dir)
    },

    // stream-stream inner join with an event-time bound: both sides
    // buffer state; a click pairs with same-user purchases in the
    // following hour — bounded-input emission equals the batch join
    "s10_stream_stream_join" -> QueryDef(
      """WITH c AS (SELECT user_id, event_id,
        |             date_trunc('microsecond', ts) AS ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id,
        |        date_trunc('microsecond', ts) AS ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id AS user_id, c.event_id AS click_event,
        |  p.event_id AS purchase_event
        |FROM c JOIN p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin) {
      (s, dir) => StreamingJobs.streamStreamJoin(s, dir)
    },

    // streaming parquet FILE sink (the production sink; memory is
    // test-only): append-mode write with the sink's exactly-once commit
    // log, batch read-back must equal the batch computation
    "s11_stream_file_sink" -> QueryDef(
      """SELECT user_id, count(*) AS n_clicks
        |FROM events WHERE event_type = 'click'
        |GROUP BY user_id""".stripMargin) {
      (s, dir) => StreamingJobs.streamToFileSink(s, dir)
    },

    // streaming continuous backup: the event stream written to the
    // batch Backup's partitioned gz-NDJSON layout (exactly-once file
    // sink), read back through the graftbackup DSv2 connector — the
    // sink format and the connector verify each other end-to-end
    "s16_streaming_backup" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y%m%d') AS date_dir,
        |       count(*) AS n_rows, sum(user_id)::BIGINT AS sum_uid
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, dir) => StreamingJobs.streamingBackup(s, dir)
    },

    // streaming tail of a growing backup: the graftbackup connector as
    // a MICRO-BATCH SOURCE (per-leaf sorted-count offsets — the
    // directory tree is the log), fed by Backup.incremental's append
    // between triggers; final state must equal the batch aggregate
    // over the full window
    "s18_stream_backup_tail" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y%m%d') AS date_dir,
        |       count(*) AS n_rows
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-25 00:00:00'
        |  AND event_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) => StreamingJobs.streamBackupTail(s, dir)
    },

    // checkpoint-restart recovery: the aggregation runs over half the
    // input, the query stops (simulated failure), and a NEW query
    // started from the same checkpoint ingests the rest — recovered
    // state must equal the batch computation over everything
    // (exactly-once across the restart)
    "s08_stream_restart_checkpoint" -> QueryDef(
      """SELECT event_type, count(*) AS n_rows
        |FROM events GROUP BY event_type""".stripMargin) {
      (s, dir) => StreamingJobs.restartFromCheckpoint(s, dir)
    },

    // arbitrary custom state via flatMapGroupsWithState (per-user
    // running count + exact value sum held in GroupState)
    "s03_stream_custom_state" -> QueryDef(
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin) {
      (s, dir) => StreamingJobs.customStateCounts(s, dir)
    },

    // modern arbitrary-state API (Spark 4 transformWithState): named
    // composable ValueStates on the RocksDB provider — per-user count
    // + running max; cents arithmetic keeps max exact, and max(cents)
    // / 100.0 equals DuckDB's decimal max cast to double
    "s12_transform_with_state" -> QueryDef(
      """SELECT user_id, count(*) AS n_events,
        |  CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value
        |FROM events GROUP BY user_id""".stripMargin) {
      (s, dir) => StreamingJobs.transformWithStateCounts(s, dir)
    },

    // foreachBatch multi-destination sink (idempotent-on-batchId
    // per-batch directories + a second pre-aggregate destination);
    // the merged read-back must equal the batch computation
    "s13_foreach_batch" -> QueryDef(
      """SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id""".stripMargin) {
      (s, dir) => StreamingJobs.foreachBatchSink(s, dir)
    },

    // streaming LSH-index maintenance: the corpus streams in, each
    // micro-batch appends its postings (idempotent batch=<id> dirs),
    // the src7 increment probes the capped view — must converge to
    // x51's batch-rebuilt index probe, so it shares x51's oracle SQL
    // verbatim
    "s23_stream_lsh_index_maintain" ->
      QueryDef(DedupQueries.duckIncrementalProbeSql) {
        (s, dir) => StreamingJobs.streamingLshIndexMaintain(s, dir)
      },

    // streaming dedup GATE: the src7 feed streams in and each batch
    // admits only docs with no LSH candidate against the persisted
    // corpus index — dedup-on-ingest. The oracle is the one-shot
    // anti-join over the shared incremental-probe pairs: admitted =
    // src7 minus any doc that probes a corpus near-dup
    "s25_stream_dedup_gate" -> QueryDef(
      s"""WITH pr AS (${DedupQueries.duckIncrementalProbeSql})
         |SELECT d.doc_id, d.n_chars FROM documents d
         |WHERE d.source = 'src7'
         |  AND d.doc_id NOT IN (SELECT new_doc FROM pr)""".stripMargin) {
      (s, dir) => StreamingJobs.streamingDedupGate(s, dir)
    },

    // streaming ROLLING ingest: s25's gate + s23's maintenance
    // composed into the continuous loop — daily batches stream in
    // (one per trigger, mtime-ordered), each admits against the
    // posting log as of the previous batch and appends its admitted
    // postings. Shares x60's oracle SQL verbatim: the stream must
    // converge to the batch rolling pipeline exactly (the s23 ≡ x51
    // contract, one level up the composition)
    "s26_stream_rolling_ingest" ->
      QueryDef(DedupQueries.duckRollingIngestSql) {
        (s, dir) => StreamingJobs.streamingRollingIngest(s, dir)
      },

    // streaming PQ code-index maintenance: embeddings stream in, each
    // batch appends its codes, the post-stream ADC probe must rank
    // identically to x52's live scan — shares x52's oracle SQL
    // verbatim (falls back to rows-only if codebook training fails,
    // the pqDefs contract)
    "s24_stream_pq_index_maintain" -> (
      try QueryDef(SimilarityQueries.duckAdcTopkSql) {
        (s, dir) => StreamingJobs.streamingPqIndexMaintain(s, dir)
      } catch {
        // NonFatal only: an OOM/linkage error must propagate, not be
        // recorded as "oracle generation failed" (advisor r9)
        case scala.util.control.NonFatal(t) =>
          System.err.println(
            s"[streaming] PQ oracle generation failed: ${t.getMessage}")
          QueryDef.rowsOnly((s, dir) =>
            StreamingJobs.streamingPqIndexMaintain(s, dir))
      })
  )
}
