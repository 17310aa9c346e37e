package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Source/sink format round-trips (SURVEY.md §2.1 [ABSENT] row): the
  * engine exposes Spark's CSV, ORC, JSON, and XML built-ins; each query writes the
  * fixture out in the format, reads it back with an explicit schema,
  * and aggregates — the oracle aggregates the original table, so the
  * round-trip must be lossless for the hashes to match. (No spark-avro
  * module ships in this container's jars, so Avro is out of scope.)
  */
object SourceQueries {

  val defs: Map[String, QueryDef] = Map(

    // CSV: timestamps carried as formatted strings (CSV has no native
    // timestamp type; an explicit format string round-trips exactly)
    "r10_csv_roundtrip" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, day""".stripMargin) { (s, dir) =>
      val out = QueryDef.scratchDir("r10_csv", dir)
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema("event_id LONG, event_type STRING, ts_s STRING, value DOUBLE")
        .csv(out)
        .groupBy(col("event_type"),
          substring(col("ts_s"), 1, 10).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
    },

    // ORC: native columnar round-trip with predicate-pushdown-capable
    // re-read
    "r11_orc_roundtrip" -> QueryDef(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val out = QueryDef.scratchDir("r11_orc", dir)
      Tables.lineitem(s, dir).write.mode("overwrite").orc(out)
      s.read.orc(out)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
    },

    // JSON-lines: the interchange format the reference's sink emits
    // (gz-NDJSON) as a first-class *source* — schema-on-read with an
    // explicit schema (never inference at scale: a sampling pass over
    // 100 TB just to guess types is a full extra scan). Timestamps
    // carried as formatted strings like CSV; explicit schema keeps the
    // read single-pass.
    "r13_json_roundtrip" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, day""".stripMargin) { (s, dir) =>
      val out = QueryDef.scratchDir("r13_json", dir)
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"))
        .write.mode("overwrite").json(out)
      s.read
        .schema("event_id LONG, event_type STRING, ts_s STRING, value DOUBLE")
        .json(out)
        .groupBy(col("event_type"),
          substring(col("ts_s"), 1, 10).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
    },

    // XML (built into Spark 4 sql — no external module): row-per-element
    // layout under an explicit rowTag. Same discipline as CSV/JSON:
    // timestamps as formatted strings, explicit schema on read (XML
    // inference would be an extra full pass at scale).
    "r14_xml_roundtrip" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, day""".stripMargin) { (s, dir) =>
      val out = QueryDef.scratchDir("r14_xml", dir)
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"))
        .write.mode("overwrite")
        .option("rootTag", "events").option("rowTag", "event")
        .format("xml").save(out)
      s.read
        .schema("event_id LONG, event_type STRING, ts_s STRING, value DOUBLE")
        .option("rowTag", "event")
        .format("xml").load(out)
        .groupBy(col("event_type"),
          substring(col("ts_s"), 1, 10).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
    }
  )
}
