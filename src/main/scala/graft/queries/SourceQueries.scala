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

    // Raw text-line ingest — the shape a web-scale corpus actually
    // arrives in (WET-style gz text, one record per line, fields
    // packed into the line): stage documents as TAB-delimited gz text,
    // re-ingest via spark.read.text + an explicit split, aggregate.
    // Scale notes baked into the shape: gzip files are NOT splittable,
    // so read parallelism = file count — the stager writes one gz per
    // task (exactly how WET shards arrive), and the 3-limit split
    // keeps any tab inside the text field intact. Line breaks inside a
    // document would SPLIT the record (spark.read.text frames on line
    // boundaries), so the stager %-encodes %, \n and \r and the reader
    // decodes them — a bijective escape (every post-encode '%' heads a
    // %25/%0A/%0D triple, and no decode pattern can straddle another),
    // so the round-trip is lossless for ANY text, not just the
    // fixture's single-line docs. No inference pass: the parse is an
    // explicit projection, single-pass at any scale.
    "r27_text_source" -> QueryDef(
      """SELECT source, count(*) AS n_docs,
        |  sum(length(text))::BIGINT AS sum_chars
        |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
      val out = QueryDef.scratchDir("r27_text", dir)
      val enc = regexp_replace(regexp_replace(regexp_replace(col("text"),
        "%", "%25"), "\n", "%0A"), "\r", "%0D")
      Tables.documents(s, dir)
        .select(concat_ws("\t", col("doc_id"), col("source"), enc)
          .as("value"))
        .write.mode("overwrite").option("compression", "gzip").text(out)
      val parts = split(col("value"), "\t", 3)
      val dec = regexp_replace(regexp_replace(regexp_replace(
        parts.getItem(2), "%0A", "\n"), "%0D", "\r"), "%25", "%")
      s.read.text(out)
        .select(parts.getItem(0).cast("long").as("doc_id"),
          parts.getItem(1).as("source"), dec.as("text"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("sum_chars"))
    },

    // One-file-per-object multimodal ingest via Spark's binaryFile
    // source — the lake layout image/audio corpora actually land in
    // (object store prefixes of media files): stage real PNGs (one
    // file per sampled doc, encoded executor-side), re-ingest with
    // format("binaryFile"), recover identity from the file PATH
    // metadata column, then run the REAL ImageIO decode; the oracle
    // predicts the decoded features arithmetically from the synthetic
    // generator's closed forms (same first-principles contract as
    // x15). Sampled 1-in-7 to keep staged file counts sane at bench
    // scales — at lake scale the source parallelizes by file, and
    // pathGlobFilter prunes the listing before any byte is read.
    "r28_binaryfile_source" -> QueryDef(
      """SELECT doc_id, TRUE AS decoded,
        |  (1 + doc_id % 16)::INT AS width,
        |  (1 + doc_id % 8)::INT AS height,
        |  (doc_id % 256)::DOUBLE AS mean_r,
        |  ((doc_id * 7) % 256)::DOUBLE AS mean_g,
        |  ((doc_id * 13) % 256)::DOUBLE AS mean_b
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      val out = QueryDef.scratchDir("r28_binfile", dir)
      new java.io.File(out).mkdirs()
      Tables.documents(s, dir)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id")).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val p = java.nio.file.Paths.get(out, s"doc_$id.png")
            java.nio.file.Files.write(p,
              graft.multimodal.Multimodal.syntheticPng(id)): Unit
          }
        }
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load(out)
        .select(regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          graft.multimodal.Multimodal.MediaRecord(id, bytes, "image/png", 0, 0)
        })
        .mapPartitions(graft.multimodal.Multimodal.decodeImages)
        .toDF()
    },

    // CSV: timestamps carried as formatted strings (CSV has no native
    // timestamp type; an explicit format string round-trips exactly)
    "r10_csv_roundtrip" -> QueryDef(
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, day""".stripMargin) { (s, dir) =>
      val out = QueryDef.scratchDir("r10_csv", dir)
      // r16 opt: the fixture table is one parquet row group, so the
      // CSV encode (date_format + quoting) ran on ONE task (eventlog:
      // ~1.3 s serial write stage) and the read-back landed in one
      // file. The spread barrier parallelizes encode AND re-read; the
      // grouped result is file-layout independent, so rows are
      // identical. At scale the scan arrives pre-split and this is one
      // narrow-projection shuffle before a format conversion pass.
      Tables.events(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
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
      // r16 opt note: a spread barrier before this ORC write was
      // A/B-tested and REVERTED (1.98 -> 2.33 s, flagged by the bench's
      // own regression gate): the 11 MB shuffle + 32 small ORC files'
      // footer/dictionary overhead cost more than the serial encode it
      // parallelized. The CSV/JSON/XML roundtrips keep their barrier -
      // their per-row text encode dominates; ORC's columnar encode is
      // already cheap per row.
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
      // spread before encode — same rationale as r10
      Tables.events(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
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
      // spread before encode — same rationale as r10; XML pays the
      // heaviest per-row serialization of the source family
      Tables.events(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
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
