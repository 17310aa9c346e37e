package graft.operators

import java.nio.file.{Files, Paths}
import java.time.Instant
import java.util.zip.{CRC32, GZIPInputStream}

import graft.{SparkTestBase, Tables}
import graft.config.BackupConfig

/** End-to-end backup pipeline parity (SURVEY.md §3.3, §5.3-5.4):
  * partitioned gz-NDJSON sink, chunk-size cap, `<from>_<to>_<crc32>`
  * file naming, union-of-chunks == filtered input.
  */
class BackupSpec extends SparkTestBase {

  private def freshOut(): String = {
    val d = Files.createTempDirectory("graft_backup_").toString
    d
  }

  private val cfg0 = BackupConfig(
    inputPath = s"$sf0001/events.parquet",
    outputPath = "",
    timeColumn = "ts", partitionColumn = "event_type",
    from = Instant.parse("2024-01-05T00:00:00Z"),
    to = Instant.parse("2024-01-25T00:00:00Z"),
    maxRowsPerChunk = 100)

  test("dry-run counts but writes nothing (cmd/backup.go:102-105)") {
    val out = freshOut()
    val res = Backup.run(spark, cfg0.copy(outputPath = out, dryRun = true))
    assert(res.rowsPerPartition.values.sum > 0)
    assert(res.chunks.isEmpty)
    assert(!Files.list(Paths.get(out)).findAny().isPresent)
  }

  test("backup writes partitioned, chunk-capped, crc-named gz files; roundtrips") {
    val out = freshOut()
    val cfg = cfg0.copy(outputPath = out)
    val res = Backup.run(spark, cfg)

    // chunk files exist with the reference naming contract
    assert(res.chunks.nonEmpty)
    val namePat = raw"(\d{8}T\d{6}Z)_(\d{8}T\d{6}Z)_([0-9a-f]{8})\.log\.gz$$".r
    res.chunks.foreach { c =>
      assert(namePat.findFirstIn(c.path).isDefined, c.path)
      assert(c.rows <= cfg.clampedRows, s"${c.path}: ${c.rows}")
      assert(c.path.contains(s"event_type=${c.partition}"))
      assert(c.path.contains(s"date_dir=${c.date}"))
      // crc32 of the compressed bytes matches the name component
      val bytes = Files.readAllBytes(Paths.get(
        new java.net.URI("file://" + c.path.stripPrefix("file:")).getPath))
      val crc = new CRC32(); crc.update(bytes)
      assert(f"${crc.getValue}%08x" == c.crc32)
      // from/to components are real min/max of the chunk's rows
      assert(c.fromTs <= c.toTs)
      // gzip decodes to one JSON object per line
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val lines = scala.io.Source.fromInputStream(in).getLines().toSeq
      assert(lines.nonEmpty && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
      assert(lines.size == c.rows)
    }

    // union of all chunks == filtered input rows, per partition
    val expected = res.rowsPerPartition
    val byPart = res.chunks.groupBy(_.partition).map { case (p, cs) =>
      p -> cs.map(_.rows).sum }
    assert(byPart == expected)

    // re-read through Spark: row count and partition columns intact
    val back = spark.read.json(s"$out")
    assert(back.count() == expected.values.sum)
    assert(back.columns.contains("event_type") && back.columns.contains("date_dir"))
  }

  test("faithful mode stringifies leaves with the NULL sentinel") {
    val out = freshOut()
    val res = Backup.run(spark, cfg0.copy(outputPath = out), faithfulStrings = true)
    assert(res.chunks.nonEmpty)
    val bytes = Files.readAllBytes(Paths.get(
      new java.net.URI("file://" + res.chunks.head.path.stripPrefix("file:")).getPath))
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val first = scala.io.Source.fromInputStream(in).getLines().next()
    // numeric leaves must be JSON *strings* (reference quirk, helpers.go:9)
    assert(first.matches(""".*"value":"[-0-9.E]+".*"""), first)
    assert(first.matches(""".*"user_id":"\d+".*"""), first)
  }

  test("discovery returns distinct non-null partition values in window") {
    val df = Tables.loadPath(spark, cfg0.inputPath)
    val parts = Backup.discoverPartitions(df, cfg0)
      .collect().map(_.getString(0)).sorted
    assert(parts.sameElements(
      Array("click", "error", "purchase", "signup", "view")))
  }
}
