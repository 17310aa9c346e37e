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

  private def chunkFiles(out: String): Seq[java.io.File] =
    new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
      .flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".log.gz") && !f.getName.startsWith("."))
      .toSeq

  test("fsck: clean backup reports every chunk ok; corruption and " +
    "name tampering flip the verdicts") {
    val out = freshOut()
    Backup.run(spark, cfg0.copy(outputPath = out))
    def report() = Backup.fsck(spark, out, "event_type").collect()
      .map(r => new java.io.File(r.getString(0)).getName ->
        (r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    val clean = report()
    assert(clean.nonEmpty)
    assert(clean.values.forall { case (rows, readable, crc, env) =>
      rows > 0 && readable && crc && env })
    // corrupt one chunk's bytes (delete the Hadoop .crc sidecar so we
    // test OUR verdict, not the transport checksum)
    val victim = chunkFiles(out).head
    new java.io.File(victim.getParentFile, s".${victim.getName}.crc")
      .delete(): Unit
    val bytes = Files.readAllBytes(victim.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x5a).toByte
    Files.write(victim.toPath, bytes): Unit
    val afterCorrupt = report()(victim.getName)
    assert(!afterCorrupt._3, "flipped bytes must fail the CRC check")
    // tamper another chunk's name envelope: from-ts year 2024 -> 2023
    val victim2 = chunkFiles(out).find(_.getName != victim.getName).get
    val tampered = new java.io.File(victim2.getParentFile,
      victim2.getName.replaceFirst("2024", "2023"))
    new java.io.File(victim2.getParentFile, s".${victim2.getName}.crc")
      .delete(): Unit
    assert(victim2.renameTo(tampered))
    val afterTamper = report()(tampered.getName)
    assert(afterTamper._2 && !afterTamper._4,
      "a name that disagrees with the decoded envelope must flag")
  }

  test("retention prune: strictly-older chunks deleted by name alone, " +
    "straddlers and malformed names survive, reads stay exact") {
    val out = freshOut()
    Backup.run(spark, cfg0.copy(outputPath = out))
    val before = chunkFiles(out)
    // give one chunk a name outside the convention: retention must
    // never touch what it cannot prove old
    val odd = before.head
    val oddName = new java.io.File(odd.getParentFile, "keepsake.log.gz")
    assert(odd.renameTo(oddName))
    val cutoff = Instant.parse("2024-01-15T00:00:00Z")
    val deleted = Backup.retentionPrune(spark, out, cutoff)
    assert(deleted > 0, "some chunks end before the mid-window cutoff")
    val after = chunkFiles(out)
    assert(after.size == before.size - deleted)
    assert(after.exists(_.getName == "keepsake.log.gz"),
      "malformed names are not provably old - must survive")
    // every surviving well-formed chunk's envelope END is at/after the
    // cutoff (straddlers survive; nothing strictly older remains)
    val re = raw"(\d{8}T\d{6}Z)_(\d{8}T\d{6}Z)_.*".r
    after.map(_.getName).foreach {
      case re(_, to) => assert(to >= "20240114T235959Z", s"stale chunk $to")
      case _ => ()
    }
    // and a post-prune filtered read equals the source at-or-after rows
    val got = spark.read.format("graftbackup").load(out)
      .filter(org.apache.spark.sql.functions.col("ts") >=
        "2024-01-15 00:00:00").count()
    val want = Tables.loadPath(spark, cfg0.inputPath)
      .filter(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit("2024-01-15 00:00:00")
          .cast("timestamp") &&
        org.apache.spark.sql.functions.col("ts") <=
        org.apache.spark.sql.functions.lit("2024-01-25 00:00:00")
          .cast("timestamp")).count()
    assert(got == want)
  }
}
