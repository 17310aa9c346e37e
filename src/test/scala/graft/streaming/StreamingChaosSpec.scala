package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chaos cases for the streaming jobs: every injected failure must
  * surface LOUDLY or recover EXACTLY — never a silent empty/partial/
  * duplicated result.
  *
  * - mtime-bump failure (r6 mandate #7): batch order is carried in
  *   file mtimes; a bump that silently fails (setLastModified returns
  *   false) would late-drop every real event.
  * - truncated offset log (r8 mandate #8): a corrupt checkpoint must
  *   refuse to restart, not resume from garbage.
  * - mid-batch kill for the s20 CDC merge and s22 native backup
  *   (r8 mandate #8): a crash in the window between the side effect
  *   and the checkpoint commit replays the batch on recovery; the
  *   replay must be absorbed (apply-if-newer / epoch markers), leaving
  *   the result bit-identical to a clean run.
  */
class StreamingChaosSpec extends AnyFunSuite {

  test("a failed mtime bump throws instead of letting the job return " +
    "an empty result") {
    // setLastModified returns false for a path that does not exist —
    // the same silent-false contract a read-only or mtime-rejecting
    // filesystem exhibits
    val gone = java.nio.file.Paths.get(
      "/tmp/graft_chaos_does_not_exist_" + System.nanoTime() + ".parquet")
    val e = intercept[IllegalStateException] {
      StreamingJobs.bumpMtimeOrFail(gone, System.currentTimeMillis(),
        "test consequence: watermark would late-drop rows")
    }
    assert(e.getMessage.contains("cannot set mtime"))
    assert(e.getMessage.contains("late-drop"))
  }

  test("a successful bump applies the requested mtime") {
    val f = java.nio.file.Files.createTempFile("graft_chaos_", ".parquet")
    try {
      val want = (System.currentTimeMillis() / 1000) * 1000 - 123000
      StreamingJobs.bumpMtimeOrFail(f, want, "unused")
      assert(f.toFile.lastModified() == want)
    } finally java.nio.file.Files.deleteIfExists(f): Unit
  }

  private lazy val spark = graft.SparkTestBase.session
  private val sf0001 = "/root/testdata/sf0.001"

  private def withScratch[A](f: java.nio.file.Path => A): A = {
    val d = java.nio.file.Files.createTempDirectory("graft_chaos")
    try f(d)
    finally {
      val s = java.nio.file.Files.walk(d)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
      finally s.close()
    }
  }

  /** Newest numbered file in a checkpoint metadata dir (offsets/,
    * commits/ — names are batch ids). */
  private def latestEntry(dir: java.nio.file.Path): java.nio.file.Path = {
    val s = java.nio.file.Files.list(dir)
    try s.filter(p => p.getFileName.toString.forall(_.isDigit))
      .max(java.util.Comparator.comparingLong(
        p => p.getFileName.toString.toLong))
      .orElseThrow(() => new IllegalStateException(s"no entries in $dir"))
    finally s.close()
  }

  test("a truncated offset log fails the restart loudly instead of " +
    "resuming from garbage") {
    withScratch { scratch =>
      val ckpt = scratch.resolve("ckpt").toString
      def run(): Unit = {
        val q = StreamingJobs.eventsStream(spark, sf0001)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .writeStream
          .outputMode("complete")
          .format("memory")
          .queryName("graft_chaos_trunc_" + System.nanoTime())
          .option("checkpointLocation", ckpt)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      run() // clean first run populates the checkpoint

      // truncate the newest offsets entry mid-JSON — the shape a crash
      // during a non-atomic metadata write leaves behind
      val off = latestEntry(java.nio.file.Paths.get(ckpt, "offsets"))
      val bytes = java.nio.file.Files.readAllBytes(off)
      assert(bytes.length > 8, "offset log unexpectedly tiny")
      java.nio.file.Files.write(off, bytes.take(bytes.length / 2)): Unit

      val e = intercept[Exception] { run() }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(10).map(String.valueOf(_)).mkString("; ")
      // Spark 4 surfaces the truncation as a Jackson end-of-input error
      // from the offsets-log JSON parse
      assert(chain.toLowerCase.replace('\n', ' ').matches(
        ".*(offset|corrupt|incomplete|parse|malformed|end-of-input|eof).*"),
        s"restart failed for an unrelated reason: $chain")
    }
  }

  test("s20 CDC merge killed after apply, before checkpoint commit, " +
    "recovers to exactly the clean run's serving table") {
    val clean = StreamingJobs.cdcMergeStream(spark, sf0001)
      .collect().toSet
    val recovered = StreamingJobs.cdcMergeStream(spark, sf0001,
      crashAfterApplyInBatch = Some(1)).collect().toSet
    assert(recovered == clean,
      "replayed CDC batch perturbed the serving table")
  }

  test("s22 native backup: a lost checkpoint commit replays the epoch " +
    "and the epoch marker absorbs it — no duplicate rows") {
    withScratch { scratch =>
      val out = scratch.resolve("out").toString
      val ckpt = scratch.resolve("ckpt")
      def run(ckptPath: java.nio.file.Path): Unit = {
        val q = StreamingJobs.eventsStream(spark, sf0001)
          .filter(col("event_type").isNotNull)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .writeStream
          .format("graftbackup")
          .option("partitionColumns", "event_type")
          .option("timeColumn", "ts")
          .option("checkpointLocation", ckptPath.toString)
          .outputMode("append")
          .start(out)
        try q.processAllAvailable() finally q.stop()
      }
      run(ckpt)
      val clean = spark.read.format("graftbackup").load(out)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(clean.nonEmpty && clean.map(_._2).sum > 0)

      // crash window: epoch data published, checkpoint commit lost —
      // delete the newest commit marker and restart; Spark re-runs the
      // epoch, the sink's _streaming_commits marker makes it a no-op.
      // The restart runs from a COPY of the mutilated checkpoint: a
      // same-JVM restart on the original path trips Spark's in-memory
      // metadata-log cache ("multiple queries using ckpt/commits"),
      // while a real crashed driver restarts with a cold cache — the
      // copy models that.
      val lost = latestEntry(ckpt.resolve("commits"))
      java.nio.file.Files.delete(lost)
      // the local checksum FS keeps a .<name>.crc sibling; leaving it
      // behind makes the replayed commit's rename fail as
      // "already exists" instead of landing
      java.nio.file.Files.deleteIfExists(
        lost.resolveSibling("." + lost.getFileName + ".crc")): Unit
      val ckpt2 = scratch.resolve("ckpt2")
      val walk = java.nio.file.Files.walk(ckpt)
      try walk.forEach { p =>
        val dest = ckpt2.resolve(ckpt.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dest): Unit
        else java.nio.file.Files.copy(p, dest): Unit
      } finally walk.close()
      run(ckpt2)
      val recovered = spark.read.format("graftbackup").load(out)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(recovered == clean,
        s"replayed epoch duplicated rows: $clean -> $recovered")
    }
  }
}
