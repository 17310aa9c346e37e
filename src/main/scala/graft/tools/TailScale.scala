package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot diagnostic for the stream-tail's driver-side costs at probe
  * scale (r12 verdict #4, extended for the r14 verdict #1 manifest):
  * the graftbackup micro-batch source's checkpoint offset is a
  * (leaf dir → sorted file count) JSON map — an int per PARTITION
  * LEAF, NOT per chunk file. The per-trigger discovery cost comes in
  * three generations, all measured here against a real backup built at
  * SPARK_GRAFT_SF_DIR's events table over s18's window:
  *
  *  - WALK (pre-r14): every trigger re-lists the whole tree, O(#files).
  *  - WALK + leaf mtime cache (r14): interiors re-walked, unchanged
  *    leaves served from cache — O(#dirs); sound only where directory
  *    mtimes advance on child create (file/hdfs/viewfs), so object
  *    stores fall back to the full walk.
  *  - MANIFEST (r15): every sink commit records what it published
  *    under `_manifest/`; after one reconcile walk the tail reads ONLY
  *    new record files — O(new commits) per trigger on ANY filesystem,
  *    no directory listing, no mtime semantics involved.
  *
  * Walk-generation rows are measured with `_manifest` moved aside
  * (pre-r15 roots look like that), manifest rows with it in place, so
  * the JSON carries all three generations side by side.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 sbt "runMain graft.tools.TailScale"
  */
object TailScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.disableLocalChecksumSidecars(spark)

    val scratch = java.nio.file.Files.createTempDirectory("graft_tailscale")
    try {
      val out = scratch.resolve("bak").toString
      // s18's exact window: base Jan 5-15, incremental extension to 25
      graft.operators.Backup.run(spark, graft.config.BackupConfig(
        inputPath = s"$dir/events.parquet", outputPath = out,
        timeColumn = "ts", partitionColumn = "event_type",
        from = java.time.Instant.parse("2024-01-05T00:00:00Z"),
        to = java.time.Instant.parse("2024-01-15T00:00:00Z")))
      graft.operators.Backup.incremental(spark, s"$dir/events.parquet",
        out, java.time.Instant.parse("2024-01-25T00:00:00Z"))

      def newStream(filters: Array[org.apache.spark.sql.sources.Filter]) =
        new graft.sources.BackupMicroBatchStream(
          out, new org.apache.spark.sql.types.StructType()
            .add("event_type", "string").add("date_dir", "string"),
          Seq("event_type"),
          filters, None,
          Array.empty[org.apache.spark.sql.sources.Filter])

      // time the per-trigger driver costs over several iterations
      // (min-of-N: first call pays FS metadata cache fill)
      def timeMs[A](n: Int)(body: => A): (Double, A) = {
        var best = Double.MaxValue
        var last: A = body // warm
        (1 to n).foreach { _ =>
          val t0 = System.nanoTime()
          last = body
          best = math.min(best, (System.nanoTime() - t0) / 1e6)
        }
        (best, last)
      }

      // backdate dir mtimes to the production shape (the backlog IS
      // old; only just-appended leaves carry fresh stamps) — cache
      // TRUST is age-based (ageCacheEntries below), not mtime-based
      def backdate(f: java.io.File): Unit = {
        f.setLastModified(System.currentTimeMillis() - 600000L)
        if (f.isDirectory)
          f.listFiles().filter(_.isDirectory).foreach(backdate)
      }
      backdate(new java.io.File(out))

      // BATCH discovery: the primitive every batch scan/inference calls
      // — the complete-manifest view vs the full tree walk. Sizes ride
      // the records, so the manifest side also subsumes the per-file
      // stats a scan's statistics would otherwise pay.
      val (bWalkMs, layoutRes) =
        timeMs(5)(graft.sources.BackupSource.layout(out))
      val (bManMs, mview) =
        timeMs(5)(graft.sources.BackupSource.manifestView(out).get)
      require(mview._2.map(_.files.size).sum ==
        layoutRes._2.map(_.files.size).sum,
        "manifest batch view diverged from the walk")
      require(mview._3.size == mview._2.map(_.files.size).sum,
        "manifest records missing sizes")

      // ---- walk generation: pre-r15 root (no manifest log) ----------
      val manifestDir = java.nio.file.Paths.get(out, "_manifest")
      val manifestAside = scratch.resolve("_manifest_aside")
      java.nio.file.Files.move(manifestDir, manifestAside)

      // COLD: full listing, fresh stream per call (no cache) — the
      // pre-r14 per-trigger cost, O(#files)
      val (coldMs, off) = timeMs(5)(newStream(Array.empty)
        .latestOffset().asInstanceOf[graft.sources.BackupOffset])
      val offJson = off.json()

      // WARM: one stream across triggers — the r14 steady-state cost:
      // interior dirs re-walked, unchanged leaves served from the
      // mtime cache, O(#dirs) not O(#files)
      val warmStream = newStream(Array.empty)
      warmStream.latestOffset() // populate cache
      // open the age-based trust window (the steady state of a
      // long-lived tail: backlog entries are minutes-to-days old)
      warmStream.ageCacheEntries(60000L)
      val (warmMs, off2) = timeMs(5)(warmStream
        .latestOffset().asInstanceOf[graft.sources.BackupOffset])
      require(off2.counts == off.counts, "warm offset diverged from cold")

      // FILTERED COLD: subtree pruning before enumeration — a pushed
      // partition filter's listing touches only matching leaves
      val (filtMs, offF) = timeMs(5)(newStream(Array(
        org.apache.spark.sql.sources.EqualTo("event_type", "click")))
        .latestOffset().asInstanceOf[graft.sources.BackupOffset])

      val (planMs, parts) = timeMs(5)(warmStream
        .planInputPartitions(warmStream.initialOffset(), off))

      // TIME-WINDOWED TAIL: offsets count every chunk (positions must
      // be filter-independent), but the batch slice zone-map-prunes by
      // chunk-name envelope — a narrow window plans a fraction of the
      // backlog without opening anything (r14 verdict #6 adjudication)
      val winStream = new graft.sources.BackupMicroBatchStream(
        out, new org.apache.spark.sql.types.StructType()
          .add("event_type", "string").add("ts", "string"),
        Seq("event_type"), Array.empty, Some("ts"),
        Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.GreaterThan(
            "ts", "2024-01-23 00:00:00")))
      val winOff = winStream.latestOffset()
        .asInstanceOf[graft.sources.BackupOffset]
      require(winOff.counts == off.counts,
        "time filters leaked into offset accounting")
      val (winPlanMs, winParts) = timeMs(5)(winStream
        .planInputPartitions(winStream.initialOffset(), winOff))

      // APPEND: one new chunk lands in one leaf — the steady-state
      // trigger that actually has work. Its mtime is fresh (inside the
      // safety window), so the trigger re-walks interiors + re-lists
      // exactly THAT leaf: the measured per-trigger cost with new
      // files, which the O(new files) claim rests on.
      val leafKey = off2.counts.keys.min
      val planted = new java.io.File(new java.io.File(out, leafKey),
        "99999999999999_99999999999999_deadbeef.json.gz")
      require(planted.createNewFile(), "plant failed")
      val (appendMs, offA) = timeMs(3)(warmStream
        .latestOffset().asInstanceOf[graft.sources.BackupOffset])
      require(offA.counts(leafKey) == off.counts(leafKey) + 1,
        "planted append not observed by the tail")
      require(planted.delete(), "unplant failed")

      // ---- manifest generation: r15 root (record log in place) ------
      java.nio.file.Files.move(manifestAside, manifestDir)

      // COLD: one reconcile walk + the record read, then the switch —
      // paid once per stream lifetime (≈ the walk cold cost)
      val (mCold, offM) = timeMs(3)(newStream(Array.empty)
        .latestOffset().asInstanceOf[graft.sources.BackupOffset])
      require(offM.counts == off.counts,
        "manifest reconcile diverged from the walk offset")

      // WARM: steady state — ONE listStatus of _manifest, nothing new
      // to read; no data directory is listed, no mtime consulted (this
      // is the object-store row: same cost on S3A/GCS)
      val mStream = newStream(Array.empty)
      mStream.latestOffset()
      val (mWarm, _) = timeMs(5)(mStream
        .latestOffset().asInstanceOf[graft.sources.BackupOffset])

      // APPEND: a real sink append (one commit → one manifest record);
      // the trigger reads exactly that record — O(new commits),
      // backlog-independent, mtime-independent. Three appends, min-of-3
      // over the trigger that first observes each.
      import org.apache.spark.sql.functions._
      var mAppend = Double.MaxValue
      var expect = offM.counts.values.map(_.toLong).sum
      (1 to 3).foreach { i =>
        spark.range(1).select(
          lit("click").as("event_type"),
          (lit(s"2099-0$i-01 00:00:00").cast("timestamp")).as("ts"),
          lit(i.toLong).as("event_id"))
          .write.format("graftbackup").mode("append")
          .option("partitionColumns", "event_type")
          .option("timeColumn", "ts")
          .save(out)
        expect += 1
        val t0 = System.nanoTime()
        val offI = mStream.latestOffset()
          .asInstanceOf[graft.sources.BackupOffset]
        mAppend = math.min(mAppend, (System.nanoTime() - t0) / 1e6)
        require(offI.counts.values.map(_.toLong).sum == expect,
          "sink append not observed through the manifest record")
      }

      val nFiles = off.counts.values.map(_.toLong).sum
      // floats via Bench.f3 (Locale.ROOT): the f-interpolator honours the
      // default locale, and a comma-decimal locale would emit invalid JSON
      import graft.Bench.f3
      println(s"""{"tool":"tailscale","sf":"$dir","n_leaves":${off.counts.size},"n_files":$nFiles,"offset_json_bytes":${offJson.getBytes("UTF-8").length},"cold_list_ms":${f3(coldMs)},"warm_list_ms":${f3(warmMs)},"append_list_ms":${f3(appendMs)},"filtered_list_ms":${f3(filtMs)},"filtered_files":${offF.counts.values.map(_.toLong).sum},"plan_ms":${f3(planMs)},"n_partitions":${parts.length},"window_plan_ms":${f3(winPlanMs)},"window_planned_files":${winParts.length},"manifest_cold_ms":${f3(mCold)},"manifest_warm_ms":${f3(mWarm)},"manifest_append_ms":${f3(mAppend)},"batch_walk_ms":${f3(bWalkMs)},"batch_manifest_ms":${f3(bManMs)}}""")
    } finally {
      graft.util.Fs.deleteRecursively(scratch)
      spark.stop()
    }
  }
}
