package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.dedup.Dedup
import graft.similarity.Pq

/** Streaming index maintenance (s23/s24) contract: per-batch
  * increments are idempotent on replay (the failure-between-write-and-
  * checkpoint case foreachBatch exposes), and the maintained index
  * converges to the batch rebuild regardless of batching. */
class StreamingIndexSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sf0001)
  private def emb = Tables.embeddings(spark, sf0001)

  private def withScratch[A](f: java.nio.file.Path => A): A = {
    val d = java.nio.file.Files.createTempDirectory("graft_sidx_spec")
    try f(d)
    finally {
      val s = java.nio.file.Files.walk(d)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
      finally s.close()
    }
  }

  test("a replayed LSH-postings batch is idempotent: double-append " +
    "changes nothing about the probed index") {
    withScratch { scratch =>
      val corpus = docs.filter(col("source") =!= "src7")
      val b0 = corpus.filter(pmod(col("doc_id"), lit(2)) === 0)
      val b1 = corpus.filter(pmod(col("doc_id"), lit(2)) === 1)
      val dest = scratch.resolve("lsh").toString
      StreamingJobs.appendLshPostings(b0, 0, dest)
      StreamingJobs.appendLshPostings(b1, 1, dest)
      // the failure-replay: batch 1 runs AGAIN (checkpoint commit was
      // lost); mode=overwrite on batch=<id> must absorb it
      StreamingJobs.appendLshPostings(b1, 1, dest)
      val maintained = Dedup.capPostings(
        spark.read.parquet(dest).select("band", "bucket", "doc_id"))
      val rebuilt = Dedup.lshIndex(corpus)
      assert(maintained.collect().toSet == rebuilt.collect().toSet,
        "replayed batch perturbed the maintained index")
    }
  }

  test("a TORN LSH-postings write (driver killed mid-append) is fully " +
    "absorbed by the replayed batch") {
    // the kill -9 window foreachBatch exposes: the batch's output dir
    // holds a PARTIAL write (some part files, no _SUCCESS, a live
    // _temporary attempt dir) and the checkpoint never committed, so
    // recovery replays the batch. mode=overwrite on batch=<id> must
    // replace the torn directory wholesale — including the attempt
    // garbage — or the capped probe view would double-count postings.
    withScratch { scratch =>
      val corpus = docs.filter(col("source") =!= "src7")
      val b0 = corpus.filter(pmod(col("doc_id"), lit(2)) === 0)
      val b1 = corpus.filter(pmod(col("doc_id"), lit(2)) === 1)
      val dest = scratch.resolve("lsh").toString
      StreamingJobs.appendLshPostings(b0, 0, dest)
      // torn batch 1: a strict subset of its postings landed
      Dedup.bandBuckets(b1.filter(pmod(col("doc_id"), lit(4)) === 1))
        .write.mode("overwrite").parquet(s"$dest/batch=1")
      val bdir = java.nio.file.Paths.get(dest, "batch=1")
      java.nio.file.Files.deleteIfExists(bdir.resolve("_SUCCESS")): Unit
      val tmp = bdir.resolve("_temporary").resolve("0")
      java.nio.file.Files.createDirectories(tmp): Unit
      java.nio.file.Files.write(tmp.resolve("part-00000-attempt0.parquet"),
        Array[Byte](0x50, 0x41, 0x52)): Unit
      // recovery replay of the full batch
      StreamingJobs.appendLshPostings(b1, 1, dest)
      val maintained = Dedup.capPostings(
        spark.read.parquet(dest).select("band", "bucket", "doc_id"))
      assert(maintained.collect().toSet ==
        Dedup.lshIndex(corpus).collect().toSet,
        "torn write survived the replay")
    }
  }

  test("a TORN PQ-codes write is fully absorbed by the replayed batch") {
    withScratch { scratch =>
      val dest = scratch.resolve("pq").toString
      val b0 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val b1 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      StreamingJobs.appendPqCodes(b0, 0, dest)
      // torn batch 1: half its codes landed, no _SUCCESS, attempt junk
      Pq.withCodes(b1.filter(pmod(col("vec_id"), lit(4)) === 1))
        .select(col("vec_id"), col("codes"))
        .write.mode("overwrite").parquet(s"$dest/batch=1")
      val bdir = java.nio.file.Paths.get(dest, "batch=1")
      java.nio.file.Files.deleteIfExists(bdir.resolve("_SUCCESS")): Unit
      val tmp = bdir.resolve("_temporary").resolve("0")
      java.nio.file.Files.createDirectories(tmp): Unit
      java.nio.file.Files.write(tmp.resolve("part-00000-attempt0.parquet"),
        Array[Byte](0x50, 0x41, 0x52)): Unit
      StreamingJobs.appendPqCodes(b1, 1, dest)
      val maintained = spark.read.parquet(dest)
        .select(col("vec_id"), col("codes"))
      val viaStream = Pq.probeIndex(spark, maintained, emb, 0, 10).collect()
      val batchIdx = scratch.resolve("pq_batch").toString
      Pq.writeIndex(emb, batchIdx)
      val viaBatch = Pq.probeIndex(spark, spark.read.parquet(batchIdx),
        emb, 0, 10).collect()
      assert(viaStream.toSeq == viaBatch.toSeq,
        "torn write changed the maintained index's ranking")
    }
  }

  test("stream-maintained LSH index converges to the batch rebuild " +
    "under a different batching") {
    withScratch { scratch =>
      val corpus = docs.filter(col("source") =!= "src7")
      val dest = scratch.resolve("lsh").toString
      // 3 uneven batches, different from the job's 4-way round-robin
      StreamingJobs.appendLshPostings(
        corpus.filter(col("doc_id") % 7 === 0), 0, dest)
      StreamingJobs.appendLshPostings(
        corpus.filter(col("doc_id") % 7 === 1), 1, dest)
      StreamingJobs.appendLshPostings(
        corpus.filter(col("doc_id") % 7 >= 2), 2, dest)
      val maintained = Dedup.capPostings(
        spark.read.parquet(dest).select("band", "bucket", "doc_id"))
      assert(maintained.collect().toSet ==
        Dedup.lshIndex(corpus).collect().toSet,
        "batching changed the maintained index")
    }
  }

  test("a replayed PQ-codes batch is idempotent and the maintained " +
    "code index probes identically to the batch-built one") {
    withScratch { scratch =>
      val dest = scratch.resolve("pq").toString
      val b0 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val b1 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      StreamingJobs.appendPqCodes(b0, 0, dest)
      StreamingJobs.appendPqCodes(b1, 1, dest)
      StreamingJobs.appendPqCodes(b1, 1, dest) // replay
      val maintained = spark.read.parquet(dest)
        .select(col("vec_id"), col("codes"))
      val viaStream = Pq.probeIndex(spark, maintained, emb, 0, 10).collect()

      val batchIdx = scratch.resolve("pq_batch").toString
      Pq.writeIndex(emb, batchIdx)
      val viaBatch = Pq.probeIndex(spark, spark.read.parquet(batchIdx),
        emb, 0, 10).collect()
      assert(viaStream.toSeq == viaBatch.toSeq,
        "maintained code index ranks differently from the batch rebuild")
    }
  }

  test("dedup gate admits are invariant to batching and idempotent " +
    "under batch replay") {
    // the s25 contract: each doc's admit decision depends only on its
    // own postings x the static corpus index, so ANY batching of the
    // feed — including a replayed batch landing twice — yields the
    // same admitted set as the one-shot anti-join
    val corpusIdx = Dedup.lshIndex(docs.filter(col("source") =!= "src7"))
      .cache()
    try {
      val feed = docs.filter(col("source") === "src7")
      def admit(batch: org.apache.spark.sql.DataFrame) =
        batch.join(
          Dedup.lshProbePairs(corpusIdx, batch)
            .select(col("new_doc").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet

      val oneShot = admit(feed)
      val b0 = feed.filter(pmod(col("doc_id"), lit(3)) === 0)
      val b1 = feed.filter(pmod(col("doc_id"), lit(3)) === 1)
      val b2 = feed.filter(pmod(col("doc_id"), lit(3)) === 2)
      val batched = admit(b0) ++ admit(b1) ++ admit(b2)
      assert(batched == oneShot, "batching changed the admitted set")
      // replay: admitting b1 twice adds nothing (set semantics mirror
      // the overwrite-on-batchId sink dirs)
      assert(batched ++ admit(b1) == oneShot,
        "a replayed batch changed the admitted set")
      assert(oneShot.nonEmpty && oneShot.size < feed.count(),
        "gate should admit some docs and reject at least one near-dup")
    } finally { corpusIdx.unpersist(): Unit }
  }
}
