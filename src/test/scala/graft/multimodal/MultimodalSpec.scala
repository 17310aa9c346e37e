package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("feature extraction: known byte histogram") {
    // "AAAA" = 4 bytes of 0x41 → bucket 4
    val docs = Seq((7L, "AAAA", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.extractFeatures(spark, docs).collect().head
    assert(f.doc_id == 7L)
    assert(f.n_bytes == 4L)
    assert(f.histogram(4) == 4L)
    assert(f.histogram.sum == 4L)
  }

  test("media records carry typed metadata and binary payload") {
    val docs = Seq((1L, "hello", "en", "srcX", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Multimodal.mediaRecords(spark, docs).collect().head
    assert(r.format == "fake/srcX")
    assert(r.payload.sameElements("hello".getBytes("UTF-8")))
    assert(r.width == 5 && r.height == 5)
  }

  test("real PNG decode: round-trip recovers closed-form dims and means") {
    // syntheticPng(300): w = 1+300%16 = 13, h = 1+300%8 = 5,
    // rgb = (300%256, 2100%256, 3900%256) = (44, 52, 60)
    val png = Multimodal.syntheticPng(300L)
    // a real PNG: magic bytes present
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val f = Multimodal.decodeImages(Iterator(
      Multimodal.MediaRecord(300L, png, "image/png", 0, 0))).next()
    assert(f.decoded)
    assert(f.width == 13 && f.height == 5)
    assert(f.mean_r == 44.0 && f.mean_g == 52.0 && f.mean_b == 60.0)
  }

  test("undecodable payload degrades to the stub fallback, not a failure") {
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val f = Multimodal.decodeImages(Iterator(
      Multimodal.MediaRecord(9L, junk, "image/jpeg", 640, 480))).next()
    assert(!f.decoded)
    assert(f.width == 640 && f.height == 480)
    assert(f.mean_r == 3.0 && f.mean_g == 3.0 && f.mean_b == 3.0)
  }

  test("real WAV decode: round-trip recovers closed-form audio features") {
    // syntheticWav(300): n = 100+300%100 = 100 frames, amp = 44
    val wav = Multimodal.syntheticWav(300L)
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    val f = Multimodal.decodeAudio(Iterator(
      Multimodal.MediaRecord(300L, wav, "audio/wav", 0, 0))).next()
    assert(f.decoded)
    assert(f.n_frames == 100L)
    assert(f.sample_rate == 8000.0 && f.channels == 1)
    assert(f.mean_amp == 44.0)
  }

  test("undecodable audio payload degrades to decoded=false zeros") {
    val f = Multimodal.decodeAudio(Iterator(
      Multimodal.MediaRecord(5L, Array[Byte](9, 9, 9), "audio/wav", 0, 0))).next()
    assert(!f.decoded && f.n_frames == 0L && f.mean_amp == 0.0)
  }

  test("distributed image pipeline decodes every synthetic payload") {
    val docs = (0L until 64L).map(i => (i, s"t$i", "en", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractImageFeatures(spark, docs).collect()
    assert(feats.length == 64)
    assert(feats.forall(_.decoded))
    feats.foreach { f =>
      assert(f.width == 1 + (f.doc_id % 16).toInt)
      assert(f.height == 1 + (f.doc_id % 8).toInt)
      assert(f.mean_r == (f.doc_id % 256).toDouble)
    }
  }
}
