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
}
