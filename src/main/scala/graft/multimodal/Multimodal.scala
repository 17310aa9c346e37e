package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal-column plumbing: image/audio/video payloads are
  * opaque `binary` columns with typed metadata; feature extraction runs
  * as typed `mapPartitions` over case-class Datasets (the Scala
  * analogue of `mapInPandas` batch UDFs — per-partition iterators, so a
  * real decoder would amortize its setup cost per partition, not per
  * row).
  *
  * The decode step is STUBBED: this container has no image/audio
  * libraries, so [[decodeStub]] produces a deterministic fake feature
  * vector (a 16-bucket byte histogram). Everything around it — schema,
  * binary payload handling, partitioning, the batch iterator shape — is
  * real and tested, and a production decoder drops into [[decodeStub]]
  * unchanged.
  */
object Multimodal {

  /** One media object: payload + typed metadata (schema contract). */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               format: String, width: Int, height: Int)

  /** Extracted features: byte count + 16-bucket histogram. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
                                 histogram: Array[Long])

  /** THE STUB — replace with a real decoder (JPEG decode, resize,
    * model-ready tensor, ...). Deterministic fake: histogram of the
    * payload's high nibbles. Operates on one partition's iterator so
    * decoder init happens once per partition.
    */
  def decodeStub(it: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    it.map { r =>
      val hist = new Array[Long](16)
      var i = 0
      while (i < r.payload.length) {
        hist((r.payload(i) & 0xFF) >> 4) += 1
        i += 1
      }
      MediaFeatures(r.doc_id, r.payload.length.toLong, hist)
    }

  /** documents → MediaRecord dataset (text bytes stand in for media
    * payloads; metadata derived deterministically). */
  def mediaRecords(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("fake/"), col("source")).as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Full pipeline: records → per-partition decode → features. */
  def extractFeatures(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaRecords(spark, documents).mapPartitions(decodeStub)
  }
}
