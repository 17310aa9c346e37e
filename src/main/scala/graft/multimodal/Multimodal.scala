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
  * Two decode paths:
  *  - [[decodeImages]] is a REAL decoder boundary: `javax.imageio`
  *    ships with the JDK (no external libs, no egress), so PNG payloads
  *    go through a genuine decode → (width, height, per-channel mean)
  *    extraction. Undecodable payloads fall back to the deterministic
  *    stub features with `decoded = false` — the production contract
  *    (decoders fail on corrupt media; the pipeline must not).
  *  - [[decodeStub]] is the declared stand-in for codecs the container
  *    lacks (JPEG/audio/video): a deterministic 16-bucket byte
  *    histogram. Everything around it — schema, binary payload
  *    handling, partitioning, the batch iterator shape — is real, and a
  *    production decoder drops in unchanged.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // round-trips a temp file, which dominates cost for small in-memory
  // payloads (measured ~6 s for 5000 tiny PNGs at sf0.1). Heap streams
  // only — runs once per JVM on first touch of this object (executors
  // reference it from the task closure, so a real cluster initializes
  // it per executor too).
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Image features from a real decode: dimensions + per-channel means.
    * `decoded = false` rows carry the fallback (metadata dims, byte
    * mean in every channel). */
  final case class ImageFeatures(doc_id: Long, decoded: Boolean,
                                 width: Int, height: Int,
                                 mean_r: Double, mean_g: Double,
                                 mean_b: Double)

  /** REAL decode boundary via the JDK's built-in `javax.imageio`: parse
    * the payload, walk the pixels, emit dims + channel means. A payload
    * ImageIO cannot parse (or that throws) degrades to the stub
    * features with `decoded = false` instead of failing the task —
    * corrupt media is data, not an error, at corpus scale. Iterator-in/
    * iterator-out so a heavier decoder's setup amortizes per partition. */
  def decodeImages(it: Iterator[MediaRecord]): Iterator[ImageFeatures] =
    it.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null) {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xFF
            sg += (p >> 8) & 0xFF
            sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageFeatures(r.doc_id, decoded = true, w, h,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      } else {
        var s = 0L
        var i = 0
        while (i < r.payload.length) { s += (r.payload(i) & 0xFF); i += 1 }
        val m = if (r.payload.length == 0) 0.0 else s.toDouble / r.payload.length
        ImageFeatures(r.doc_id, decoded = false, r.width, r.height, m, m, m)
      }
    }

  /** Deterministic synthetic PNG: a solid-RGB image whose dimensions
    * and color are closed forms of `doc_id` (w = 1 + id%16,
    * h = 1 + id%8, rgb = (id%256, 7id%256, 13id%256)). The ENCODE side
    * of the real-codec round-trip: the oracle predicts the decoded
    * features arithmetically, so x15 verifies an actual PNG decode
    * against first principles. PNG is lossless RGB — solid-color means
    * are exact integers after decode. */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 1 + (docId % 16).toInt
    val h = 1 + (docId % 8).toInt
    val rgb = (((docId % 256).toInt & 0xFF) << 16) |
      ((((docId * 7) % 256).toInt & 0xFF) << 8) |
      (((docId * 13) % 256).toInt & 0xFF)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** documents → PNG MediaRecords (payload really is a valid PNG). */
  def imageRecords(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        MediaRecord(id, syntheticPng(id), "image/png", 0, 0)))
  }

  /** Full image pipeline: synthetic PNG encode → REAL ImageIO decode →
    * feature extraction, all inside the executors. */
  def extractImageFeatures(spark: SparkSession,
                           documents: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    imageRecords(spark, documents).mapPartitions(decodeImages)
  }

  /** Audio features from a real decode: frame count, format metadata,
    * mean amplitude. `decoded = false` rows carry zeros (the fallback
    * contract, as with images). */
  final case class AudioFeatures(doc_id: Long, decoded: Boolean,
                                 n_frames: Long, sample_rate: Double,
                                 channels: Int, mean_amp: Double)

  /** The javax.sound SPI providers, resolved ONCE per JVM. The static
    * `AudioSystem.getAudioInputStream`/`write` entry points fetch their
    * provider list through `JDK13Services.getProviders` — a
    * `synchronized` method that re-runs a fresh `ServiceLoader` scan on
    * EVERY call — so a 32-thread decode stage serializes on that one
    * monitor: the sf10 probe measured x31 at 10,291 task-seconds of
    * which only 380 s was CPU; the rest was threads parked on the
    * registry lock. Materializing the provider lists once (against the
    * platform loader that owns java.desktop, not the task TCCL) makes
    * the provider LOOKUP lock-free; empty lists (a JRE without audio
    * providers) fall back to the static entry points. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader],
      classOf[javax.sound.sampled.AudioSystem].getClassLoader).asScala.toList
  }
  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter],
      classOf[javax.sound.sampled.AudioSystem].getClassLoader).asScala.toList
  }

  /** The reader that accepted the previous payload, tried first on the
    * next one. Caching the provider LIST is not enough: the walk order
    * is ServiceLoader order, and in the JDK's java.desktop that puts
    * `SoftMidiAudioFileReader` ahead of `WaveFileReader` — and the MIDI
    * reader's reject path calls `MidiSystem.getSequence`, which fetches
    * the MIDI provider registry through `JSSecurityManager
    * .getProviders`, a method `synchronized` on the class. Thread-dump
    * proof: 31/32 decode threads BLOCKED waiting to lock that Class
    * object, inside a reader that was always going to throw. Trying the
    * last-successful reader first makes the steady state (a corpus of
    * one container format) skip every reject probe; a mixed corpus
    * degrades gracefully to the walk. Micro-bench, 32 threads × 20k
    * WAVs: static dispatch 23.7 s → cached list 13.4 s → memoized
    * 0.51 s (and the stage finally scales with threads). */
  @volatile private var preferredReader: javax.sound.sampled.spi.AudioFileReader = null

  /** `AudioSystem.getAudioInputStream` minus the synchronized registry
    * hit: memoized reader first, then first provider that accepts the
    * stream wins (the static dispatch does exactly this walk). The
    * stream is mark/reset-capable (ByteArrayInputStream), which the SPI
    * reject contract requires — a rejecting reader restores position. */
  private def openAudioStream(in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    val pref = preferredReader
    if (pref != null) {
      try return pref.getAudioInputStream(in)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    var rs = audioReaders
    while (rs.nonEmpty) {
      if (rs.head ne pref) {
        try {
          val ais = rs.head.getAudioInputStream(in)
          preferredReader = rs.head
          return ais
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
      rs = rs.tail
    }
    // All providers rejected. When the provider list is non-empty this
    // IS the terminal answer — the static AudioSystem dispatch walks
    // the same providers through the synchronized JDK13Services
    // registry, so falling back to it for every undecodable payload
    // would re-serialize 31/32 decode threads on a corpus with many
    // bad records (advisor r9). The static path is reserved for the
    // empty-provider-list case (exotic module layering where the
    // platform loader sees no SPI), where it is the only dispatch left.
    if (audioReaders.nonEmpty)
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        s"no provider among ${audioReaders.size} accepted the stream")
    javax.sound.sampled.AudioSystem.getAudioInputStream(in)
  }

  /** REAL audio decode boundary via the JDK's built-in
    * `javax.sound.sampled` (WAV/AIFF/AU parse without external libs):
    * header → format metadata, PCM body → mean amplitude. Undecodable
    * payloads degrade to `decoded = false` zeros, never a task failure. */
  def decodeAudio(it: Iterator[MediaRecord]): Iterator[AudioFeatures] =
    it.map { r =>
      try {
        val ais = openAudioStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val bytes = ais.readAllBytes()
          var s = 0L
          var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
          val mean = if (bytes.isEmpty) 0.0 else s.toDouble / bytes.length
          AudioFeatures(r.doc_id, decoded = true, frames,
            fmt.getSampleRate.toDouble, fmt.getChannels, mean)
        } finally ais.close()
      } catch {
        case scala.util.control.NonFatal(_) =>
          AudioFeatures(r.doc_id, decoded = false, 0L, 0.0, 0, 0.0)
      }
    }

  /** Deterministic synthetic WAV: 8 kHz mono unsigned-8-bit PCM, frame
    * count and constant amplitude closed forms of `doc_id`
    * (n = 100 + id%100, amp = id%256) — mean amplitude after decode is
    * exactly the constant, so the oracle predicts every decoded feature
    * arithmetically, as with [[syntheticPng]]. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = 100 + (docId % 100).toInt
    val amp = (docId % 256).toByte
    val data = Array.fill(n)(amp)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, bos): Unit
      case None => javax.sound.sampled.AudioSystem.write(ais, wave, bos): Unit
    }
    bos.toByteArray
  }

  /** documents → WAV MediaRecords (payload really is a valid WAV). */
  def audioRecords(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        MediaRecord(id, syntheticWav(id), "audio/wav", 0, 0)))
  }

  /** Full audio pipeline: synthetic WAV encode → REAL decode → features. */
  def extractAudioFeatures(spark: SparkSession,
                           documents: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    audioRecords(spark, documents).mapPartitions(decodeAudio)
  }
}
