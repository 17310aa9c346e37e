package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — the [EXT]
  * training-data-pipeline surface (SURVEY.md §7.3 step 7): exact
  * hash-dedup, MinHash+LSH banding, SimHash, and n-gram Jaccard with
  * rare-gram candidate blocking. All hashing is md5-derived so a DuckDB
  * oracle can reproduce every number bit-for-bit.
  *
  * Scale notes (the point of each design):
  *  - every candidate-generation step is a *bucket join* (shuffle on a
  *    band/gram key), never an O(n²) cross join;
  *  - signatures are computed per-row inside whole-stage codegen
  *    (higher-order functions, no UDFs);
  *  - rare-gram blocking caps the inverted-index fan-out so the
  *    candidate pair count stays near-linear in corpus size.
  */
object Dedup {

  /** MinHash: H hash functions, banded B×R (H = B*R). Candidate-pair
    * jaccard threshold ≈ (1/B)^(1/R) = 0.5. */
  val MinHashH = 8
  val Bands = 4
  val RowsPerBand = 2

  /** SimHash width: 48 bits keeps every intermediate in signed int64
    * range in both engines (1L<<63 would overflow DuckDB's BIGINT). */
  val SimBits = 48
  val SimSeed = 99

  /** Shingle size (words) for MinHash and Jaccard. */
  val ShingleK = 3

  /** Portable 60-bit hash: first 15 hex chars of md5("<seed>|" + s).
    * Identical in Spark (`conv(...,16,10)`) and DuckDB
    * (`('0x'||substr(md5(...),1,15))::BIGINT`).
    */
  def hash60Sql(inner: String, seed: Int): String =
    s"CAST(conv(substring(md5(concat('$seed|', $inner)), 1, 15), 16, 10) AS BIGINT)"

  /** Distinct word-k-gram shingles of a text column (SQL expr). */
  def shinglesSql(textCol: String): String = {
    val k = ShingleK
    s"""array_distinct(transform(
       |  sequence(1, greatest(size(split($textCol, ' ')) - ${k - 1}, 1)),
       |  i -> concat_ws(' ', slice(split($textCol, ' '), i, $k))))""".stripMargin
  }

  /** Spread rows across cores before CPU-heavy per-row hashing: the
    * fixture tables arrive as one small parquet file → one input
    * partition, which would serialize the whole signature computation
    * on a single core. The tiny shuffle is dwarfed by the hash work.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** doc_id + distinct shingles. */
  def withShingles(docs: DataFrame, textCol: String = "text"): DataFrame =
    spread(docs).withColumn("gs", expr(shinglesSql(textCol)))

  /** MinHash signature: for each seed, the min portable hash over the
    * shingle set. Appends `sig` (array of MinHashH longs). */
  def withMinhashSig(withGs: DataFrame): DataFrame = {
    val sigCols = (0 until MinHashH).map { i =>
      expr(s"array_min(transform(gs, g -> ${hash60Sql("g", i)}))")
    }
    withGs.withColumn("sig", array(sigCols: _*))
  }

  /** LSH band buckets: md5 of each band's R signature values.
    * One row per (doc, band). */
  def bandBuckets(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sigd = withMinhashSig(withShingles(docs, textCol))
    val buckets = (0 until Bands).map { b =>
      md5(concat_ws(",",
        (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*))
    }
    sigd.select(col("doc_id"),
      posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
  }

  /** Near-duplicate candidate pairs: docs sharing any LSH band bucket.
    * Bucket self-join — shuffle on (band, bucket), linear in bucket
    * occupancy, never all-pairs. */
  def lshCandidatePairs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bands = bandBuckets(docs, textCol)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash over distinct shingles: bit j of the fingerprint is the
    * sign of sum(+1/-1) of bit j across shingle hashes. Shingles, not
    * words: this corpus's distinct-word sets saturate (small vocab), so
    * word-level SimHash would collapse into huge identical-fingerprint
    * groups and the pair join would go quadratic; 3-gram sets stay
    * discriminative. Pure integer arithmetic (div/mod by exact powers
    * of two) so both engines agree bit-for-bit.
    *
    * Shape matters: the md5 hash array is the aggregate's *input* (one
    * evaluation per row), and ONE fold over it maintains all 48 bit
    * counters via zip_with. Putting the hash transform inside a
    * per-bit lambda instead re-evaluates split+md5 48× per row — two
    * orders of magnitude slower (measured: minutes vs seconds at
    * sf0.01).
    */
  def simhashSql(textCol: String): String = {
    val h = hash60Sql("g", SimSeed)
    val bits = SimBits
    s"""aggregate(
       |  zip_with(
       |    aggregate(
       |      transform(${shinglesSql(textCol)}, g -> $h),
       |      array_repeat(0, $bits),
       |      (acc, hv) -> zip_with(acc, sequence(0, ${bits - 1}),
       |        (a, j) -> a + (CASE WHEN (hv div CAST(power(2, j) AS BIGINT)) % 2 = 1
       |                       THEN 1 ELSE -1 END))),
       |    sequence(0, ${bits - 1}),
       |    (cnt, j) -> CASE WHEN cnt > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0L END),
       |  0L, (acc, v) -> acc + v)""".stripMargin
  }

  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    spread(docs).withColumn("simhash", expr(simhashSql(textCol)))

  /** SimHash near-dup pairs: band the 48 bits into 4×12-bit chunks
    * (any pair within hamming distance 4 shares ≥1 exact chunk by
    * pigeonhole… within distance 3 guaranteed, 4+ probabilistic), then
    * verify with exact popcount on the XOR. Chunk-bucket join, no
    * all-pairs. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   textCol: String = "text"): DataFrame = {
    val sims = withSimhash(docs, textCol).select(col("doc_id"), col("simhash"))
    val chunks = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        expr(s"(simhash div CAST(power(2, ${c * 12}) AS BIGINT)) % 4096")): _*))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard near-dup pairs with rare-gram candidate
    * blocking: only grams with document frequency in [2, maxDf] generate
    * candidates (caps inverted-index fan-out — the PPJoin-style prefix
    * idea), then the exact |A∩B| is recomputed over ALL grams of the
    * candidate pairs, so the reported jaccard is exact.
    */
  def ngramJaccardPairs(docs: DataFrame, maxDf: Int, threshold: Double,
                        textCol: String = "text"): DataFrame = {
    val g = withShingles(docs, textCol)
      .select(col("doc_id"), col("gs"))
    val exploded = g.select(col("doc_id"), explode(col("gs")).as("gram"))
    val sizes = g.select(col("doc_id"), size(col("gs")).as("n_grams"))

    val rareGrams = exploded.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("gram"))
    val rare = exploded.join(rareGrams, Seq("gram"))

    val cand = rare.as("a").join(rare.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val inter = cand
      .join(exploded.as("ga"), col("ga.doc_id") === col("doc_a"))
      .join(exploded.as("gb"),
        col("gb.doc_id") === col("doc_b") && col("ga.gram") === col("gb.gram"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))

    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_grams", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_grams", "n_b"), Seq("doc_b"))
      .withColumn("jaccard", round(
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
