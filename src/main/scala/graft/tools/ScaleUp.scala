package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for bench runs beyond the driver-provided
  * fixtures: replicates every fact table `factor`× with per-copy key
  * offsets, preserving referential integrity (a copy's lineitem rows
  * join ONLY that copy's orders/part/supplier rows; region/nation are
  * dims and stay unreplicated).
  *
  * Content transforms keep the SCALING PROFILE honest — a naive
  * replicate-verbatim corpus is pathological for the similarity
  * operators (every doc/vector gains factor−1 EXACT twins, so near-dup
  * pair counts grow ×factor², a quadratic artifact of the generator
  * rather than the plans being measured):
  *  - document text: per-copy letter rotation (`translate` over the 12
  *    most frequent letters) — intra-copy gram relationships and df
  *    profiles are preserved exactly, cross-copy grams are disjoint, so
  *    true near-dup pairs scale ×factor, as a real 10× corpus would.
  *  - embeddings: per-copy dimension permutation (cyclic shift by
  *    11·copy mod 64) — norms and intra-copy cosines are preserved
  *    bit-exactly, cross-copy cosines decorrelate, so dup-pair counts
  *    and cell occupancies scale ×factor.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  * (e.g. /root/testdata/sf0.1 /tmp/graft_sf1 10), then point Bench at
  * dstDir via SPARK_GRAFT_SF_DIR.
  */
object ScaleUp {

  /** Key offset per copy — far above any fixture key (sf0.1 maxima are
    * ~6·10⁵) and large enough that factor·offset stays < 2⁶². */
  val Offset = 100000000L

  private val Letters = "etaoinshrdlu"

  private def rotated(i: Int): String = {
    val k = i % Letters.length
    Letters.substring(k) + Letters.substring(0, k)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val Array(srcDir, dstDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 1000, s"unreasonable factor $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, perCopy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => perCopy(df, i)).reduce(_.unionByName(_))

    def off(i: Int, cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(Offset * i)))

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dstDir/$name.parquet").count()} rows")
    }

    val t = graft.Tables

    // dims: unreplicated (their keys are referenced unchanged)
    write("region", t.region(spark, srcDir))
    write("nation", t.nation(spark, srcDir))

    write("customer", replicate(t.customer(spark, srcDir),
      (d, i) => off(i, "c_custkey")(d)))
    write("supplier", replicate(t.supplier(spark, srcDir),
      (d, i) => off(i, "s_suppkey")(d)))
    // p_name gets the documents treatment: replicate-verbatim gives
    // every name factor−1 exact twins, so q51's duplicate-name cliques
    // grow ×factor and its key-pair output ×factor² — a generator
    // artifact (measured: 29× wall for 10× data at factor 100). The
    // per-copy letter rotation is a bijection, so intra-copy edit
    // distances are preserved EXACTLY while cross-copy names decorrelate
    // — fuzzy-match output scales ×factor, as a real 10× catalog would.
    write("part", replicate(t.part(spark, srcDir), (d, i) =>
      off(i, "p_partkey")(
        if (i == 0) d
        else d.withColumn("p_name", translate(col("p_name"), Letters, rotated(i))))))
    write("orders", replicate(t.orders(spark, srcDir),
      (d, i) => off(i, "o_orderkey", "o_custkey")(d)))
    write("lineitem", replicate(t.lineitem(spark, srcDir),
      (d, i) => off(i, "l_orderkey", "l_partkey", "l_suppkey")(d)))
    write("events", replicate(t.events(spark, srcDir),
      (d, i) => off(i, "event_id", "user_id")(d)))

    write("documents", replicate(t.documents(spark, srcDir), (d, i) =>
      off(i, "doc_id")(
        if (i == 0) d
        else d.withColumn("text", translate(col("text"), Letters, rotated(i))))))

    write("embeddings", replicate(t.embeddings(spark, srcDir), (d, i) =>
      off(i, "vec_id")(
        if (i == 0) d
        else d.withColumn("embedding", expr(
          s"transform(sequence(0, 63), j -> " +
            s"element_at(embedding, CAST((j + ${11 * i}) % 64 AS INT) + 1))")))))

    spark.stop()
  }
}
