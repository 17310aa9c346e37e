package graft.tools

import org.apache.spark.sql.SparkSession

/** Quality A/B for the scaled codebook (r16): what does K ∝ N do to
  * SemDeDup's within-cell recall? [[graft.similarity.Ivf.semDedupRecall]]
  * already measures, per cosine band, how many of the TRUE
  * above-threshold pairs the cell partition covers; this runs it twice
  * on the same corpus — fixture K=16 vs scaled K ≈ N/t — and prints
  * both band tables. Smaller cells MUST lose some boundary pairs;
  * the committed number is what lets a pipeline trade dedup speed
  * (linear vs quadratic pair fan-out) against measured miss rate
  * instead of guessing.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.tools.RecallAB"
  */
object RecallAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val t = sys.env.getOrElse("SPARK_GRAFT_IVF_CELL_SIZE_AB", "50")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.disableLocalChecksumSidecars(spark)
    val emb = graft.Tables.embeddings(spark, dir)

    def bands(): Seq[(Int, Long, Long)] =
      graft.similarity.Ivf.semDedupRecall(spark, emb, probeMaxId = 50,
        minCosine = 0.3)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)

    val frozen = bands()
    spark.conf.set(graft.similarity.Ivf.TargetCellSizeKey, t)
    val scaled = bands()
    def fmt(rows: Seq[(Int, Long, Long)]): String =
      rows.map { case (b, n, h) =>
        f""""band_$b":{"n_truth":$n,"n_cell_hits":$h}"""
      }.mkString(",")
    println(s"""{"tool":"RecallAB","sf":"$dir","t":$t,""" +
      s""""frozen_k16":{${fmt(frozen)}},""" +
      s""""scaled":{${fmt(scaled)}}}""")
    spark.stop()
  }
}
