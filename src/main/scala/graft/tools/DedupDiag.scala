package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the n-gram Jaccard verify's intermediate masses at a
  * given fixture dir — the numbers the count-based-verify cost model
  * rests on (expansion rows = Σ_h C(df_h, 2) over the df-window, vs
  * candidate pairs, vs postings). Usage:
  * runMain graft.tools.DedupDiag <sfDir> [maxDf] [threshold]
  */
object DedupDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxDf = if (args.length > 1) args(1).toInt else 10
    val threshold = if (args.length > 2) args(2).toDouble else 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
    val g = graft.dedup.Dedup.withShingles(docs)
      .select(col("doc_id"), size(col("gs")).as("n_gs"),
        explode(expr("graft_hash60_array(gs, 0)")).as("h"))
    g.persist()
    val nPost = g.count()
    val df = g.groupBy(col("h")).agg(count(lit(1)).as("df"))
    df.persist()
    val stats = df.agg(
      count(lit(1)).as("n_grams"),
      sum(when(col("df") >= 2, lit(1)).otherwise(lit(0))).as("df2_grams"),
      max(col("df")).as("max_df"),
      // expansion mass of the count-based verify: all-window pairs
      sum(when(col("df").between(2, maxDf),
        col("df") * (col("df") - 1) / 2).otherwise(lit(0)))
        .as("expansion_pairs_window"),
      // what a prefix-only expansion would emit is bounded above by
      // this (prefix postings are a subset of window postings)
      sum(when(col("df") > maxDf, lit(1)).otherwise(lit(0)))
        .as("high_df_grams"),
      sum(when(col("df").between(2, maxDf), col("df")).otherwise(lit(0)))
        .as("window_postings")).collect()(0)
    println(s"== DIAG $sfDir maxDf=$maxDf t=$threshold ==")
    println(s"postings_total=$nPost")
    println(stats.schema.fieldNames.zip(stats.toSeq)
      .map { case (k, v) => s"$k=$v" }.mkString("\n"))

    if (!sys.env.contains("GRAFT_DIAG_STATS_ONLY")) {
      // measured wall of the full operator, narrow mode
      val t0 = System.nanoTime()
      val n = graft.dedup.Dedup
        .ngramJaccardPairs(docs, maxDf = maxDf, threshold = threshold).count()
      println(f"pairs_out=$n wall=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
