package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the PQ batch-path JOIN SHAPES at serving-batch scale (r14
  * verdict #2): the broadcast arms vs the above-budget escapes, on a
  * SYNTHESIZED ≥10⁵-probe batch (the fixture's own ids replicated with
  * an offset — probe_id never collides with a corpus vec_id).
  *
  *  - plain batch ADC: broadcast+fused vs bucketed all-pairs equi-join
  *    (manufactured pmod bucket, probes replicated ×B) at the full
  *    synthetic batch — both arms runnable, rankings pinned equal by
  *    PqSpec, counts required equal here.
  *  - batch IVF-ADC: the probe rows carry 2 KiB ADC tables, so the
  *    broadcast arm is measured at the largest SAFE size (exploded
  *    rows × 2 KiB ≈ 130 MB) and the shuffle arm at that size AND at
  *    the full batch — where the broadcast would be ~1 GB of driver
  *    fan-out, which is exactly why the escape exists.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt "runMain graft.tools.PqJoinScale"
  */
object PqJoinScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // session-default plan tier, like Verify/Bench: without it the
      // per-probe top-10 runs as a FULL window sort of the pair stream
      .withExtensions(new graft.plans.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.disableLocalChecksumSidecars(spark)
    graft.functions.VectorFunctions.register(spark)

    val emb = graft.Tables.embeddings(spark, dir)

    // corpus: bounded head so the all-pairs arm stays measurable
    // locally; probes: seed vectors replicated with offset ids
    val corpusMax = sys.env.getOrElse("SPARK_GRAFT_PQ_CORPUS", "5000").toLong
    val seedMax = 2000L
    val reps = sys.env.getOrElse("SPARK_GRAFT_PQ_REPS", "65").toInt
    val corpus = emb.filter(col("vec_id") < corpusMax)
      .select(col("vec_id"), col("embedding")).cache()
    val nCorpus = corpus.count()
    def probes(n: Long): DataFrame = {
      val r = math.ceil(n.toDouble / seedMax).toInt
      emb.filter(col("vec_id") < seedMax)
        .select(col("vec_id"), col("embedding"))
        .withColumn("rep", explode(expr(s"sequence(0, ${r - 1})")))
        .select((col("vec_id") + col("rep") * seedMax +
          lit(1000000000L)).as("probe_id"), col("embedding"))
        .filter(col("probe_id") < lit(1000000000L) + n)
    }
    val nProbes = seedMax * reps

    def best(n: Int)(body: => Long): (Double, Long) = {
      var b = Double.MaxValue
      var last = 0L
      (1 to n).foreach { _ =>
        val t0 = System.nanoTime()
        last = body
        b = math.min(b, (System.nanoTime() - t0) / 1e9)
      }
      (b, last)
    }

    def run(budget: String, n: Long, ivf: Boolean): (Double, Long) = {
      spark.conf.set(graft.similarity.Pq.BroadcastBudgetKey, budget)
      try best(3) {
        val p = probes(n).withColumnRenamed("embedding",
          if (ivf) "embedding" else "q_emb")
        val df =
          if (ivf) graft.similarity.Pq.batchIvfAdcTopKForProbes(
            spark, corpus, p, n, 10)
          else graft.similarity.Pq.batchAdcTopKForProbes(
            spark, corpus, p, n, 10)
        df.count()
      } finally spark.conf.unset(graft.similarity.Pq.BroadcastBudgetKey)
    }

    // plain batch ADC: both arms at the full synthetic batch
    val (adcBcS, adcBcN) = run((1L << 40).toString, nProbes, ivf = false)
    val (adcShS, adcShN) = run("1", nProbes, ivf = false)
    require(adcBcN == adcShN,
      s"plain-ADC arms disagree: $adcBcN vs $adcShN")

    // IVF-ADC: broadcast at the largest safe size; shuffle there + full
    val safe = 16000L
    val (ivfBcS, ivfBcN) = run((1L << 40).toString, safe, ivf = true)
    val (ivfShS, ivfShN) = run("1", safe, ivf = true)
    require(ivfBcN == ivfShN,
      s"IVF-ADC arms disagree at $safe probes: $ivfBcN vs $ivfShN")
    val (ivfFullS, ivfFullN) = run("1", nProbes, ivf = true)

    import graft.Bench.f3
    println(s"""{"tool":"pqjoinscale","sf":"$dir","n_corpus":$nCorpus,"n_probes":$nProbes,"adc_broadcast_s":${f3(adcBcS)},"adc_bucketed_s":${f3(adcShS)},"adc_rows":$adcBcN,"ivf_safe_probes":$safe,"ivf_broadcast_s":${f3(ivfBcS)},"ivf_shuffle_s":${f3(ivfShS)},"ivf_safe_rows":$ivfBcN,"ivf_full_shuffle_s":${f3(ivfFullS)},"ivf_full_rows":$ivfFullN}""")
    corpus.unpersist(): Unit
    spark.stop()
  }
}
