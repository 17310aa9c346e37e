package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the PQ batch-ADC kernels at serving-batch scale (r13 verdict
  * #4): the same batchAdcTopK plan with the FUSED per-pair kernel
  * (M×SubDim multiply-adds, recomputing the query's subspace distances
  * for every corpus row) vs the TABLE-precompute variant (each probe
  * carries its M×Ks lookup table through the broadcast; per pair = M
  * integer reads). Bit-identical rankings (PqSpec pins it); this main
  * measures the throughput gap on a 10³-probe batch so the
  * auto-selection threshold is justified by a row, not an argument.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt "runMain graft.tools.PqScale"
  */
object PqScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val probes = sys.env.getOrElse("SPARK_GRAFT_PQ_PROBES", "1000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      // session-default plan tier, like Verify/Bench: without it the
      // per-probe top-10 runs as a FULL window sort of the pair stream
      // (2·10⁸ rows here) and buries the ADC kernel difference this
      // A/B measures — the exact fresh-session trap the r13 verdict
      // flagged, observed live while building this tool (1.05x
      // "speedup" under the sort, the real kernel gap under the heap)
      .withExtensions(new graft.plans.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.disableLocalChecksumSidecars(spark)

    val emb = graft.Tables.embeddings(spark, dir)
    val nCorpus = emb.count()

    // A/B against the PERSISTED code index — the production serving
    // shape (x56): encode is a once-per-corpus batch pass, so it must
    // not sit inside the measured loop (it dominates and hides the
    // per-pair kernel difference this A/B exists to expose)
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val scratch = java.nio.file.Files.createTempDirectory("graft_pqscale")
    try {
      val idxPath = scratch.resolve("idx").toString
      graft.similarity.Pq.writeIndex(emb, idxPath)
      val index = spark.read.parquet(idxPath)

      // both variants through the expression forms (env is fixed at
      // JVM start, so the A/B can't flip SPARK_GRAFT_PQ_TABLE here)
      def run(table: Boolean): Double = {
        val probes0 = emb.filter(col("vec_id") < probes)
          .select(col("vec_id").as("probe_id"), col("embedding").as("q_emb"))
        val (p, adc) =
          if (table)
            (probes0.select(col("probe_id"),
              expr("graft_pq_adc_table(q_emb)").as("adc_tab")),
              "graft_pq_adc_lookup(codes, adc_tab)")
          else (probes0, "graft_pq_adc(codes, q_emb)")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("adc_micro"), col("nn_id"))
        val df = index
          .crossJoin(broadcast(p))
          .filter(col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id").as("nn_id"),
            expr(adc).as("adc_micro"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
        var best = Double.MaxValue
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          df.count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        best
      }
      val fusedS = run(table = false)
      val tableS = run(table = true)
      // floats via Bench.f3 (Locale.ROOT): the f-interpolator honours the
      // default locale, and a comma-decimal locale would emit invalid JSON
      import graft.Bench.f3
      println(s"""{"tool":"pqscale","sf":"$dir","n_corpus":$nCorpus,"n_probes":$probes,"fused_s":${f3(fusedS)},"table_s":${f3(tableS)},"speedup":${f3(fusedS / tableS)}}""")
    } finally {
      graft.util.Fs.deleteRecursively(scratch)
      spark.stop()
    }
  }
}
