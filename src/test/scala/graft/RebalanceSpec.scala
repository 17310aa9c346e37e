package graft

import org.apache.spark.sql.functions._

/** REBALANCE — the AQE output-layout operator for writes: unlike
  * `repartition(n)` (fixed n: too few → huge files, too many → small
  * files as data grows) a rebalance lets AQE split/coalesce to the
  * target advisory size at RUN time, which is what keeps output file
  * sizes stable across a 100× growth in input without retuning. The
  * spec pins (1) the plan carries the AQE rebalance node, (2) rows
  * survive exactly, (3) the skewed key's rows get SPLIT across
  * multiple output partitions — the thing repartition-by-column can
  * never do, and the reason rebalance is the write-path default.
  *
  * Two traps this spec had to dodge, kept for the record: an upstream
  * `repartition(n)` is COLLAPSED into the adjacent rebalance exchange
  * (AQE splits a skewed reducer by map-output ranges, so a single map
  * task can never be split — the input must be multi-file), and
  * selecting nothing but `spark_partition_id()` lets column pruning
  * shrink the shuffle below any advisory size.
  */
class RebalanceSpec extends SparkTestBase {

  test("rebalance splits a skewed key across partitions at run time") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_rebalance")
    val in = scratch.resolve("in").toString
    try {
      // multi-file input → multiple map outputs for the skew split
      Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
        .repartition(8)
        .write.mode("overwrite").parquet(in)

      val skewed = spark.read.parquet(in)
        .withColumn("hot", lit("the-one-key"))
      val n = skewed.count()

      val prev =
        spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      // small advisory size so AQE must split the hot partition even
      // at fixture scale (the default 64 MB would fit it in one)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      try {
        val rebalanced = skewed
          .hint("rebalance", col("hot"))
          .withColumn("pid", spark_partition_id())
        assert(rebalanced.queryExecution.analyzed.toString.toLowerCase
          .contains("rebalancepartitions"), "no rebalance node in plan")

        // keep payload columns in the aggregate so pruning can't empty
        // the shuffled rows
        val byPartition = rebalanced.groupBy(col("pid"))
          .agg(count(lit(1)).as("rows"),
            sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))
          .collect()
        assert(byPartition.map(_.getLong(1)).sum == n)
        assert(byPartition.length > 1,
          s"skewed key not split: ${byPartition.mkString(", ")}")
      } finally {
        prev match {
          case Some(v) => spark.conf
            .set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
          case None => spark.conf
            .unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(scratch.toFile)
    }
  }
}
