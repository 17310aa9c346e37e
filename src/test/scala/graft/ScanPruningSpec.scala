package graft

import org.apache.spark.sql.functions._

/** Plan-level guards for the scan-efficiency invariants the engine
  * relies on at 100 TB: predicate pushdown into the parquet scan,
  * column pruning in ReadSchema, and partition pruning on a
  * date-partitioned layout. These are regression tests — a refactor
  * that silently reads all columns or scans all partitions would pass
  * result checks while 100×-ing the scan cost. */
class ScanPruningSpec extends SparkTestBase {

  test("filters are pushed to the parquet scan and columns pruned") {
    val df = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:") &&
      scan.contains("GreaterThanOrEqual(l_shipdate"),
      s"time filter not pushed down:\n$scan")
    val readSchema = scan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity") &&
      !readSchema.contains("l_comment"),
      s"column pruning failed: $readSchema")
  }

  test("round-5 operators prune their scans to the columns they read") {
    def readSchema(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema")).mkString("\n")

    // contamination: only doc_id + text reach the documents scan
    val cont = graft.dedup.Dedup.contamination(
      Tables.documents(spark, sf0001))
    val contSchema = readSchema(cont)
    assert(contSchema.contains("doc_id") && contSchema.contains("text") &&
      !contSchema.contains("source") && !contSchema.contains("lang"),
      s"contamination reads more than doc_id/text: $contSchema")

    // embedding outliers: only vec_id + embedding
    val out = graft.similarity.Ivf.outlierScores(
      Tables.embeddings(spark, sf0001))
    val outSchema = readSchema(out)
    assert(outSchema.contains("vec_id") && outSchema.contains("embedding"),
      s"outlierScores schema: $outSchema")

    // banded dup pairs: only vec_id + embedding
    val dup = graft.similarity.Ann.dupPairs(
      Tables.embeddings(spark, sf0001), 0.3)
    val dupSchema = readSchema(dup)
    assert(dupSchema.contains("vec_id") && dupSchema.contains("embedding"),
      s"dupPairs schema: $dupSchema")
  }

  test("date-partitioned layout prunes partitions at the scan") {
    val out = graft.queries.QueryDef.scratchDir("pruning_demo", sf0001)
    Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
      .select(col("event_id"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("isnotnull(day"),
      s"partition filter missing from scan:\n$plan")
    // execute THIS plan instance and read the scan's file-count metric:
    // pruning must reduce the 30 day-partitions to exactly one
    assert(pruned.collect().nonEmpty)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.metrics("numFiles").value == 1,
      s"pruned scan read ${scan.metrics("numFiles").value} files")
  }
}
