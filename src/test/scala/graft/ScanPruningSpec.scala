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
