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

  test("round-6 queries prune their scans to the columns they read") {
    def readSchema(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema")).mkString("\n")

    // window navigation (1.5M output rows at sf1): the orders scan
    // must carry only the 4 columns the windows touch
    val nav = graft.SparkEntry.queries("q47_window_nav")(spark, sf0001)
    val navSchema = readSchema(nav)
    assert(navSchema.contains("o_custkey") && navSchema.contains("o_totalprice")
      && !navSchema.contains("o_orderstatus"),
      s"q47 reads more than its window columns: $navSchema")

    // datetime family: event_id + ts only
    val dt = graft.SparkEntry.queries("q57_datetime_funcs")(spark, sf0001)
    val dtSchema = readSchema(dt)
    assert(dtSchema.contains("event_id") && !dtSchema.contains("props") &&
      !dtSchema.contains("user_id"),
      s"q57 reads more than event_id/ts: $dtSchema")

    // gap-fill: event_type/ts/value, never props
    val gf = graft.SparkEntry.queries("q43_gapfill")(spark, sf0001)
    val gfSchema = readSchema(gf)
    assert(gfSchema.contains("event_type") && !gfSchema.contains("props"),
      s"q43 reads more than type/ts/value: $gfSchema")

    // snapshot AS-OF read: projection pushes through the version filter
    val snapRoot = graft.queries.QueryDef.scratchDir("pruning_snap", sf0001)
    graft.operators.Snapshots.write(
      Tables.orders(spark, sf0001), snapRoot, 1)
    val asOf = graft.operators.Snapshots.readAsOf(spark, snapRoot, 1)
      .select(col("o_orderkey"))
    val snapSchema = readSchema(asOf)
    assert(snapSchema.contains("o_orderkey") &&
      !snapSchema.contains("o_totalprice"),
      s"snapshot read does not prune columns: $snapSchema")

    // null-semantics family: customer scans carry only custkey +
    // nationkey (never name/acctbal), supplier only suppkey + nationkey
    val ns = graft.SparkEntry.queries("q66_null_semantics")(spark, sf0001)
    val nsSchema = readSchema(ns)
    assert(nsSchema.contains("c_custkey") && nsSchema.contains("c_nationkey")
      && !nsSchema.contains("c_acctbal") && !nsSchema.contains("c_name") &&
      !nsSchema.contains("s_name"),
      s"q66 reads more than the null-key columns: $nsSchema")
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
