package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits like the Morton reference") {
    // a=3 (011), b=5 (101), 4 bits:
    // a bits -> positions 0,2 : 1 + 4 ; b bits -> positions 1,5 : 2 + 32
    val got = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 4).as("z")).as[Long].collect().head
    assert(got == 39L)
    // zero and max-4-bit corners
    val corners = Seq((0L, 0L), (15L, 0L), (0L, 15L), (15L, 15L))
      .toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 4).as("z")).as[Long].collect()
    assert(corners.toSeq == Seq(0L, 0x55L, 0xAAL, 0xFFL))
  }

  test("zValue matches the oracle-SQL arithmetic on real data") {
    val viaColumn = Tables.lineitem(spark, sf0001)
      .select(ZOrder.zValue($"l_partkey" % 256, $"l_suppkey" % 256, 8).as("z"))
      .as[Long].collect().sorted
    val viaSql = Tables.lineitem(spark, sf0001)
      .selectExpr(
        // the DuckDB oracle string is valid Spark SQL too (// -> div)
        ZOrder.zValueSql("l_partkey % 256", "l_suppkey % 256", 8)
          .replace("//", "div") + " AS z")
      .as[Long].collect().sorted
    assert(viaColumn.sameElements(viaSql))
  }

  test("z-clustered layout prunes a box predicate; unsorted does not") {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val src = Tables.lineitem(spark, sf0001)
      .select(($"l_partkey" % 256).cast("long").as("a"),
        ($"l_suppkey" % 256).cast("long").as("b"),
        $"l_extendedprice".as("v"))

    // same row set, same file count — only the LAYOUT differs
    ZOrder.clusterByZ(src, "a", "b", files = 16, bits = 8)
      .write.mode("overwrite").parquet(s"$scratch/zorder")
    src.repartition(16).write.mode("overwrite").parquet(s"$scratch/shuffled")

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter($"a".between(0, 31) && $"b".between(0, 31))
      df.collect()
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      assert(scans.nonEmpty, plan.toString)
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val zRows = scannedRows(s"$scratch/zorder")
    val shuffledRows = scannedRows(s"$scratch/shuffled")
    // the box covers 1/64 of the key square: the z layout must let the
    // parquet reader skip most row groups; the shuffled layout cannot
    // (every file spans the full (a, b) range)
    assert(zRows < shuffledRows / 2,
      s"z-layout scanned $zRows rows vs shuffled $shuffledRows — no pruning benefit")
  }
}
