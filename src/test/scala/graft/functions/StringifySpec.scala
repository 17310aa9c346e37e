package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Faithful-stringify parity with the reference's recursive decode
  * (`helpers/helpers.go:5-63`): every scalar leaf a string, NULL →
  * "NULL", recursion through ROW/ARRAY/TIMESERIES(map), nulls at every
  * leaf, empty composites, depth-3 mutual nesting (FIXTURES.md).
  */
class StringifySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("time", TimestampType),
    StructField("scalar_s", StringType),
    StructField("scalar_n", DoubleType),
    StructField("arr", ArrayType(StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))),
    StructField("row", StructType(Seq(
      StructField("a", StringType),
      StructField("b", ArrayType(IntegerType))))),
    StructField("tseries", MapType(StringType, DoubleType))
  ))

  private def run(rows: Seq[Row]): Seq[Row] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    df.select(Stringify.columns(schema): _*).collect().toSeq
  }

  test("scalar leaves stringify; NULL becomes the sentinel string") {
    val ts = java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
    val out = run(Seq(Row(ts, "x", 1.5, null, null, null),
                      Row(null, null, null, null, null, null)))
    assert(out(0).getString(0) == "2024-01-02 03:04:05")
    assert(out(0).getString(1) == "x")
    assert(out(0).getString(2) == "1.5")
    assert(out(1).getString(0) == "NULL")
    assert(out(1).getString(1) == "NULL")
    assert(out(1).getString(2) == "NULL")
  }

  test("ARRAY<ROW> recurses; null leaves inside elements stringify") {
    val out = run(Seq(Row(null, null, null,
      Seq(Row("a", 7L), Row(null, null)), null, null)))
    val arr = out(0).getSeq[Row](3)
    assert(arr(0) == Row("a", "7"))
    assert(arr(1) == Row("NULL", "NULL"))
  }

  test("ROW containing ARRAY recurses; empty array survives") {
    val out = run(Seq(
      Row(null, null, null, null, Row("s", Seq(1, 2)), null),
      Row(null, null, null, null, Row(null, Seq.empty[Int]), null)))
    assert(out(0).getStruct(4) == Row("s", Seq("1", "2")))
    assert(out(1).getStruct(4).getString(0) == "NULL")
    assert(out(1).getStruct(4).getSeq[String](1).isEmpty)
  }

  test("TIMESERIES map: values stringify, keys preserved") {
    val out = run(Seq(Row(null, null, null, null, null,
      Map("2024-01-01 00:00:00" -> 1.25, "2024-01-01 00:01:00" -> null))))
    val m = out(0).getMap[String, String](5)
    assert(m("2024-01-01 00:00:00") == "1.25")
    assert(m("2024-01-01 00:01:00") == "NULL")
  }

  test("composite null stays null (reference checks NullValue only at leaves)") {
    val out = run(Seq(Row(null, null, null, null, null, null)))
    assert(out(0).isNullAt(3) && out(0).isNullAt(4) && out(0).isNullAt(5))
  }
}
