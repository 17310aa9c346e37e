package graft

import org.apache.spark.sql.types._

/** Pins the CANONICAL POST-LOAD fixture contract. The driver
  * regenerates /root/testdata between rounds with whatever parquet
  * writer it likes; r7's regeneration silently flipped events.ts from
  * TIMESTAMP(NANOS) to un-adjusted timestamp[us] (TIMESTAMP_NTZ under
  * Spark 4) and 11 queries + 19 tests failed at analysis time with no
  * test naming the actual cause. This spec is that name: if a future
  * regeneration changes an encoding [[Tables.loadPath]] doesn't
  * normalize, ONE test here fails and says which table and column.
  *
  * The contract is deliberately about the POST-load frame (what every
  * operator consumes), not the on-disk encoding (which is allowed to
  * vary): loadPath must absorb the variation.
  */
class FixturesSpec extends SparkTestBase {

  private val dir = sf0001

  private def loaded(name: String) = Tables.load(spark, dir, name)

  private def assertCols(table: String, want: (String, DataType)*): Unit = {
    val got = loaded(table).schema.map(f => f.name -> f.dataType).toMap
    want.foreach { case (c, t) =>
      assert(got.contains(c), s"$table: column $c missing (have ${got.keys})")
      assert(got(c) == t, s"$table.$c: expected $t, got ${got(c)}")
    }
  }

  test("no loaded table exposes TIMESTAMP_NTZ (watermarks/unix_micros " +
    "reject it at analysis time)") {
    Tables.all.foreach { t =>
      val ntz = loaded(t).schema.fields.filter(_.dataType == TimestampNTZType)
      assert(ntz.isEmpty,
        s"$t: NTZ columns ${ntz.map(_.name).mkString(",")} — loadPath must " +
          "cast these to TimestampType")
    }
  }

  test("events: canonical analytic schema (ts is session-zoned TIMESTAMP)") {
    assertCols("events",
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
  }

  test("orders/lineitem: keys, measures and time columns keep their widths") {
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType)
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType)
  }

  test("dimension tables: join-key types are stable") {
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    assertCols("customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
    assertCols("part",
      "p_partkey" -> LongType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  }

  test("documents/embeddings: LLM-pipeline input contract") {
    assertCols("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    assertCols("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }

  test("every fixture table loads and is non-empty at the test SF") {
    Tables.all.foreach { t =>
      assert(loaded(t).limit(1).count() == 1L, s"$t: empty or unreadable")
    }
  }
}
