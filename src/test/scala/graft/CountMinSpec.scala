package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** count_min_sketch — the fixed-size frequency summary for "how often
  * does key k appear" over a stream/corpus too big to hold exact
  * counts: width ∝ 1/ε, depth ∝ ln(1/δ), merges cell-wise, and
  * estimates only ever OVERcount (hash collisions add, never
  * subtract). Completes the sketch family next to HLL (q15), GK
  * percentiles (q59), MinHash/SimHash (x03-x05) and the bloom join
  * filter. The spec pins the formal contract: estimate ≥ true count,
  * and estimate ≤ true + ε·N for every key on the fixture.
  */
class CountMinSpec extends SparkTestBase {

  test("count-min point estimates obey the one-sided eps*N error bound") {
    val eps = 0.001
    val conf = 0.99
    val li = Tables.lineitem(spark, sf0001)

    val bytes = li
      .agg(count_min_sketch(col("l_suppkey"), lit(eps), lit(conf), lit(42))
        .as("sk"))
      .head.getAs[Array[Byte]](0)
    val sketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

    val truth = li.groupBy(col("l_suppkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = truth.map(_._2).sum
    assert(sketch.totalCount() == n)

    for ((k, exact) <- truth) {
      val est = sketch.estimateCount(k)
      assert(est >= exact, s"undercount for $k: $est < $exact")
      assert(est <= exact + (eps * n).ceil.toLong,
        s"overcount beyond eps*N for $k: $est vs $exact + ${(eps * n).ceil}")
    }
  }
}
