package graft

import org.apache.spark.sql.functions._

/** Dataset.observe — accumulator-backed metrics collected DURING a job
  * (row counts, null counts, sums riding the existing pass), the way a
  * 100 TB pipeline self-audits without paying a second scan. The spec
  * pins that observed metrics equal a separately-computed aggregate.
  */
class ObserveSpec extends SparkTestBase {

  test("observed metrics match a recomputed aggregate without a second scan") {
    val li = Tables.lineitem(spark, sf0001)
      .observe("audit",
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"),
        count_if(col("l_returnflag") === "A").as("n_flag_a"))
      .filter(col("l_quantity") > 0) // downstream work rides the same scan

    // one action drives the pass; write() and count() each spawn their
    // OWN QueryExecution (metrics then land on the listener bus) —
    // collect() is the action that runs the dataset's own execution
    assert(li.collect().nonEmpty)

    val observed = li.queryExecution.observedMetrics("audit")
    val expected = Tables.lineitem(spark, sf0001)
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(12,2)")),
        count_if(col("l_returnflag") === "A"))
      .head

    assert(observed.getLong(0) == expected.getLong(0))
    assert(observed.getDecimal(1) == expected.getDecimal(1))
    assert(observed.getLong(2) == expected.getLong(2))
    assert(observed.getLong(0) > 0)
  }
}
