package graft

import graft.queries.TpchQueries
import org.apache.spark.sql.functions._

/** q41 computes corr/covar/stddev/var from exact decimal power sums
  * (closed forms) for engine-identical results; this spec pins that
  * Spark's NATIVE statistical aggregates agree with those closed forms
  * — covering the built-in surface while the oracle covers exactness.
  */
class StatsAggSpec extends SparkTestBase {

  test("native corr/covar_samp/stddev_samp/var_samp match the closed forms") {
    val closed = TpchQueries.defs("q41_stats_agg").fn(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val native = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sd"),
        var_samp(col("l_extendedprice")).as("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(closed.keySet == native.keySet && closed.nonEmpty)
    closed.foreach { case (k, (c, cv, sd, v)) =>
      val (nc, ncv, nsd, nv) = native(k)
      assert(math.abs(c - nc) < 1e-6, s"corr($k): $c vs $nc")
      assert(math.abs(cv - ncv) / math.max(1.0, math.abs(cv)) < 1e-6,
        s"covar($k): $cv vs $ncv")
      assert(math.abs(sd - nsd) < 1e-6, s"stddev($k): $sd vs $nsd")
      assert(math.abs(v - nv) / math.max(1.0, math.abs(v)) < 1e-6,
        s"var($k): $v vs $nv")
    }
  }
}
