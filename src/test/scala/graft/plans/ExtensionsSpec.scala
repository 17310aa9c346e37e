package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-based library registration: a session built with
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions` gets every
  * graft_* function (and the GroupTopK strategy) with NO register()
  * calls — the shared-cluster deployment path. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions injection registers the full graft function surface") {
    // force the shared test session (and its SparkContext) into
    // existence first, then build a FRESH session instance with the
    // extensions applied — `spark.sql.extensions` is a STATIC conf
    // (only read when the SparkContext is created, i.e. spark-submit
    // --conf), so an in-JVM test must use the equivalent public
    // builder hook `withExtensions`, which runs the same class
    val base = graft.SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = try {
      SparkSession.builder()
        .withExtensions(new GraftSparkExtensions())
        .getOrCreate()
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    assert(s ne base, "a new session instance must have been created")
    try {
      SparkSession.setActiveSession(s)
      val cos = s.sql(
        """SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |       graft_json_scalar('{"k": 7}', 'k') AS k,
          |       element_at(graft_hash60_array(array('x'), 0), 1) AS h
          |""".stripMargin).collect().head
      assert(cos.getDouble(0) == 1.0)
      assert(cos.getString(1) == "7")
      assert(cos.getLong(2) > 0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
