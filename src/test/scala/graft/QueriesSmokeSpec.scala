package graft

/** Every declared query must run and return rows on sf0.001 (the
  * driver's t1-style smoke, across the whole surface).
  */
class QueriesSmokeSpec extends SparkTestBase {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf0001).count() > 0)
    }
  }
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
