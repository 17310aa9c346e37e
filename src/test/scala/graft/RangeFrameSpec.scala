package graft

import graft.queries.TpchQueries

/** Pins q36's timezone invariant (round-5 advice): the 7-day RANGE frame
  * is built on unix_timestamp over a TimestampType column — the internal
  * epoch value, with no session-zone parse — so the result is identical
  * under a DST-transitioning session zone and under UTC. If the frame
  * were ever rewritten over a localized value (e.g. a DATE cast), this
  * test catches the boundary-row drift the advisor described.
  */
class RangeFrameSpec extends SparkTestBase {

  private def runQ36(): Set[(Long, Long, Double)] =
    TpchQueries.defs("q36_range_frame").fn(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("q36 range frame is identical under UTC and a DST session zone") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    val utc = runQ36()
    assert(utc.nonEmpty)
    try {
      // America/New_York has two DST transitions a year; a localized
      // 7-calendar-day frame would be 7d±1h in epoch seconds there
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val dst = runQ36()
      assert(dst == utc)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
