package graft.operators

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("leftAsOf picks latest right row <= left time, per key, inclusive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (1L, ts("2024-01-01 09:00:00"), "e0"), // before any right row
      (2L, ts("2024-01-01 12:00:00"), "e3")  // exactly at right time
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-01 12:00:00"), 300L),
      (3L, ts("2024-01-01 00:00:00"), 400L)  // key never on left
    ).toDF("rk", "rt", "payload")

    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt",
      Seq("payload"))
      .select($"tag", $"payload").as[(String, Option[Long])]
      .collect().toMap

    assert(out("e1").contains(100L)) // 09:30 is latest <= 10:00
    assert(out("e2").contains(200L)) // 11:00 latest <= 12:00
    assert(out("e0").isEmpty)        // nothing precedes 09:00
    assert(out("e3").contains(300L)) // inclusive on equality
  }

  test("payload name collision rejected") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "payload")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1L)).toDF("rk", "rt", "payload")
    intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(l, r, "k", "rk", "t", "rt", Seq("payload"))
    }
  }

  test("tolerance rejects stale matches but keeps recent ones " +
    "(boundary inclusive)") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"), // 30 min after right
      (1L, ts("2024-01-01 12:00:00"), "edge"),  // exactly tolerance after
      (1L, ts("2024-01-01 12:00:01"), "stale")  // 1s past tolerance
    ).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), 100L))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt",
      Seq("payload"), toleranceSeconds = Some(9000L)) // 2.5 h
      .select($"tag", $"payload").as[(String, Option[Long])]
      .collect().toMap
    assert(out("fresh").contains(100L))
    assert(out("edge").contains(100L))  // <= is inclusive
    assert(out("stale").isEmpty)        // matched then rejected
  }
}
