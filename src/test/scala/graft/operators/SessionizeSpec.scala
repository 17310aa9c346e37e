package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // user 1: events at 00:00, 00:29, 01:10 (gap 41 min → split),
  //         01:20; user 2: one lone event
  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L),
    (2L, ts("2024-01-01 00:29:00"), 10L),
    (3L, ts("2024-01-01 01:10:00"), 10L),
    (4L, ts("2024-01-01 01:20:00"), 10L),
    (5L, ts("2024-01-01 05:00:00"), 20L)
  ).toDF("event_id", "ts", "user_id")

  test("withSessionIds: dense 1-based ordinals split on gaps > gapSeconds") {
    val got = Sessionize
      .withSessionIds(events, gapSeconds = 1800)
      .select($"event_id", $"session_id").as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("a gap of EXACTLY gapSeconds does not split (strict inequality, " +
    "matching session_window)") {
    val exact = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 00:30:00"), 1L), // exactly 1800s later
      (3L, ts("2024-01-01 01:00:01"), 1L)  // 1801s later → splits
    ).toDF("event_id", "ts", "user_id")
    val got = Sessionize.withSessionIds(exact, gapSeconds = 1800)
      .select($"event_id", $"session_id").as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("equal timestamps order by tieCol and never split") {
    val tied = Seq(
      (2L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:00:00"), 1L)
    ).toDF("event_id", "ts", "user_id")
    val got = Sessionize.withSessionIds(tied)
      .select($"session_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 1L))
  }

  test("sessionStats: start/end/count/whole-second duration per session") {
    val got = Sessionize.sessionStats(events, gapSeconds = 1800)
      .orderBy($"user_id", $"session_id")
      .select($"user_id", $"session_id", $"n_events", $"duration_seconds")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 1L, 2L, 1740L), // 00:00 → 00:29
      (10L, 2L, 2L, 600L),  // 01:10 → 01:20
      (20L, 1L, 1L, 0L)))   // singleton session
  }

  test("sessionCounts equals the q22 shape (n_sessions = max ordinal)") {
    val got = Sessionize.sessionCounts(events, gapSeconds = 1800)
      .orderBy($"user_id")
      .select($"user_id", $"n_sessions", $"n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 2L, 4L), (20L, 1L, 1L)))
  }

  test("the gap flag and ordinal share one Window operator (single sort, " +
    "single exchange per key)") {
    val plan = Sessionize.withSessionIds(events)
      .queryExecution.executedPlan.toString
    val nWindows = "\\bWindow\\b".r.findAllIn(plan).size
    val nSorts = "Sort ".r.findAllIn(plan).size
    assert(nWindows <= 2, s"expected lag+sum to share window stages:\n$plan")
    assert(nSorts <= 1, s"expected one sort for the shared ordering:\n$plan")
  }
}
