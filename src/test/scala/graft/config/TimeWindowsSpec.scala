package graft.config

import java.time.{Duration, Instant}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TimeWindowsSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-06-15T12:00:00Z")

  test("duration suffixes s/m/h/d/w parse") {
    assert(TimeWindows.parseDuration("90s").contains(Duration.ofSeconds(90)))
    assert(TimeWindows.parseDuration("15m").contains(Duration.ofMinutes(15)))
    assert(TimeWindows.parseDuration("3h").contains(Duration.ofHours(3)))
    assert(TimeWindows.parseDuration("2d").contains(Duration.ofDays(2)))
    assert(TimeWindows.parseDuration("1w").contains(Duration.ofDays(7)))
    assert(TimeWindows.parseDuration("1d12h").contains(Duration.ofHours(36)))
  }

  test("invalid durations rejected") {
    for (bad <- Seq("", "h", "1x", "1.5h", "1h2", "2024-01-01"))
      assert(TimeWindows.parseDuration(bad).isEmpty, s"'$bad'")
  }

  test("absolute layouts parse as UTC") {
    assert(TimeWindows.parseAbsolute("2024-01-02 03:04:05")
      .contains(Instant.parse("2024-01-02T03:04:05Z")))
    assert(TimeWindows.parseAbsolute("2024-01-02T03:04:05")
      .contains(Instant.parse("2024-01-02T03:04:05Z")))
    assert(TimeWindows.parseAbsolute("2024-01-02")
      .contains(Instant.parse("2024-01-02T00:00:00Z")))
    assert(TimeWindows.parseAbsolute("2024-01-02T03:04:05Z")
      .contains(Instant.parse("2024-01-02T03:04:05Z")))
  }

  test("defaults: to=now, from=to-1h (cmd/backup.go:138,152)") {
    assert(TimeWindows.resolve(None, None, now) ==
      Right((now.minus(Duration.ofHours(1)), now)))
  }

  test("to resolves before from: relative from anchors on resolved to") {
    // to = now - 1h; from = to - 2h  (NOT now - 2h)
    assert(TimeWindows.resolve(Some("2h"), Some("1h"), now) ==
      Right((now.minus(Duration.ofHours(3)), now.minus(Duration.ofHours(1)))))
  }

  test("absolute to with relative from") {
    assert(TimeWindows.resolve(Some("1d"), Some("2024-06-10 00:00:00"), now) ==
      Right((Instant.parse("2024-06-09T00:00:00Z"),
             Instant.parse("2024-06-10T00:00:00Z"))))
  }

  test("from >= to rejected (cmd/backup.go:160-168)") {
    assert(TimeWindows.resolve(
      Some("2024-06-10 00:00:00"), Some("2024-06-10 00:00:00"), now).isLeft)
    assert(TimeWindows.resolve(
      Some("2024-06-11 00:00:00"), Some("2024-06-10 00:00:00"), now).isLeft)
  }

  test("unparseable spec is an error, not a default") {
    assert(TimeWindows.resolve(Some("garbage"), None, now).isLeft)
  }

  test("property: rendered durations round-trip") {
    val gen = for {
      n <- Gen.choose(1L, 10000L)
      (u, d) <- Gen.oneOf(
        ("s", Duration.ofSeconds(n)), ("m", Duration.ofMinutes(n)),
        ("h", Duration.ofHours(n)), ("d", Duration.ofDays(n)),
        ("w", Duration.ofDays(7 * n)))
    } yield (s"$n$u", d)
    val cases = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (s, d) =>
      assert(TimeWindows.parseDuration(s).contains(d), s"'$s'")
    }
  }

  test("BackupConfig.fromSpecs wires the resolver") {
    val cfg = BackupConfig.fromSpecs("/in", "/out",
      Some("2024-01-05 00:00:00"), Some("2024-01-25 00:00:00"), now = now)
    assert(cfg.exists(c => c.from.isBefore(c.to)))
    assert(BackupConfig.fromSpecs("/in", "/out",
      Some("1h"), Some("2h"), now = now).isRight)
  }

  test("rows clamp to [1,1000] (cmd/backup.go:213-217)") {
    val base = BackupConfig("/in", "/out",
      from = now.minusSeconds(60), to = now)
    assert(base.copy(maxRowsPerChunk = 5000).clampedRows == 1000)
    assert(base.copy(maxRowsPerChunk = -3).clampedRows == 1)
    assert(base.copy(maxRowsPerChunk = 500).clampedRows == 500)
  }
}
