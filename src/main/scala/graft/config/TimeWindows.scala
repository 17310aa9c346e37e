package graft.config

import java.time.{Duration, Instant}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import java.time.ZoneOffset

/** Time-window resolution for backup jobs.
  *
  * Re-expresses the reference's config-time semantics (Spark never sees
  * this — it runs driver-side before a plan exists):
  *   - relative durations with `s/m/h/d/w` suffixes
  *     (reference: `cmd/backup.go:128-157` via xhit/go-str2duration — Go's
  *     stdlib lacks `d`/`w`, hence the extra dep there; plain Scala here),
  *   - absolute timestamps in several layouts
  *     (reference: `cmd/backup.go:130,144` via jinzhu/now multi-layout parse),
  *   - anchoring: `to` resolves BEFORE `from` because `from`'s fallbacks
  *     anchor on `to` (`to = now - dur`, `from = to - dur`; defaults
  *     `to = now`, `from = to - 1h`; reference: `cmd/backup.go:138-154`),
  *   - validation: reject `from >= to` (reference: `cmd/backup.go:160-168`).
  */
object TimeWindows {

  /** Parse a relative duration like "90s", "15m", "3h", "2d", "1w",
    * or compounds like "1d12h". Returns None if the string is not a
    * relative duration (callers then try absolute parsing).
    */
  def parseDuration(s: String): Option[Duration] = {
    val Token = raw"(\d+)([smhdw])".r
    val trimmed = s.trim.toLowerCase
    if (trimmed.isEmpty) return None
    val tokens = Token.findAllMatchIn(trimmed).toList
    // whole string must be consumed by tokens
    val consumed = tokens.map(m => m.end - m.start).sum
    if (tokens.isEmpty || consumed != trimmed.length) None
    else Some(tokens.foldLeft(Duration.ZERO) { (acc, m) =>
      val n = m.group(1).toLong
      val unit = m.group(2) match {
        case "s" => Duration.ofSeconds(n)
        case "m" => Duration.ofMinutes(n)
        case "h" => Duration.ofHours(n)
        case "d" => Duration.ofDays(n)
        case "w" => Duration.ofDays(7 * n)
      }
      acc.plus(unit)
    })
  }

  private val absoluteLayouts: Seq[DateTimeFormatter] = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd")
  ).map(_.withZone(ZoneOffset.UTC))

  /** Parse an absolute UTC timestamp in one of the accepted layouts. */
  def parseAbsolute(s: String): Option[Instant] = {
    val t = s.trim
    // ISO instant first (2024-01-01T00:00:00Z)
    val iso = try Some(Instant.parse(t)) catch { case _: Exception => None }
    iso.orElse {
      absoluteLayouts.view.flatMap { fmt =>
        try {
          val ta = fmt.parse(t)
          val date = java.time.LocalDate.from(ta)
          val time =
            try java.time.LocalTime.from(ta)
            catch { case _: Exception => java.time.LocalTime.MIDNIGHT }
          Some(date.atTime(time).toInstant(ZoneOffset.UTC))
        } catch { case _: Exception => None }
      }.headOption
    }
  }

  /** Resolve one endpoint: absolute layout, else relative duration
    * subtracted from `anchor`, else `default`.
    */
  private def resolveEndpoint(spec: Option[String], anchor: Instant,
                              default: Instant): Either[String, Instant] =
    spec match {
      case None => Right(default)
      case Some(s) =>
        parseAbsolute(s)
          .orElse(parseDuration(s).map(d => anchor.minus(d)))
          .toRight(s"unparseable time spec: '$s'")
    }

  /** Resolve (from, to) per the reference's ordering: `to` first
    * (anchored on `now`), then `from` (anchored on the resolved `to`).
    */
  def resolve(fromSpec: Option[String], toSpec: Option[String],
              now: Instant): Either[String, (Instant, Instant)] = {
    val nowSec = now.truncatedTo(ChronoUnit.SECONDS)
    for {
      to   <- resolveEndpoint(toSpec, nowSec, nowSec)
      from <- resolveEndpoint(fromSpec, to, to.minus(Duration.ofHours(1)))
      _    <- if (!from.isBefore(to))
                Left(s"invalid window: from=$from must be before to=$to")
              else Right(())
    } yield (from, to)
  }
}
