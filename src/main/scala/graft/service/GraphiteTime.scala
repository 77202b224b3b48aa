package graft.service

/** Graphite `from`/`until` time parsing — the reference's
  * `time_of_graphite_time` (`RamenHelpersNoLog.ml:1151-1156`, itself
  * after http://graphite-api.readthedocs.io/en/latest/api.html#from-until):
  * a leading `-` is a relative offset `-<n><unit>` from now; anything else
  * is an "abstime": `HH:MM[am|pm]` and the midnight/noon/teatime keywords,
  * `now`, a bare epoch/float, `DD.MM.YYYY` / `MM/DD/YYYY` dates, and
  * `YYYY-MM-DD[ T]HH:MM[:SS[.s]]` in the local zone. None on anything
  * else — the render endpoint falls back to the API defaults (from: 24 h
  * ago, until: now), never a parse error (`RamenGraphite.ml:408-417`). */
object GraphiteTime {

  def parse(s0: String, now: Double): Option[Double] = {
    val s = s0.trim
    if (s.isEmpty) None
    else if (s.charAt(0) == '-') reltime(s, now)
    else abstime(s.toLowerCase, now)
  }

  // `Scanf "%f%s"`: float (sign included) then the unit as the rest
  // (`time_of_reltime`, RamenHelpersNoLog.ml:1046-1064); a missing or
  // unknown unit is None, not seconds
  private val Rel = "^(-\\d+(?:\\.\\d+)?)(s|m|min|h|d|w|mon|y)$".r

  private def reltime(s: String, now: Double): Option[Double] = s match {
    case Rel(n, u) =>
      val scale = u match {
        case "s" => 1.0
        case "m" | "min" => 60.0
        case "h" => 3600.0
        case "d" => 86400.0
        case "w" => 7 * 86400.0
        case "mon" => 30 * 86400.0
        case _ => 365 * 86400.0 // "y"
      }
      Some(now + n.toDouble * scale)
    case _ => None
  }

  private val HhMm = "^(\\d{1,2}):(\\d{1,2})(am|pm|)$".r
  private val DdMmYyyy = "^(\\d{1,2})\\.(\\d{1,2})\\.(\\d{1,4})$".r
  private val MmDdYyyy = "^(\\d{1,2})/(\\d{1,2})/(\\d{1,4})$".r
  private val Iso = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})$".r
  private val IsoHm = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})[ t](\\d{1,2}):(\\d{1,2})$".r
  private val IsoHms =
    "^(\\d{4})-(\\d{1,2})-(\\d{1,2})[ t](\\d{1,2}):(\\d{1,2}):(\\d+(?:\\.\\d+)?)$".r

  /** `man 1 at` times-of-day: the reference's `time_of_hh_mm` returns `now`
    * when the time of day is still ahead and `now + 86400` when past
    * (RamenHelpersNoLog.ml:1081-1087) — it does NOT set the clock time.
    * Mirrored as-is: render ranges built from these match the reference. */
  private def hhMm(h0: Int, m: Int, amPm: String, now: Double): Double = {
    val h = if (amPm == "pm") h0 + 12 else h0
    val tm = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli((now * 1000).toLong),
      java.time.ZoneId.systemDefault())
    val past = h < tm.getHour || (h == tm.getHour && m < tm.getMinute)
    if (past) now + 86400 else now
  }

  /** Local-zone epoch; seconds round half-up like the reference's
    * `round_to_int` ("12:00:00.9" == "12:00:01"). Out-of-range fields are
    * None (the reference's mktime would normalize them instead — callers
    * fall back to the same defaults either way). */
  private def epochOf(y: Int, mo: Int, d: Int, h: Int, mi: Int,
      sec: Double): Option[Double] =
    scala.util.Try {
      java.time.LocalDateTime.of(y, mo, d, h, mi, 0)
        .plusSeconds(math.round(sec))
        .atZone(java.time.ZoneId.systemDefault()).toEpochSecond.toDouble
    }.toOption

  private def fixY(y: Int): Int = if (y < 100) y + 2000 else y

  private def abstime(s: String, now: Double): Option[Double] = s match {
    case HhMm(h, m, ap) => Some(hhMm(h.toInt, m.toInt, ap, now))
    case "midnight" => Some(hhMm(0, 0, "", now))
    case "noon" => Some(hhMm(12, 0, "", now))
    case "teatime" => Some(hhMm(16, 0, "", now)) // 4pm, per `man 1 at`
    case "now" => Some(now)
    case other => scala.util.Try(other.toDouble).toOption.orElse(other match {
      // the float scan comes first, so the reference's MMDDYYYY form is
      // unreachable (8 digits always parse as a float) — not mirrored
      case DdMmYyyy(d, mo, y) => epochOf(fixY(y.toInt), mo.toInt, d.toInt, 0, 0, 0)
      case MmDdYyyy(mo, d, y) => epochOf(fixY(y.toInt), mo.toInt, d.toInt, 0, 0, 0)
      case Iso(y, mo, d) => epochOf(y.toInt, mo.toInt, d.toInt, 0, 0, 0)
      case IsoHm(y, mo, d, h, mi) =>
        epochOf(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, 0)
      case IsoHms(y, mo, d, h, mi, sec) =>
        epochOf(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, sec.toDouble)
      case _ => None
    })
  }
}
