package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-parity datetime handling (reference types/conversion.go
  * ParseTime + wkb time layouts). Two requirements Spark's plain
  * `cast("timestamp")` can't meet:
  *
  *   1. The reference accepts partial dates ("1932", "1932-03",
  *      "1932-03-01") and RFC3339 with ANY zone offset — including
  *      offsets like +23:00 beyond java.time's ±18h `ZoneOffset` range
  *      (query/common_test.go:973 stores "2019-03-28T07:41:57+23:00").
  *      A Spark cast yields null for both.
  *   2. Output preserves the offset the value was WRITTEN with
  *      (query0_test.go TestDateTimeQuery goldens render
  *      "2019-03-28T08:41:57+23:00" verbatim, while date-only values
  *      render "2019-05-28T00:00:00Z"): Go keeps the parsed
  *      time.Location. A Spark TimestampType is a bare instant, so the
  *      display string is derived from the raw literal instead.
  *
  * Comparison/ordering always uses the INSTANT (local wall time minus
  * offset), so `le(dob, "1909-05-05T00:00:00+05:30")` matches the
  * reference's instant semantics.
  */
object DateTimeFunctions {

  private val offsetRe = "([+-])(\\d{2}):(\\d{2})$".r

  /** Local wall-time part normalized to Spark's "yyyy-MM-dd HH:mm:ss[.S]". */
  private def normLocal(v: Column): Column = {
    val noOff = regexp_replace(v, "(Z|z|[+-]\\d{2}:\\d{2})$", "")
    when(v.rlike("^\\d{4}$"), concat(v, lit("-01-01 00:00:00")))
      .when(v.rlike("^\\d{4}-\\d{2}$"), concat(v, lit("-01 00:00:00")))
      .when(v.rlike("^\\d{4}-\\d{2}-\\d{2}$"), concat(v, lit(" 00:00:00")))
      .otherwise(translate(noOff, "T", " "))
  }

  /** Zone offset in seconds (0 for Z / date-only / offset-less). */
  private def offsetSecs(v: Column): Column =
    when(v.rlike("[+-]\\d{2}:\\d{2}$"),
      (when(regexp_extract(v, "([+-])\\d{2}:\\d{2}$", 1) === "-", lit(-1))
        .otherwise(lit(1))) *
        (regexp_extract(v, "[+-](\\d{2}):\\d{2}$", 1).cast("int") * 3600 +
          regexp_extract(v, "[+-]\\d{2}:(\\d{2})$", 1).cast("int") * 60))
      .otherwise(lit(0))

  /** The INSTANT (UTC timestamp) of a raw datetime literal column.
    * Requires spark.sql.session.timeZone=UTC (the engine sets it).
    */
  def instant(v: Column): Column =
    (to_timestamp(normLocal(v)).cast("double") - offsetSecs(v))
      .cast("timestamp")

  /** Offset-preserving RFC3339 display string of a raw literal: partial
    * dates complete to T00:00:00Z, offset-less datetimes get Z, explicit
    * offsets render verbatim (Go time.Time keeps its Location).
    */
  def display(v: Column): Column =
    when(v.rlike("^\\d{4}$"), concat(v, lit("-01-01T00:00:00Z")))
      .when(v.rlike("^\\d{4}-\\d{2}$"), concat(v, lit("-01T00:00:00Z")))
      .when(v.rlike("^\\d{4}-\\d{2}-\\d{2}$"), concat(v, lit("T00:00:00Z")))
      .when(v.rlike("(Z|[+-]\\d{2}:\\d{2})$"), v)
      .otherwise(concat(v, lit("Z")))

  /** Driver-side literal parse with the same grammar — for typed filter
    * literals (`le(dob, "1909-05-05T00:00:00+05:30")`).
    */
  def parseInstant(s: String): java.sql.Timestamp = {
    import java.time.{LocalDateTime, ZoneOffset}
    val (local, offs) = offsetRe.findFirstMatchIn(s) match {
      case Some(m) =>
        val sign = if (m.group(1) == "-") -1 else 1
        (s.dropRight(6), sign * (m.group(2).toInt * 3600 + m.group(3).toInt * 60))
      case None => (s.stripSuffix("Z").stripSuffix("z"), 0)
    }
    val ldt = local match {
      case y if y.matches("\\d{4}") => LocalDateTime.of(y.toInt, 1, 1, 0, 0)
      case ym if ym.matches("\\d{4}-\\d{2}") =>
        LocalDateTime.of(ym.take(4).toInt, ym.drop(5).toInt, 1, 0, 0)
      case ymd if ymd.matches("\\d{4}-\\d{2}-\\d{2}") =>
        LocalDateTime.parse(ymd + "T00:00:00")
      case full => LocalDateTime.parse(full)
    }
    java.sql.Timestamp.from(ldt.toInstant(ZoneOffset.UTC).minusSeconds(offs))
  }
}
