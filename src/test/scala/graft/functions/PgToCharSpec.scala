package graft.functions

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** pg to_char template rendering against outputs verified by the reference
  * (test/sqllogictest/timestamp.slt:269-350 — the corpus also runs in the
  * SLT gate; this pins the pure renderer without a SparkSession). */
class PgToCharSpec extends AnyFunSuite {
  private def r(fmt: String, ts: String, tz: Boolean = false): String =
    PgDateTimeFormat.render(fmt, LocalDateTime.parse(ts), tz)

  test("day/month name families with fill and FM") {
    val t = "2021-02-09T01:07:12"
    assert(r("DAY Day day DY Dy dy MONTH Month month RM MON Mon mon", t) ==
      "TUESDAY   Tuesday   tuesday   TUE Tue tue FEBRUARY  February  february  II   FEB Feb feb")
    assert(r("FMDAY FMDay FMday FMMONTH FMMonth FMmonth FMRM", t) ==
      "TUESDAY Tuesday tuesday FEBRUARY February february II")
  }

  test("numeric year/week/julian fields") {
    assert(r("Y,YYY YYYY YYY YY Y CC Q MM WW DDD DD D J", "1997-01-01T00:00:00") ==
      "1,997 1997 997 97 7 20 1 01 01 001 01 4 2450450")
    assert(r("FMY,YYY FMYYYY FMYYY FMYY FMY FMCC FMQ FMMM FMWW FMDDD FMDD FMD FMJ",
      "2021-02-09T01:07:12") == "2,021 2021 21 21 1 21 1 2 6 40 9 3 2459255")
  }

  test("hours, seconds-past-midnight") {
    assert(r("HH HH12 HH24 MI SS SSSS", "2021-02-09T01:07:12") == "01 01 01 07 12 4032")
    assert(r("HH HH12 HH24 MI SS SSSS", "2060-12-31T23:59:59.999999") ==
      "11 11 23 59 59 86399")
    assert(r("HH HH12 HH24 MI SS SSSS", "1997-01-01T00:00:00") == "12 12 00 00 00 0")
  }

  test("quoted literals and escaped quotes") {
    assert(r("\"HH:MI:SS is\" HH:MI:SS \"\\\"text between quote marks\\\"\"",
      "2021-02-09T01:07:12") == "HH:MI:SS is 01:07:12 \"text between quote marks\"")
    assert(r("HH24--text--MI--text--SS", "1997-01-01T00:00:00") ==
      "00--text--00--text--00")
  }

  test("ordinal suffixes and era/meridiem") {
    assert(r("YYYYTH YYYYth Jth", "2021-02-09T01:07:12") == "2021ST 2021st 2459255th")
    assert(r("YYYYTH YYYYth Jth", "2024-03-21T12:09:23") == "2024TH 2024th 2460391st")
    assert(r("YYYY A.D. YYYY a.d. YYYY bc HH:MI:SS P.M. HH:MI:SS p.m. HH:MI:SS pm",
      "2024-03-21T12:09:23") ==
      "2024 A.D. 2024 a.d. 2024 ad 12:09:23 P.M. 12:09:23 p.m. 12:09:23 pm")
  }

  test("timezone fields render per input kind") {
    assert(r("TZ tz OF TZH:TZM", "2021-02-09T01:07:12", tz = true) == "UTC utc +00 +00:00")
    assert(r("TZ tz", "2021-02-09T01:07:12", tz = false) == " ")
  }
}
