package graft

import org.apache.spark.sql.types._

import graft.spec._

/** time / timedelta validators — reference `validators/time.rs`,
 * `validators/timedelta.rs` (speedate grammar). */
class TimeSpecSpec extends SparkTestBase {

  test("time: parse HH:MM:SS(.ffffff) -> seconds of day; reject malformed") {
    val got = run(TimeSpec(), StringType,
      Seq("00:00:00", "12:30:15", "23:59:59.5", "24:00:00", "9:60:00", "nope"))
    assert(got(0) == (0.0, Nil))
    assert(got(1) == (45015.0, Nil))
    assert(got(2) == (86399.5, Nil))
    assert(got(3)._2 == Seq("time_parsing"))
    assert(got(4)._2 == Seq("time_parsing"))
    assert(got(5)._2 == Seq("time_parsing"))
  }

  test("time: bounds compare as seconds with time-string ctx") {
    val got = types(TimeSpec(ge = Some("09:00:00"), lt = Some("17:00:00")),
      StringType, Seq("09:00:00", "08:59:59", "17:00:00", "12:00:00"))
    assert(got == Seq(Nil, Seq("greater_than_equal"), Seq("less_than"), Nil))
  }

  test("timedelta: ISO-8601 and HH:MM:SS forms, signs, numeric lax") {
    val got = run(TimedeltaSpec(), StringType,
      Seq("PT90S", "P1DT2H", "-PT30S", "01:30:00", "-00:00:10", "P", "xx"))
    assert(got(0) == (90.0, Nil))
    assert(got(1) == (93600.0, Nil))
    assert(got(2) == (-30.0, Nil))
    assert(got(3) == (5400.0, Nil))
    assert(got(4) == (-10.0, Nil))
    assert(got(5)._2 == Seq("time_delta_parsing"))
    assert(got(6)._2 == Seq("time_delta_parsing"))
    val num = run(TimedeltaSpec(), LongType, Seq(120L))
    assert(num.head == (120.0, Nil))
  }

  test("timedelta: range checks in seconds") {
    val got = types(TimedeltaSpec(ge = Some(0.0), le = Some(3600.0)),
      StringType, Seq("PT30M", "-PT1S", "PT2H"))
    assert(got == Seq(Nil, Seq("greater_than_equal"), Seq("less_than_equal")))
  }
}
