package graft.schemer

import org.scalatest.funsuite.AnyFunSuite

/** The flagged ISO-8601 timestamp witness (SURVEY §1.4 optional extension):
 *  recognition boundaries, the WTs→WStr demotion, rendering, codec
 *  round-trip, and — critically — that the flag OFF path is byte-identical
 *  to reference behavior. */
class TimestampWitnessSpec extends AnyFunSuite {
  import Witness.temporalWitness

  test("recognition: valid dates and timestamps, all supported shapes") {
    assert(temporalWitness("2024-01-02") == Some(WTs(10, dateOnly = true)))
    assert(temporalWitness("2024-01-02T03:04:05") == Some(WTs(19, dateOnly = false)))
    assert(temporalWitness("2024-01-02 03:04:05") == Some(WTs(19, dateOnly = false)))
    assert(temporalWitness("2024-01-02T03:04:05.123456") == Some(WTs(26, dateOnly = false)))
    assert(temporalWitness("2024-01-02T03:04:05Z") == Some(WTs(20, dateOnly = false)))
    assert(temporalWitness("2024-01-02T03:04:05+05:30") == Some(WTs(25, dateOnly = false)))
    assert(temporalWitness("2024-02-29") == Some(WTs(10, dateOnly = true))) // leap day
  }

  test("rejection: shape mismatches, impossible calendars, bad clocks") {
    for (s <- Seq("hello", "2024-1-2", "20240102", "2024-01-02T03:04", // no seconds
                  "2024-02-31",     // impossible calendar date
                  "2023-02-29",     // non-leap year
                  "2024-13-01",     // month 13
                  "2024-01-02T24:00:00", "2024-01-02T03:60:05", "2024-01-02T03:04:60",
                  "x2024-01-02", "2024-01-02x"))
      assert(temporalWitness(s).isEmpty, s)
  }

  test("lattice: WTs joins keep temporal, any WStr demotes with max length") {
    assert(Witness.merge(WTs(10, true), WTs(19, false)) == WTs(19, false))
    assert(Witness.merge(WTs(10, true), WTs(10, true)) == WTs(10, true))
    assert(Witness.merge(WTs(19, false), WStr(7)) == WStr(19))
    assert(Witness.merge(WStr(25), WTs(19, false)) == WStr(25))
    assert(Witness.merge(WNull, WTs(10, true)) == WTs(10, true))
    // a number/timestamp conflict is a RowMismatch like any string/number one
    intercept[RowMismatch](Witness.merge(WTs(10, true), WNum(1, 1, 0)))
  }

  test("rendering and Spark types: DATE vs TIMESTAMP by dateOnly") {
    assert(HiveRender.renderType(WTs(10, dateOnly = true)) == "DATE")
    assert(HiveRender.renderType(WTs(19, dateOnly = false)) == "TIMESTAMP")
    assert(HiveRender.toSparkType(WTs(10, true)) == org.apache.spark.sql.types.DateType)
    assert(HiveRender.toSparkType(WTs(19, false)) == org.apache.spark.sql.types.TimestampType)
  }

  test("codec round-trips the timestamp witness") {
    for (w <- Seq(WTs(10, true), WTs(26, false),
                  WObj(Vector("t" -> WTs(19, false), "s" -> WStr(4)))))
      assert(WitnessCodec.read(WitnessCodec.write(w)) == w)
  }

  test("flag off: ISO strings stay plain VARCHAR witnesses (reference parity)") {
    val w = Witness.ofJson("""{"t":"2024-01-02T03:04:05"}""")
    assert(w == WObj(Vector("t" -> WStr(19))))
    val on = Witness.ofJson("""{"t":"2024-01-02T03:04:05"}""", inferTimestamps = true)
    assert(on == WObj(Vector("t" -> WTs(19, dateOnly = false))))
  }

  test("fold over mixed rows: all-temporal stays temporal, one plain string demotes") {
    val rows = Seq(
      """{"d":"2024-01-02","t":"2024-01-02T03:04:05","s":"2024-01-02"}""",
      """{"d":"2024-03-04","t":"2024-03-04 05:06:07","s":"plainly not a date"}""")
    val w = rows.map(Witness.ofJson(_, inferTimestamps = true))
      .foldLeft(Witness.bottom)(Witness.merge(_, _))
    assert(w == WObj(Vector(
      "d" -> WTs(10, dateOnly = true),
      "t" -> WTs(19, dateOnly = false),
      "s" -> WStr(18))))
  }
}
