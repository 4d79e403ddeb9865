package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Customer-behavior statistics against sequential references — the gap
 *  histogram re-derived in plain Scala, the RFM grid checked on its
 *  population invariants (exact value parity is the DuckDB crosscheck's
 *  job; these pin the semantics a hash mismatch wouldn't localize). */
class BehaviorStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val orderDays: Array[(Long, Long, Long)] =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q82_gap_hist equals the sequential per-customer lag reference") {
    val gaps = orderDays.groupBy(_._1).toSeq.flatMap { case (c, xs) =>
      val days = xs.map(x => (x._3, x._2)).sorted.map(_._1)
      days.zip(days.tail).map { case (a, b) => (c, b - a) }
    }
    def bucket(g: Long): Long =
      (12 to 0 by -1).collectFirst { case k if g >= (1L << k) => 1L << k }.getOrElse(0L)
    val expected = gaps.groupBy(g => bucket(g._2)).toSeq.map { case (b, xs) =>
      (b, xs.size.toLong, xs.map(_._1).distinct.size.toLong,
        xs.map(_._2).min, xs.map(_._2).max)
    }.sortBy(_._1)
    val got = SessionAndSkew.q82GapHist(spark, dir).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.size > 3, "test premise: gaps span several buckets")
  }

  test("q90_attribution equals the sequential last-click replay") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"),
        expr("cast(cast(value as decimal(12,2)) * 100 as decimal(38,0))").cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val attributed = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      var lastClick: Option[Long] = None
      xs.sortBy(x => (x._4, x._2)).flatMap { case (_, _, typ, us, cents) =>
        if (typ == "click") { lastClick = Some(us); None }
        else if (typ == "purchase")
          Some((lastClick.map(c => (c / 3600000000L) % 24).getOrElse(-1L), cents))
        else None
      }
    }
    val expected = attributed.groupBy(_._1).toSeq
      .map { case (h, xs) => (h, xs.size.toLong, xs.map(_._2).sum) }.sortBy(_._1)
    val got = SessionAndSkew.q90Attribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.exists(_._1 >= 0) && expected.exists(_._1 == -1L),
      "test premise: both attributed and organic purchases exist")
  }

  test("q81_rfm partitions the full customer population into valid segments") {
    val rows = SessionAndSkew.q81Rfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCust = orderDays.map(_._1).distinct.length.toLong
    assert(rows.map(_._2).sum == nCust, "every customer lands in exactly one segment")
    assert(rows.forall { case (seg, _, _) =>
      val (r, f, m) = (seg / 100, seg / 10 % 10, seg % 10)
      Seq(r, f, m).forall(d => d >= 1 && d <= 5)
    }, "segment digits are quintiles 1..5")
    // each quintile digit covers ~n/5 customers (ntile balance, ±1 per rank)
    for (digit <- Seq[Long => Long](_ / 100, s => s / 10 % 10, _ % 10)) {
      val perQ = rows.groupBy(r => digit(r._1)).view.mapValues(_.map(_._2).sum)
      assert(perQ.values.max - perQ.values.min <= 1, "ntile balance holds per axis")
    }
    assert(rows.length > 10, "test premise: the grid is populated")
  }
}
