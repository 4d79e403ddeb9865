package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sweep-line and skyline operators against sequential brute-force
 *  references — dominance semantics and per-hour peaks are easy to get
 *  subtly wrong at slice boundaries, so both are re-derived in plain
 *  Scala from the collected base tables. */
class SweepSkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q68_skyline equals the brute-force dominance filter") {
    val pts = Tables.orders(spark, dir)
      .select(
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as decimal(38,0))")
          .cast("long").as("cents"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // candidates: best (latest) date per price, with order count
    val cand = pts.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).max, xs.length.toLong) }
    // brute force: keep iff NO other candidate has lower price and >= date
    val expected = cand.filter { case (c, d, _) =>
      !cand.exists { case (c2, d2, _) => c2 < c && d2 >= d }
    }.toSeq.sortBy(_._1)
    val got = SweepSkyline.q68Skyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.size > 1, "test premise: a non-trivial frontier")
  }

  test("q77_streaks equals the sequential gaps-and-islands reference") {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // sequential islands: sort each user's days, split where the gap > 1
    val streaks = days.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.map(_._2).sorted
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var len = 1L
      for ((prev, cur) <- sorted.zip(sorted.tail)) {
        if (cur == prev + 1) len += 1 else { lens += len; len = 1 }
      }
      lens += len
      lens.map(l => (u, l))
    }
    val expected = streaks.groupBy(_._2).toSeq.map { case (len, xs) =>
      (len, xs.size.toLong, xs.map(_._1).distinct.size.toLong)
    }.sortBy(_._1)
    val got = SweepSkyline.q77Streaks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.exists(_._1 > 1), "test premise: some user has a multi-day streak")
  }

  test("q80_mad equals the sequential lower-median reference") {
    val cents = Tables.orders(spark, dir)
      .select(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as decimal(38,0))")
        .cast("long").as("c"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      val sorted = xs.sortBy(identity).map(_._1)
      sorted(((xs.size + 1) / 2 - 1).toInt)
    }
    val med = lowerMedian(cents.toSeq)
    val mad = lowerMedian(cents.toSeq.map { case (c, k) => (math.abs(c - med), k) })
    val row = SweepSkyline.q80Mad(spark, dir).collect().head
    assert(row.getAs[Long]("n_orders") == cents.length.toLong)
    assert(row.getAs[Long]("median_cents") == med)
    assert(row.getAs[Long]("mad_cents") == mad)
    assert(mad > 0, "test premise: order totals are dispersed")
  }

  test("q67_concurrency equals a sequential sweep over the same sessions") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-user 30-min-gap sessions (sorted by (us, event_id) like the query)
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.map(x => (x._3, x._2)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)] // (u, s, e)
      var s = sorted.head._1; var last = sorted.head._1
      for ((t, _) <- sorted.tail) {
        if (t - last >= 1800000000L) { out += ((u, s, last)); s = t }
        last = t
      }
      out += ((u, s, last))
      out.toSeq
    }
    // sweep: boundaries sorted by (us, delta, user), running sum, per-hour stats
    val bounds = sessions.flatMap { case (u, s, e) => Seq((s, 1, u), (e, -1, u)) }
      .sortBy { case (us, d, u) => (us, d, u) }
    var conc = 0L
    val byHour = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long, Long)]
    for ((us, d, _) <- bounds) {
      conc += d
      val h = us / 3600000000L
      val (pk, st, en) = byHour.getOrElse(h, (Long.MinValue, 0L, 0L))
      byHour(h) = (math.max(pk, conc), st + (if (d == 1) 1 else 0), en + (if (d == -1) 1 else 0))
    }
    val expected = byHour.toSeq.map { case (h, (p, s, e)) => (h, p, s, e) }.sortBy(_._1)
    val got = SweepSkyline.q67Concurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 1), "test premise: some hour has overlapping sessions")
  }
}
