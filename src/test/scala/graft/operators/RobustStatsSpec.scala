package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Robust statistics and agreement coefficients against sequential
 *  references — quartile-rank selection and signed-ratio formulas are the
 *  kind of arithmetic a hash mismatch wouldn't localize. */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def sortedCents(tbl: String): Array[Long] = {
    val (c, keys) = if (tbl == "orders")
      ("o_totalprice", Seq(col("o_orderkey")))
    else ("l_extendedprice", Seq(col("l_orderkey"), col("l_linenumber")))
    Tables.load(spark, dir, tbl)
      .select((expr(s"cast(cast($c as decimal(12,2)) * 100 as decimal(38,0))")
        .cast("long").as("cents") +: keys): _*)
      .collect().map(r => (r.getLong(0), r.toSeq.drop(1).map(_.toString).mkString("|")))
      .sortBy(identity).map(_._1)
  }

  test("q86_bowley equals the sequential quartile reference") {
    val s = sortedCents("orders")
    val n = s.length.toLong
    val (q1, q2, q3) = (s(((n + 3) / 4 - 1).toInt), s(((n + 1) / 2 - 1).toInt),
      s(((3 * n + 3) / 4 - 1).toInt))
    val row = SweepSkyline.q86Bowley(spark, dir).collect().head
    assert(row.getAs[Long]("n_orders") == n)
    assert(row.getAs[Long]("q1_cents") == q1)
    assert(row.getAs[Long]("q2_cents") == q2)
    assert(row.getAs[Long]("q3_cents") == q3)
    assert(row.getAs[Double]("bowley_skew") ==
      (q3 + q1 - 2.0 * q2) / (q3 - q1).toDouble)
  }

  test("q87_tukey equals the sequential fence reference") {
    val s = sortedCents("lineitem")
    val n = s.length.toLong
    val (q1, q3) = (s(((n + 3) / 4 - 1).toInt), s(((3 * n + 3) / 4 - 1).toInt))
    val nLow = s.count(c => 2 * c < 5 * q1 - 3 * q3).toLong
    val nHigh = s.count(c => 2 * c > 5 * q3 - 3 * q1).toLong
    val row = SweepSkyline.q87Tukey(spark, dir).collect().head
    assert(row.getAs[Long]("n_rows") == n)
    assert(row.getAs[Long]("q1_cents") == q1 && row.getAs[Long]("q3_cents") == q3)
    assert(row.getAs[Long]("n_low") == nLow && row.getAs[Long]("n_high") == nHigh)
    // TPC-H-ish prices are near-uniform: a zero census is the CORRECT
    // boxplot answer here — pin the fences' ordering instead
    assert(row.getAs[Long]("low_fence_x2") < 2 * q1 && 2 * q3 < row.getAs[Long]("high_fence_x2"))
  }

  test("q88_winsorized equals the sequential clamp reference") {
    val s = sortedCents("orders")
    val n = s.length.toLong
    val (p5, p95) = (s(((n + 19) / 20 - 1).toInt), s(((19 * n + 19) / 20 - 1).toInt))
    val ws = s.map(c => math.max(p5, math.min(p95, c))).map(BigInt(_)).sum
    val rs = s.map(BigInt(_)).sum
    val row = SweepSkyline.q88Winsorized(spark, dir).collect().head
    assert(row.getAs[Long]("n_orders") == n)
    assert(row.getAs[Long]("p5_cents") == p5 && row.getAs[Long]("p95_cents") == p95)
    assert(BigInt(row.getAs[Long]("winsorized_mean_x100")) == (2 * ws * 100 + n) / (2 * n))
    assert(BigInt(row.getAs[Long]("raw_mean_x100")) == (2 * rs * 100 + n) / (2 * n))
    assert(p5 < p95, "test premise: the clamp window is non-degenerate")
  }

  test("q89_grouped_median equals the sequential per-group rank reference") {
    val rows = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as decimal(38,0))")
          .cast("long").as("cents"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.map { case (nation, xs) =>
      val s = xs.map(x => (x._2, x._3)).sorted.map(_._1)
      val n = s.length.toLong
      (nation, n, s(((n + 1) / 2 - 1).toInt), s(((9 * n + 9) / 10 - 1).toInt))
    }.sortBy(_._1)
    val got = SweepSkyline.q89GroupedMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.size > 10, "test premise: many groups, each spanning slices")
  }

  test("q92_eta_squared equals the sequential BigInt reference") {
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as decimal(38,0))")
          .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).values.map(_.map(x => BigInt(x._2)))
    val nn = BigInt(rows.length)
    val st = rows.map(x => BigInt(x._2)).sum
    val sst = rows.map(x => BigInt(x._2) * x._2).sum
    val ssbs = groups.map(g => g.sum * g.sum / g.size).sum
    val expected = (nn * ssbs - st * st) * 1000000 / (nn * sst - st * st)
    val row = SweepSkyline.q92EtaSquared(spark, dir).collect().head
    assert(row.getAs[Long]("n_groups") == groups.size.toLong)
    assert(row.getAs[Long]("n_orders") == rows.length.toLong)
    assert(BigInt(row.getAs[Long]("eta_sq_e6")) == expected)
    assert(expected >= 0 && expected < 1000000, "η² lands in [0,1)")
  }

  test("q93_chisq equals the sequential BigInt reference") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), expr("((ts div 86400000000000) + 3) % 7").as("dow"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nn = BigInt(rows.length)
    val obs = rows.groupBy(identity).view.mapValues(x => BigInt(x.length))
    val rm = rows.groupBy(_._1).view.mapValues(x => BigInt(x.length))
    val cm = rows.groupBy(_._2).view.mapValues(x => BigInt(x.length))
    val expected = obs.toSeq.map { case ((t, d), o) =>
      val (r, c) = (rm(t), cm(d))
      val diff = nn * o - r * c
      (t, d, o.toLong, ((2 * diff * diff * 10000 + nn * r * c) / (2 * nn * r * c)).toLong)
    }.sortBy(x => (x._1, x._2))
    val got = SweepSkyline.q93Chisq(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.size == rm.size * cm.size, "the full contingency grid is populated")
  }

  test("text_lang_kappa equals the sequential confusion-matrix reference") {
    val conf = TextQueries.langConfusion(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val nn = conf.map(_._2).sum
    val diag = conf.collect { case ((a, b), n) if a == b => n }.sum
    val rows = conf.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val cols = conf.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    val src = rows.toSeq.map { case (l, rn) => rn * cols.getOrElse(l, 0L) }.sum
    val row = TextQueries.langKappa(spark, dir).collect().head
    assert(row.getAs[Long]("n_docs") == nn)
    assert(row.getAs[Long]("n_agree") == diag)
    assert(row.getAs[Long]("po_bp") == (2 * diag * 10000 + nn) / (2 * nn))
    assert(row.getAs[Double]("kappa") ==
      (nn * diag - src).toDouble / (nn * nn - src).toDouble)
    // at sf0.001 the tiny corpus leaves kappa slightly NEGATIVE — the
    // statistic must still be finite, bounded, and sign-correct
    assert(row.getAs[Double]("kappa") > -1.0 && row.getAs[Double]("kappa") < 1.0)
  }
}
