package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins [[ScalableRank.valuesAtRanksFromCounts]] against the sequential
 *  definition: value at global rank r under ascending order. */
class ValueCountLocatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("locator equals the sequential sorted-list answer on a skewed distribution") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // skewed multiset: values 0..999 with zipf-ish counts
    val values = (0 until 1000).flatMap(v => Seq.fill(1 + rnd.nextInt(1 + v % 37))(v.toLong))
    val sorted = values.sorted
    val df = values.toDF("v").repartition(7)
    val ranks = Seq(1L, 2L, sorted.length / 4L, sorted.length / 2L,
      3L * sorted.length / 4, sorted.length - 1L, sorted.length.toLong)
    val (hit, total) = ScalableRank.valuesAtGlobalRanks(df, "v", _ => ranks, "rk")
    assert(total == sorted.length)
    val got = hit.collect().map(r => r.getAs[Long]("rk") -> r.getAs[Long]("v")).toMap
    for (r <- ranks)
      assert(got(r) == sorted((r - 1).toInt), s"rank $r: got ${got.get(r)} want ${sorted((r - 1).toInt)}")
    assert(got.size == ranks.distinct.size)
  }

  test("locator agrees on the sf0.001 lineitem cents distribution") {
    val dir = "/root/testdata/sf0.001"
    val cents = graft.Tables.lineitem(spark, dir).select(
      expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as decimal(38,0))")
        .cast("long").as("cents"))
    val exact = cents.orderBy("cents").collect().map(_.getLong(0))
    val n = exact.length.toLong
    val ranks = Seq((49L * n + 99) / 100, (51L * n + 99) / 100,
      (989L * n + 999) / 1000, (991L * n + 999) / 1000)
    val (hit, total) = ScalableRank.valuesAtGlobalRanks(cents, "cents", _ => ranks, "rk")
    assert(total == n)
    val got = hit.collect().map(r => r.getAs[Long]("rk") -> r.getAs[Long]("cents")).toMap
    for (r <- ranks)
      assert(got(r) == exact((r - 1).toInt), s"rank $r: got ${got.get(r)} want ${exact((r - 1).toInt)}")
  }
}
