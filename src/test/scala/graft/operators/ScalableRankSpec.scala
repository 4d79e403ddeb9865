package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScalableRank must equal the single-partition window forms exactly —
 *  including the SQL-standard ntile remainder distribution — while never
 *  using a no-partitionBy window itself. */
class ScalableRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample(n: Int) = {
    // duplicate-heavy values force tiebreak correctness across partitions
    (1 to n).map(i => (i.toLong, (i * 7919 % 97).toDouble)).toDF("id", "v")
      .repartition(7)
  }

  test("global row number equals the window row_number for a total order") {
    val df = sample(1000)
    val (ranked, total) = ScalableRank.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn")
    assert(total == 1000L)
    val expected = df.withColumn("rn2",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("bigint"))
    val joined = ranked.join(expected, Seq("id", "v"))
    assert(joined.filter(col("rn") =!= col("rn2")).count() == 0)
  }

  test("grouped prefix sum is exact when a group spans multiple range slices") {
    // r6 regression: the carry-in branch only executes when a group straddles
    // ≥2 range partitions — 2 string-keyed groups × 2000 rows over 32 slices
    // guarantees it (and the STRING key reproduces the using-join
    // column-order ClassCastException the r6 driver bench hit at sf0.1)
    val df = (1 to 4000).map { i =>
      (if (i % 2 == 0) "web" else "api", i.toLong, (i % 13).toLong)
    }.toDF("source", "seq", "amount").repartition(11)
    val got = ScalableRank.withGroupedPrefixSum(df, Seq("source"), Seq("seq"), "amount", "prior")
    val nSlices = got.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    assert(nSlices > 1, "test needs >1 range slice to exercise the carry branch")
    val want = df.withColumn("prior2",
      (sum(col("amount")).over(
        Window.partitionBy("source").orderBy("seq")) - col("amount")).cast("bigint"))
    val joined = got.join(want, Seq("source", "seq", "amount"))
    assert(joined.count() == 4000)
    assert(joined.filter(col("prior") =!= col("prior2")).count() == 0)
  }

  test("rowsAtGlobalRanks returns exactly the window-ranked rows at each target") {
    val df = sample(1000)
    val (hit, total) = ScalableRank.rowsAtGlobalRanks(
      df, Seq(col("v"), col("id")),
      n => Seq(1L, n / 2, n, n + 7 /* out of range: dropped */), "rn")
    assert(total == 1000L)
    val want = df.withColumn("rn2",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("bigint"))
      .filter(col("rn2").isin(1L, 500L, 1000L))
    assert(hit.count() == 3)
    val joined = hit.join(want, Seq("id", "v"))
    assert(joined.count() == 3)
    assert(joined.filter(col("rn") =!= col("rn2")).count() == 0)
  }

  test("ntile matches the window ntile, including non-divisible remainders") {
    for (n <- Seq(1000, 1003, 150, 5)) { // 1003 % 4 = 3, 150 % 4 = 2, 5 % 4 = 1
      val df = sample(n)
      val got = ScalableRank.withNtile(df, Seq(col("v"), col("id")), 4, "q")
      val want = df.withColumn("q2",
        ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("bigint"))
      val joined = got.join(want, Seq("id", "v"))
      assert(joined.filter(col("q") =!= col("q2")).count() == 0, s"ntile diverged at n=$n")
    }
  }
}
