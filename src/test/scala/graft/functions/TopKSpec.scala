package graft.functions

import graft.SparkTestSession
import graft.similarity.{Scored, TopK, TopKAgg}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate must agree with the window-rank form and
 *  keep its buffer at O(k) regardless of input order or merge shape. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aggregator semantics: bounded buffer, ordered output, id tiebreak") {
    val agg = new TopKAgg(3)
    val items = Seq(Scored(1.0, 5), Scored(2.0, 4), Scored(2.0, 2), Scored(0.5, 1), Scored(3.0, 9))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size == 3)
    assert(buf == Seq(Scored(3.0, 9), Scored(2.0, 2), Scored(2.0, 4)))
    // merge of disjoint partial buffers gives the same result as one pass
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == buf)
  }

  test("bottom-k string aggregator equals the window form (stratified sample shape)") {
    import graft.similarity.{ScoredStr, TopKMinStrAgg}
    val agg = new TopKMinStrAgg(2)
    val items = Seq(ScoredStr("bb", 1), ScoredStr("aa", 7), ScoredStr("aa", 3), ScoredStr("zz", 0))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(ScoredStr("aa", 3), ScoredStr("aa", 7)))
    val (l, r) = items.splitAt(1)
    assert(agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)) == buf)

    val df = (1 to 500).map(i => (i % 5, f"${i * 2654435761L % 1000}%03d", i.toLong))
      .toDF("g", "h", "id").repartition(7)
    val grouped = df.groupBy("g").agg(TopK.topKMinStr(4)(col("h"), col("id")).as("top"))
    val got = TopK.explodeRanks(grouped, "g", "id")
    val w = Window.partitionBy("g").orderBy(col("h"), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 4).select("g", "id", "rank")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("grouped top-k equals the row_number window form") {
    val df = (1 to 2000)
      .map(i => (i % 7, (i * 2654435761L % 1000).toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(9)
    val grouped = df.groupBy("g").agg(TopK.topK(5)(col("score"), col("id")).as("top"))
    val got = TopK.explodeRanks(grouped, "g", "id")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 5).select("g", "id", "rank")
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }
}
