package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sketch_stats is no_oracle by contract (sketch outputs are
 *  engine-specific) — this spec pins it to EXACT ground truth instead:
 *  HLL++ cardinalities within the configured relative error, and
 *  percentile_approx (accuracy 10000) within a tight band of the exact
 *  quantiles computed on the same data. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("sketch estimates stay within their error bounds of exact answers") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.agg(
      countDistinct(col("l_orderkey")).as("orders"),
      countDistinct(col("l_partkey")).as("parts"),
      expr("percentile(l_extendedprice, 0.5)").as("median"),
      expr("percentile(l_extendedprice, 0.99)").as("p99")).head()
    val sketch = AsofAndSketch.sketchStats(spark, dir).head()
    // schema: n_rows, exact_orders, exact_parts, orders_in_bound,
    //         parts_in_bound, p49/p51/p989/p991_cents, median_in_bound,
    //         p99_in_bound — the exact figures must equal ground truth and
    //         every sketch verdict must report in-bound
    assert(sketch.getLong(1) == exact.getLong(0), "exact_orders mismatch")
    assert(sketch.getLong(2) == exact.getLong(1), "exact_parts mismatch")
    assert(sketch.getLong(3) == 1L, "HLL order cardinality out of bound")
    assert(sketch.getLong(4) == 1L, "HLL part cardinality out of bound")
    assert(sketch.getLong(9) == 1L, "approx median outside the p49..p51 band")
    assert(sketch.getLong(10) == 1L, "approx p99 outside the p98.9..p99.1 band")
    // the rank bands themselves must bracket the exact quantiles (cents)
    val medCents = math.round(exact.getDouble(2) * 100)
    val p99Cents = math.round(exact.getDouble(3) * 100)
    assert(sketch.getLong(5) <= medCents && medCents <= sketch.getLong(6),
      "exact median outside the reported p49..p51 band")
    assert(sketch.getLong(7) <= p99Cents && p99Cents <= sketch.getLong(8),
      "exact p99 outside the reported p98.9..p99.1 band")
  }

  test("heavy hitters EQUAL the exact >n/k set — the sketch only prunes, never decides") {
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .collect().map(_.getString(0))
    val k = 50
    val thresh = toks.length.toLong / k
    val expected = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 > thresh).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val got = AsofAndSketch.q54HeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty, "test premise: the corpus has heavy hitters")
    assert(got == expected)
  }

  test("Misra-Gries candidate completeness holds under adversarial partitioning") {
    import spark.implicits._
    // a skewed stream: one heavy token buried in k distinct fillers per slot
    val heavy = Seq.fill(400)("HH")
    val filler = (0 until 4000).map(i => s"f$i")
    val stream = new scala.util.Random(11).shuffle(heavy ++ filler)
    for (parts <- Seq(1, 2, 97)) {
      val ds = spark.createDataset(stream).repartition(parts)
      val k = 50
      val cands = ds.mapPartitions { it =>
        val counters = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { t =>
          if (counters.contains(t)) counters(t) += 1
          else if (counters.size < k) counters(t) = 1
          else {
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.keysIterator.foreach { key =>
              counters(key) -= 1
              if (counters(key) == 0) dead += key
            }
            dead.foreach(counters.remove)
          }
        }
        counters.keysIterator
      }.collect().toSet
      assert(cands.contains("HH"), s"parts=$parts: the >n/k token must survive pruning")
    }
  }
}
