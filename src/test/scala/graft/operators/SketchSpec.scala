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

    // approx_count_distinct default rsd = 5%; allow 3x slack for small n
    assert(math.abs(sketch.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) <= 0.15)
    assert(math.abs(sketch.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) <= 0.15)
    // percentile_approx at accuracy 10000: rank error <= n/10000 -> value
    // within a 1% relative band on this distribution
    assert(math.abs(sketch.getDouble(2) - exact.getDouble(2)) / exact.getDouble(2) <= 0.01)
    assert(math.abs(sketch.getDouble(3) - exact.getDouble(3)) / exact.getDouble(3) <= 0.01)
  }
}
