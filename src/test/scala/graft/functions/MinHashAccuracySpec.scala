package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical sanity of the MinHash estimator: with k=64 permutations the
 *  estimate should track exact Jaccard within ~2σ = 2·√(J(1−J)/k) ≈ 0.125
 *  for mid-range J. Deterministic inputs + seed-stable xxhash64 make this
 *  a fixed assertion, not a flaky statistical test. */
class MinHashAccuracySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import TextFunctions._

  private def doc(words: Seq[String]): String = words.mkString(" ")

  test("minhash estimate tracks exact shingle-set Jaccard") {
    import spark.implicits._
    val base = (0 until 100).map(i => s"w$i")
    // overlap fractions: shared prefix of `m` words, rest disjoint
    val cases = Seq(90, 70, 50, 30).map { m =>
      val a = base
      val b = base.take(m) ++ (0 until (100 - m)).map(i => s"x$i")
      (doc(a), doc(b))
    }
    val df = cases.toDF("a", "b").select(
      minhashSimilarity(
        minhash(shingles(col("a"), 2), 64),
        minhash(shingles(col("b"), 2), 64)).as("est"),
      (size(array_intersect(array_distinct(shingles(col("a"), 2)), array_distinct(shingles(col("b"), 2)))).cast("double") /
        size(array_union(array_distinct(shingles(col("a"), 2)), array_distinct(shingles(col("b"), 2)))).cast("double")).as("exact"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    rows.foreach { case (est, exact) =>
      assert(math.abs(est - exact) <= 0.15, s"est=$est exact=$exact")
    }
    // ordering preserved: higher overlap ⇒ higher estimate
    val ests = rows.map(_._1).toSeq
    assert(ests.zip(ests.tail).forall { case (x, y) => x >= y })
  }
}
