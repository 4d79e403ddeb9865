package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vocabulary-coverage thresholds against a sequential sorted-prefix
 *  reference — the "count rows whose exclusive prefix is below p·T"
 *  formulation must equal the textbook "smallest k with cum_k ≥ p·T". */
class VocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("text_vocab_coverage equals the sequential sorted-prefix reference") {
    val counts = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val desc = counts.sortBy { case (tok, c) => (-c, tok) }.map(_._2)
    def smallestK(pct: Long): Long = {
      var cum = 0L; var k = 0L
      while (cum * 100 < total * pct) { cum += desc(k.toInt); k += 1 }
      k
    }
    val row = TextQueries.vocabCoverage(spark, dir).collect().head
    assert(row.getAs[Long]("n_types") == counts.length.toLong)
    assert(row.getAs[Long]("total_tokens") == total)
    assert(row.getAs[Long]("types_p50") == smallestK(50))
    assert(row.getAs[Long]("types_p90") == smallestK(90))
    assert(row.getAs[Long]("types_p99") == smallestK(99))
    assert(smallestK(50) < smallestK(99), "test premise: the curve is non-degenerate")
  }
}
