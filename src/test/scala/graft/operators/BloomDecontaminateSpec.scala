package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom prefilter is an optimization, never a semantics change: false
 *  positives must die in the exact confirm join, so the bloom plan's output
 *  is bit-identical to the same pipeline with the prefilter removed. */
class BloomDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom-prefiltered output equals the exact no-bloom plan") {
    val withBloom = CurationPipeline.bloomDecontaminate(spark, dir).collect().toSeq

    // same pipeline, no prefilter
    val docShingles = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(wordShingleHashes(col("text"), 3))).as("sh"))
    val isBench = col("doc_id") % 89 === 0
    val benchShingles = docShingles.filter(isBench).select("sh").distinct()
    val exact = docShingles.filter(!isBench)
      .join(benchShingles, "sh")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .groupBy("source")
      .agg(count(lit(1)).as("n_flagged"), sum("n_shared").as("total_shared"))
      .orderBy("source")
      .collect().toSeq

    assert(withBloom == exact)
    assert(withBloom.nonEmpty, "sf0.001 corpus should produce contamination hits")
  }
}
