package graft.functions

import graft.SparkTestSession
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native SimHash/MinHash expressions must be BIT-IDENTICAL to the HOF
 *  chains they replaced — bucket assignments and candidate pairs depend on
 *  exact signature values. The HOF forms are inlined here as the reference. */
class HashExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hofSimhash(text: org.apache.spark.sql.Column) = {
    val toks = tokens(text)
    val counters = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, b) => c + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  private def hofMinhash(hashes: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      i => coalesce(array_min(transform(hashes, h => xxhash64(i, h))), lit(Long.MaxValue)))

  test("SimHash64Expr is bit-identical to the HOF form on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val diff = docs.select(
      simhash64(col("text")).as("native"), hofSimhash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
    // empty text → empty tokens → all counters 0 → signature 0 on both
    val empty = spark.sql("SELECT '' AS text")
    assert(empty.select(simhash64(col("text"))).first().getLong(0) ==
      empty.select(hofSimhash(col("text"))).first().getLong(0))
  }

  test("MinHashSigExpr is bit-identical to the HOF form, sentinel included") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
      .select(col("doc_id"), shingleHashes(shingles(col("text"), 3)).as("hs"))
    val diff = docs.select(
      minhashFromHashes(col("hs"), 32).as("native"), hofMinhash(col("hs"), 32).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
    // empty shingle set → all-sentinel signature on both
    val empty = spark.sql("SELECT cast(array() as array<bigint>) AS hs")
    assert(empty.select(minhashFromHashes(col("hs"), 4)).first().getSeq[Long](0) ==
      Seq.fill(4)(Long.MaxValue))
    assert(empty.select(hofMinhash(col("hs"), 4)).first().getSeq[Long](0) ==
      Seq.fill(4)(Long.MaxValue))
  }

  test("ShingleHashesExpr is bit-identical to shingleHashes(shingles(...))") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val diff = docs.select(
      wordShingleHashes(col("text"), 3).as("native"),
      shingleHashes(shingles(col("text"), 3)).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
    // under-n-token and empty texts yield empty hash arrays on both forms
    val short = spark.sql("SELECT 'one two' AS text UNION ALL SELECT '' AS text")
    val rows = short.select(
      wordShingleHashes(col("text"), 3).as("native"),
      shingleHashes(shingles(col("text"), 3)).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty)
    }
  }
}
