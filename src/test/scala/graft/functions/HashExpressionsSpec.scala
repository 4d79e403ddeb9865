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

  test("LangIdExpr matches the HOF marker-argmax, tiebreak and 'und' included") {
    // inline HOF reference (the replaced form)
    val markers = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "por"),
      "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
      "fr" -> Seq("le", "la", "les", "des", "est", "dans", "pour", "une"),
      "it" -> Seq("il", "di", "che", "la", "per", "con", "del", "una"))
    def hofLangId(text: org.apache.spark.sql.Column) = {
      val counts = aggregate(
        tokens(text),
        array(markers.map(_ => lit(0)): _*),
        (acc, t) => array(markers.zipWithIndex.map { case ((_, ws), i) =>
          acc(i) + when(t.isin(ws: _*), 1).otherwise(0)
        }: _*))
      val names = array(markers.map { case (lang, _) => lit(lang) }: _*)
      transform(array(counts), c =>
        when(array_max(c) > 0,
          element_at(names, array_position(c, array_max(c)).cast("int")))
          .otherwise(lit("und"))).getItem(0)
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(langId(col("text")).as("native"), hofLangId(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
    // 'la' appears in es, fr AND it marker lists: first-max tiebreak must pick es
    val tie = spark.sql("SELECT 'la la la' AS text")
    assert(tie.select(langId(col("text"))).first().getString(0) == "es")
    assert(tie.select(hofLangId(col("text"))).first().getString(0) == "es")
    assert(spark.sql("SELECT 'zzz qqq' AS text").select(langId(col("text"))).first().getString(0) == "und")
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
