package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import TextFunctions._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")
  }

  test("tokens and tokenCount") {
    import spark.implicits._
    val df = Seq("a bb  ccc", "", "   ", "solo").toDF("t")
      .select(col("t"), tokenCount(col("t")).as("n"), size(tokens(col("t"))).as("m"))
    val got = df.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // tokenCount = spaces+1 (4 on the double-spaced string), tokens() splits
    // on runs (3). The corpus is single-spaced, where the two agree; the
    // arithmetic form exists so SQL oracles can replicate it exactly.
    assert(got.toSet == Set(("a bb  ccc", 4, 3), ("", 0, 0), ("   ", 0, 0), ("solo", 1, 1)))
  }

  test("langId picks the marker-dominant language") {
    assert(one[String](langId(col("t")), "the cat and the dog of the house") == "en")
    assert(one[String](langId(col("t")), "el perro y la casa de los gatos") == "es")
    assert(one[String](langId(col("t")), "xyzzy plugh") == "und")
  }

  test("punctCount and meanTokenLenX100") {
    assert(one[Int](punctCount(col("t")), "a, b. c!?") == 4)
    assert(one[Long](meanTokenLenX100(col("t")).cast("long"), "ab cd") == 200L)
    assert(one[Long](meanTokenLenX100(col("t")).cast("long"), "") == 0L)
  }

  test("alphaSpaceCount equals the regexp it replaced, unicode included (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val alphabet = "abzAZ .,!?0çé漢🙂\n\té"
    val samples = ("" +: "héllo wörld" +: (1 to 200).map(_ =>
      (1 to rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
    val got = samples.toDF("t")
      .select(
        org.apache.spark.sql.graft.ColumnBridge.column(
          AlphaSpaceCountExpr(org.apache.spark.sql.graft.ColumnBridge.expression(col("t")))).as("fast"),
        length(regexp_replace(col("t"), "[^a-zA-Z ]", "")).cast("long").as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("qualityScore is in [0,1] and favors clean text") {
    val clean = one[Double](qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and keeps on running far")
    val junk = one[Double](qualityScore(col("t")), "!!!!....;;;;::::!!!!")
    assert(clean > junk && clean <= 1.0 && junk >= 0.0)
  }

  test("fingerprint is whitespace-insensitive, content-sensitive") {
    val a = one[Long](fingerprint(col("t")), "a b  c")
    val b = one[Long](fingerprint(col("t")), " a b c ")
    val c = one[Long](fingerprint(col("t")), "a b d")
    assert(a == b && a != c)
  }

  test("fingerprintMd5 induces the same grouping as the 64-bit fingerprint") {
    import spark.implicits._
    val docs = Seq("a b  c", " a b c ", "a b d", "", "  ", "x", "x ", "a b d  ")
    val df = docs.toDF("t")
      .select(fingerprint(col("t")).as("f64"), fingerprintMd5(col("t")).as("fmd5"))
    // equal partitions: every f64 class maps to exactly one md5 class and back
    assert(df.select("f64", "fmd5").distinct().count() == df.select("f64").distinct().count())
    assert(df.select("f64").distinct().count() == df.select("fmd5").distinct().count())
    // whitespace-only and empty collapse together; md5('') of the empty join
    val m = docs.map(d => d -> Seq(d).toDF("t").select(fingerprintMd5(col("t"))).collect()(0).getString(0)).toMap
    assert(m("") == m("  ") && m("x") == m("x ") && m("a b d") == m("a b d  "))
  }

  test("shingles produce word n-grams") {
    import spark.implicits._
    def sh(t: String): Seq[String] =
      Seq(t).toDF("t").select(shingles(col("t"), 3).as("r")).collect()(0).getSeq[String](0)
    assert(sh("a b c d") == Seq("a b c", "b c d"))
    assert(sh("a b") == Seq.empty)
  }

  test("minhash similarity estimates Jaccard ordering") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i j"), // identical
      ("a b c d e f g h i j", "a b c d e f g h i k"), // near
      ("a b c d e f g h i j", "z y x w v u t s r q")  // disjoint
    ).toDF("x", "y").select(
      minhashSimilarity(minhash(shingles(col("x"), 2), 32), minhash(shingles(col("y"), 2), 32)).as("est"))
    val Array(same, near, far) = df.collect().map(_.getDouble(0))
    assert(same == 1.0 && near > far)
  }

  test("simhash: identical texts agree, similar texts are close") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e f g h", "a b c d e f g h"),
      ("a b c d e f g h", "a b c d e f g z"),
      ("a b c d e f g h", "q r s t u v w x")
    ).toDF("x", "y").select(hamming64(simhash64(col("x")), simhash64(col("y"))).as("d"))
    val Array(same, near, far) = df.collect().map(r => r.getInt(0))
    assert(same == 0 && near < far)
  }

  test("cosine: orthogonal, identical, zero vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(0.0, 0.0), Seq(1.0, 2.0))
    ).toDF("a", "b").select(cosine(col("a"), col("b")).as("c"))
    val Array(orth, same, zero) = df.collect().map(_.getDouble(0))
    assert(math.abs(orth) < 1e-12 && math.abs(same - 1.0) < 1e-12 && zero == 0.0)
  }

  test("hyperplaneSig is deterministic and within bit range") {
    import spark.implicits._
    val df = Seq(Seq.fill(64)(0.25), Seq.fill(64)(-0.25)).toDF("v")
      .select(hyperplaneSig(col("v"), 8, 64).as("s"))
    val sigs = df.collect().map(_.getInt(0))
    assert(sigs.forall(s => s >= 0 && s < 256))
    // antipodal vectors get complementary signatures
    assert((sigs(0) ^ sigs(1)) == 255)
  }
}
