package graft.schemer

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The flagged MAP-inference extension (SURVEY §1.4) and the per-column
 *  witness aggregate: collapse semantics, merge associativity with WMap,
 *  codec round-trip, rendering, and parity (flag off = reference
 *  behavior, untouched). */
class MapWitnessSpec extends AnyFunSuite {

  private def num(v: Int): Witness = WNum(BigDecimal(v), BigDecimal(v), 0)
  private def obj(kvs: (String, Witness)*): Witness = WObj(kvs.toVector)

  test("capObjects collapses a wide uniform object past the threshold") {
    val wide = obj((1 to 10).map(i => s"u$i" -> num(i)): _*)
    assert(Witness.capObjects(wide, 8) == WMap(WNum(BigDecimal(1), BigDecimal(10), 0)))
    // at or below the threshold: unchanged
    assert(Witness.capObjects(wide, 10) == wide)
    // threshold 0 = off
    assert(Witness.capObjects(wide, 0) == wide)
  }

  test("capObjects keeps mixed-type wide objects as structs") {
    val mixed = obj(((1 to 9).map(i => s"u$i" -> num(i)) :+ ("s" -> (WStr(3): Witness))): _*)
    assert(Witness.capObjects(mixed, 8) == mixed,
      "key count alone is not evidence the keys are data")
  }

  test("capObjects recurses into nested objects and arrays") {
    val nested = obj("outer" -> obj((1 to 9).map(i => s"k$i" -> num(i)): _*),
      "arr" -> WArr(obj((1 to 9).map(i => s"k$i" -> num(i)): _*)))
    val capped = Witness.capObjects(nested, 8)
    assert(capped == obj(
      "outer" -> WMap(WNum(BigDecimal(1), BigDecimal(9), 0)),
      "arr" -> WArr(WMap(WNum(BigDecimal(1), BigDecimal(9), 0)))))
  }

  test("merge is associative across partials that collapsed at different times") {
    val a = obj((1 to 9).map(i => s"a$i" -> num(i)): _*)
    val b = obj((10 to 12).map(i => s"b$i" -> num(i)): _*)
    val collapsedFirst = Witness.merge(Witness.capObjects(a, 8), b)
    val collapsedLater = Witness.capObjects(Witness.merge(a, b), 8)
    assert(Witness.capObjects(collapsedFirst, 8) == collapsedLater)
    assert(collapsedLater == WMap(WNum(BigDecimal(1), BigDecimal(12), 0)))
  }

  test("WMap round-trips through the codec and renders MAP<STRING, T>") {
    val w = WMap(WNum(BigDecimal(0), BigDecimal(5000), 0))
    assert(WitnessCodec.read(WitnessCodec.write(w)) == w)
    assert(HiveRender.renderType(w) == "MAP<STRING,\n\tSMALLINT\n>")
    assert(HiveRender.toSparkType(w) ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.ShortType, valueContainsNull = true))
  }

  test("capObjects is idempotent and stable under partition splits (property)") {
    // deterministic pseudo-random wide objects: key universe u0..u39,
    // values all numeric (uniform), so any >threshold subset collapses
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val nDocs = 1 + rnd.nextInt(12)
      val docs = Vector.fill(nDocs) {
        val keys = rnd.shuffle((0 until 40).toVector).take(1 + rnd.nextInt(15))
        WObj(keys.map(k => s"u$k" -> num(rnd.nextInt(1000))))
      }
      val threshold = 1 + rnd.nextInt(12)
      def fold(ws: Seq[Witness]): Witness =
        ws.foldLeft(Witness.bottom)((a, b) =>
          Witness.capObjects(Witness.merge(a, b), threshold))
      val sequential = fold(docs)
      // idempotence
      assert(Witness.capObjects(sequential, threshold) == sequential)
      // split at a random point, fold halves independently (two "partial
      // aggregates" that may collapse at different times), merge+cap —
      // must equal the sequential fold
      val cut = rnd.nextInt(nDocs + 1)
      val (l, r) = docs.splitAt(cut)
      val split = Witness.capObjects(Witness.merge(fold(l), fold(r)), threshold)
      assert(split == sequential, s"split fold diverged (cut=$cut, t=$threshold)")
    }
  }

  test("infer_hive_type_mapped collapses key-as-data JSON; plain infer does not") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = (0 until 50).map(i => s"""{"u$i": $i}""").toDF("j")
    val mapped = docs.agg(
      graft.schemer.InferSchema.infer_hive_type_mapped($"j", 8)).first().getString(0)
    assert(mapped == "MAP<STRING,\n\tTINYINT\n>")
    val plain = docs.agg(
      graft.schemer.InferSchema.infer_hive_type($"j")).first().getString(0)
    assert(plain.startsWith("STRUCT<") && plain.contains("u49: TINYINT"),
      "flag off must keep the reference struct witness")
  }

  test("infer_column_types emits (col_name, hive_type) rows in first-seen order") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      """{"id": 1, "name": "ab"}""",
      """{"id": 300, "name": "abcd", "extra": true}""").toDF("j")
    val rows = docs.agg(graft.schemer.InferSchema.infer_column_types($"j").as("c"))
      .select(explode($"c").as("c")).select("c.col_name", "c.hive_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      ("id", "SMALLINT"), ("name", "VARCHAR(4)"), ("extra", "BOOLEAN")))
  }

  test("infer_column_types yields no rows for a non-object top level") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq("1", "2").toDF("j")
    val n = docs.agg(graft.schemer.InferSchema.infer_column_types($"j").as("c"))
      .select(explode($"c")).count()
    assert(n == 0)
  }
}
