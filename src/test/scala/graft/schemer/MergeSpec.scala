package graft.schemer

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for every arm of the witness merge lattice
 *  (reference `/root/reference/Schemer.scala:43-63`) and array
 *  canonicalization (`prepare`, Schemer.scala:32-41). */
class MergeSpec extends AnyFunSuite {
  import Witness.{merge, ofJson}

  test("null is bottom: merge(null, x) == x == merge(x, null)") {
    val x = WStr(5)
    assert(merge(WNull, x) == x)
    assert(merge(x, WNull) == x)
    assert(merge(WNull, WNull) == WNull)
  }

  test("boolean join") {
    assert(merge(WBool, WBool) == WBool)
  }

  test("string join keeps the longer length") {
    assert(merge(WStr(3), WStr(7)) == WStr(7))
    assert(merge(WStr(7), WStr(3)) == WStr(7))
  }

  test("number join tracks min, max, max scale") {
    val a = WNum(BigDecimal("12345678901234.5"), BigDecimal("12345678901234.5"), 1)
    val b = WNum(BigDecimal("0.12"), BigDecimal("0.12"), 2)
    val m = merge(a, b).asInstanceOf[WNum]
    assert(m.max == BigDecimal("12345678901234.5"))
    assert(m.min == BigDecimal("0.12"))
    assert(m.maxScale == 2)
    // widened witness reproduces the reference NUMERIC(16,2) (README.md:42)
    assert(m.precision == 16)
  }

  test("array join merges element witnesses") {
    assert(merge(WArr(WStr(2)), WArr(WStr(4))) == WArr(WStr(4)))
    assert(merge(WArr(WNull), WArr(WStr(4))) == WArr(WStr(4)))
  }

  test("object join is key-union with first-seen order") {
    val a = WObj(Vector("x" -> WStr(1), "y" -> WNum(1, 1, 0)))
    val b = WObj(Vector("y" -> WNum(2, 2, 0), "z" -> WBool))
    val m = merge(a, b).asInstanceOf[WObj]
    assert(m.fields.map(_._1) == Vector("x", "y", "z"))
    assert(m.get("y").contains(WNum(1, 2, 0)))
  }

  test("shape conflict raises RowMismatch") {
    assertThrows[RowMismatch](merge(WArr(WStr(5)), WObj(Vector("first" -> WStr(3)))))
    assertThrows[RowMismatch](merge(WStr(1), WBool))
    assertThrows[RowMismatch](merge(WNum(1, 1, 0), WStr(1)))
  }

  test("ofJson: scalars") {
    assert(ofJson("""{"b":true}""") == WObj(Vector("b" -> WBool)))
    assert(ofJson("""{"s":"Rok"}""") == WObj(Vector("s" -> WStr(3))))
    assert(ofJson("""{"n":null}""") == WObj(Vector("n" -> WNull)))
    val n = ofJson("""{"n":1234.5434}""").asInstanceOf[WObj].get("n").get.asInstanceOf[WNum]
    assert(n.max == BigDecimal("1234.5434") && n.maxScale == 4)
  }

  test("ofJson: unicode string length is UTF-16 units like the reference") {
    assert(ofJson("""{"name":"Jožica"}""") == WObj(Vector("name" -> WStr(6))))
  }

  test("ofJson: big decimal survives parsing without double rounding") {
    val n = ofJson("""{"num":12345678901234.5}""").asInstanceOf[WObj].get("num").get.asInstanceOf[WNum]
    assert(n.max == BigDecimal("12345678901234.5"))
    // 15 significant digits survive (a double-rounding parse would mangle
    // them); merging with 0.12 later widens to p16 s2 (README.md:42)
    assert(n.max.precision == 15)
    assert(n.maxScale == 1)
  }

  test("array canonicalization: empty array becomes ARRAY<???>") {
    assert(ofJson("""{"cars":[]}""") == WObj(Vector("cars" -> WArr(WNull))))
  }

  test("array canonicalization: homogeneous fold") {
    assert(ofJson("""{"a":[1, 12.345]}""").asInstanceOf[WObj].get("a").get ==
      WArr(WNum(BigDecimal(1), BigDecimal("12.345"), 3)))
  }

  test("array canonicalization: mixed types raise InconsistentArray") {
    assertThrows[InconsistentArray](ofJson("""{"a":["a", {"b":1}]}"""))
  }

  test("mismatched array element witnesses across rows raise RowMismatch") {
    // reference parity: prepare's InconsistentArray wrap covers only the
    // INTRA-row element fold (Schemer.scala:32-41); a cross-row element
    // conflict propagates from merge as RowMismatch (Schemer.scala:53)
    assertThrows[RowMismatch](merge(WArr(WStr(5)), WArr(WBool)))
  }
}
