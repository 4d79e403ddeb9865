package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character-frequency statistics for corpus-quality scoring, as native
 * expressions so a 100 TB scan computes them map-side inside whole-stage
 * codegen (the HOF equivalent — `transform(array_distinct(split(text,'')),
 * c -> size(filter(split(text,''), …)))` — re-evaluates the split per
 * lambda and is quadratic in distinct chars).
 *
 * Both stats are EXACT integers over Unicode code points, so downstream
 * rollups are partitioning-independent and DuckDB-oracle-able — the reason
 * the diversity metric is the Simpson concentration Σc² (a rational number
 * in integer arithmetic) rather than Shannon entropy, whose floating logs
 * would make cross-engine hash equality a coin flip at rounding boundaries.
 */
object CharStat {
  /** Σ count(cp)² over code points of s; 0 for empty. Fits a long for any
   *  realistic document (len ≤ 2^31 ⇒ Σc² ≤ len² ≤ 2^62). */
  def sumSq(s: UTF8String): Long = {
    val str = s.toString
    val m = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val prev = m.get(cp)
      m.put(cp, if (prev == null) 1 else prev + 1)
    }
    var acc = 0L
    val it = m.values().iterator()
    while (it.hasNext) { val c = it.next().toLong; acc += c * c }
    acc
  }

  /** Count of characters in [a-zA-Z ] — byte-exact twin of
   *  `length(regexp_replace(s, "[^a-zA-Z ]", ""))`: every kept char is a
   *  single ASCII byte, and multi-byte UTF-8 sequences (lead and
   *  continuation bytes ≥ 0x80) can never match the ASCII ranges, so a
   *  raw byte scan counts exactly the regex's surviving characters.
   *  Replaces the one regexp in the quality-score hot path — measured
   *  54 µs/doc for the regex vs a linear byte loop (≈ 26.9 s of a 28 s
   *  sf10 corpus scan was this single regexp_replace). */
  def alphaSpaceCount(s: UTF8String): Long = {
    val b = s.getBytes
    var acc = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == ' ') acc += 1L
      i += 1
    }
    acc
  }

  /** Single-pass twin of [[TextFunctions.qualityBp]]'s column form (r12,
   *  guide §4): the column tree evaluates trim/translate/length chains that
   *  each materialize a fresh UTF8String copy per document — measured
   *  9.5-11.9 s of a 0.9 s-floor sf10 corpus scan, the single largest CPU
   *  term in the pipeline/text families. One byte scan computes the same
   *  five integer counts the tree derives, then assembles the IDENTICAL
   *  exact-integer formula:
   *   - chars  = length(s)            (non-continuation bytes = code points)
   *   - spaces/lead/trail of 0x20     (trim and translate(' ') semantics —
   *     Spark's trim removes 0x20 only; multi-byte UTF-8 units are ≥ 0x80
   *     and can never alias an ASCII target)
   *   - punct  = count of . , ; : ! ?
   *   - alpha  = [[alphaSpaceCount]]
   *   - ntok   = spaces-in-trimmed + 1 (0 when the trimmed text is empty)
   *  Bit-equality with the column form is pinned property-style by
   *  CharStatSpec (including tabs/newlines/unicode/empty/all-space). */
  def qualityBp(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    var chars = 0L; var spaces = 0L; var punct = 0L; var alpha = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c & 0xC0) != 0x80) chars += 1L
      if (c == ' ') { spaces += 1L; alpha += 1L }
      else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1L
      else if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1L
      i += 1
    }
    var lead = 0L
    i = 0
    while (i < n && b(i) == ' ') { lead += 1L; i += 1 }
    val allSpace = lead == chars // includes empty: every char was a space
    var trail = 0L
    if (!allSpace) {
      var j = n - 1
      while (j >= 0 && b(j) == ' ') { trail += 1L; j -= 1 }
    }
    val ntok = if (allSpace) 0L else (spaces - lead - trail) + 1L
    val nonspace = chars - spaces
    val len1 = math.max(chars, 1L)
    val m = if (ntok == 0L) 0L else nonspace * 100L / ntok
    val wordBp = if (m >= 300L && m <= 1000L) 2000L else 800L
    val punctBp = if (punct * 10L <= len1) 2000L else 600L
    val num = 4000L * math.min(ntok, 64L) * len1 +
      (wordBp + punctBp) * 64L * len1 + 2000L * alpha * 64L
    val den = 64L * len1
    (num * 2L + den) / (den * 2L)
  }

  /** Single-pass twin of [[TextFunctions.tokenCount]]'s column form:
   *  spaces-inside-the-trimmed-text + 1, 0 when blank — same counting
   *  convention as [[qualityBp]] (single-space-separated corpus words). */
  def tokenCount(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var chars = 0; var spaces = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c & 0xC0) != 0x80) chars += 1
      if (c == ' ') spaces += 1
      i += 1
    }
    var lead = 0
    i = 0
    while (i < n && b(i) == ' ') { lead += 1; i += 1 }
    if (lead == chars) return 0 // blank (or empty) text
    var trail = 0
    var j = n - 1
    while (j >= 0 && b(j) == ' ') { trail += 1; j -= 1 }
    (spaces - lead - trail) + 1
  }

  /** Number of distinct code points in s. */
  def distinctChars(s: UTF8String): Int = {
    val str = s.toString
    val seen = new java.util.HashSet[Integer]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      seen.add(cp)
    }
    seen.size
  }
}

abstract class CharStatExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.catalogString}")
  }
}

/** Σ count(c)² over the code points of a string — the Simpson concentration
 *  numerator. */
case class CharSumSqExpr(child: Expression) extends CharStatExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_sum_sq"
  override def nullSafeEval(input: Any): Any =
    CharStat.sumSq(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStat.sumSq($c)")
  override protected def withNewChildInternal(newChild: Expression): CharSumSqExpr =
    copy(child = newChild)
}

/** Count of [a-zA-Z ] characters — the quality score's alpha mass. */
case class AlphaSpaceCountExpr(child: Expression) extends CharStatExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "alpha_space_count"
  override def nullSafeEval(input: Any): Any =
    CharStat.alphaSpaceCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStat.alphaSpaceCount($c)")
  override protected def withNewChildInternal(newChild: Expression): AlphaSpaceCountExpr =
    copy(child = newChild)
}

/** Fused single-pass quality score in basis points — the exact-integer
 *  twin of the qualityBp column tree (see [[CharStat.qualityBp]]). */
case class QualityBpExpr(child: Expression) extends CharStatExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "quality_bp"
  override def nullSafeEval(input: Any): Any =
    CharStat.qualityBp(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStat.qualityBp($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityBpExpr =
    copy(child = newChild)
}

/** Fused single-pass token count — the exact-integer twin of the
 *  tokenCount column tree (see [[CharStat.tokenCount]]). IntegerType, like
 *  the `length(...) - length(...) + 1` arithmetic it replaces. */
case class TokenCountExpr(child: Expression) extends CharStatExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override def nullSafeEval(input: Any): Any =
    CharStat.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStat.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

/** Distinct code points of a string. */
case class CharDistinctExpr(child: Expression) extends CharStatExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_distinct"
  override def nullSafeEval(input: Any): Any =
    CharStat.distinctChars(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStat.distinctChars($c)")
  override protected def withNewChildInternal(newChild: Expression): CharDistinctExpr =
    copy(child = newChild)
}
