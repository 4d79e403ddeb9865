package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd signature expressions for the dedup hot path. Both
 * reproduce their HOF predecessors BIT-IDENTICALLY by composing Spark's own
 * XXH64 exactly the way the `xxhash64(...)` expression does (seed 42,
 * children folded left-to-right), so signatures — and therefore bucket
 * assignments and candidate pairs — are unchanged; only the per-row cost
 * drops (interpreted per-element lambdas with per-step array allocation →
 * one fused primitive loop).
 */

/** 64-bit SimHash over a token array: per token hash, per bit ±1 counters,
 *  sign-packed. Replaces an `aggregate` whose lambda allocated a 64-element
 *  counter array per token. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      // xxhash64(null) leaves the seed untouched — mirror it
      val h = if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counters = ctx.freshName("counters")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $counters = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 42L : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counters[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** MinHash signature from pre-hashed shingles: k seed-mixed minima in one
 *  fused k×n loop. Mirrors `transform(sequence(0,k-1), i =>
 *  coalesce(array_min(transform(hs, h => xxhash64(i, h))), MaxValue))`:
 *  per seed i the fold is hashInt(i, 42) then hashLong(h, ·), and an empty
 *  input yields the all-sentinel signature. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "minhash k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${dt.catalogString}")
  }

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seedH = XXH64.hashInt(i, 42L)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        // xxhash64(i, null) folds only the first child — mirror it
        val h = if (arr.isNullAt(j)) seedH else XXH64.hashLong(arr.getLong(j), seedH)
        if (h < m) m = h
        j += 1
      }
      mins(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val seedH = ctx.freshName("seedH")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $seedH = $xxh.hashInt($i, 42L);
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $a.isNullAt($j) ? $seedH : $xxh.hashLong($a.getLong($j), $seedH);
         |    if ($h < $m) $m = $h;
         |  }
         |  $mins[$i] = $m;
         |}
         |${ev.value} = $uad.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Word-n-gram shingle hashes straight off the token array: one fused loop
 *  building each "w1 w2 … wn" join and hashing it, replacing the
 *  interpreted `transform(sequence(...), i => xxhash64(array_join(slice(
 *  toks, i, n), " ")))` chain. Bit-identical: `UTF8String.concatWs` has
 *  exactly `array_join`'s null-skipping semantics, and the hash is the same
 *  seed-42 XXH64 over the joined string. Fewer than n tokens → empty. */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "shingle_hashes"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](cnt - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val sepRef = ctx.addReferenceObj("shingleSep", sep, utf8)
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      s"""
         |int $cnt = $a.numElements();
         |long[] $out = new long[$cnt < $n ? 0 : $cnt - ${n - 1}];
         |$utf8[] $parts = new $utf8[$n];
         |for (int $i = 0; $i <= $cnt - $n; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $xxh.hashUTF8String($utf8.concatWs($sepRef, $parts), 42L);
         |}
         |${ev.value} = $uad.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Marker-argmax language ID over a token array: per token, one hash-set
 *  membership probe per language; argmax with first-max tiebreak, "und"
 *  when nothing matches. Replaces an `aggregate` whose lambda rebuilt a
 *  5-element counter array per token with 5 `isin` list scans. */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects array<string>, got ${dt.catalogString}")
  }

  override def prettyName: String = "lang_id"

  @transient private lazy val markerSets: Array[java.util.HashSet[UTF8String]] =
    langs.map { case (_, ws) =>
      val set = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => set.add(UTF8String.fromString(w)))
      set
    }.toArray

  @transient private lazy val names: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray

  private val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nLangs = markerSets.length
    val counts = new Array[Int](nLangs)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var l = 0
        while (l < nLangs) {
          if (markerSets(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      i += 1
    }
    var best = 0
    var bi = -1
    var l = 0
    while (l < nLangs) {
      if (counts(l) > best) { best = counts(l); bi = l } // strict > keeps FIRST max
      l += 1
    }
    if (best > 0) names(bi) else und
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val utf8 = classOf[UTF8String].getName
      val setsRef = ctx.addReferenceObj("markerSets", markerSets, "java.util.HashSet[]")
      val namesRef = ctx.addReferenceObj("langNames", names, s"$utf8[]")
      val undRef = ctx.addReferenceObj("undLang", und, utf8)
      val nLangs = markerSets.length
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val l = ctx.freshName("l")
      val t = ctx.freshName("t")
      val counts = ctx.freshName("counts")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$nLangs];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $utf8 $t = $a.getUTF8String($i);
         |    for (int $l = 0; $l < $nLangs; $l++) {
         |      if ($setsRef[$l].contains($t)) $counts[$l]++;
         |    }
         |  }
         |}
         |int $best = 0; int $bi = -1;
         |for (int $l = 0; $l < $nLangs; $l++) {
         |  if ($counts[$l] > $best) { $best = $counts[$l]; $bi = $l; }
         |}
         |${ev.value} = ($best > 0) ? $namesRef[$bi] : $undRef;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
