package graft.schemer

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (ScalaCheck generators, deterministic seeds) for the
 *  lattice laws that make the distributed merge legal (SURVEY.md §5.2-3):
 *  associativity, commutativity up to rendered type, idempotence, bottom
 *  identity, and sequential-fold == any-partitioning-fold. */
class LatticeLawsSpec extends AnyFunSuite {

  private val Trials = 300

  /** Deterministically draw `n` samples from a generator. */
  private def samples[A](g: Gen[A], n: Int = Trials): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // Generators for structurally COMPATIBLE witnesses: fix one shape (field →
  // leaf kind) per case and generate all operands within it, so merge never
  // throws RowMismatch.
  private def genOfKind(kind: Int, depth: Int): Gen[Witness] = kind match {
    case 0 => Gen.const(WBool)
    case 1 => Gen.choose(0, 70000).map(WStr(_))
    case 2 => for {
      a <- Gen.choose(-1e18, 1e18).map(x => BigDecimal(x.toLong))
      b <- Gen.choose(-1e18, 1e18).map(x => BigDecimal(x.toLong))
      s <- Gen.choose(0, 6)
    } yield WNum((a min b).setScale(s), (a max b).setScale(s), s)
    // kind 6 mixes the flagged timestamp witness with plain strings inside
    // ONE shape — the WTs⊔WTs join AND the WTs→WStr demotion must both
    // satisfy every law (demotion keeps max length, so order can't matter)
    case 6 => Gen.oneOf(
      Gen.zip(Gen.choose(8, 40), Gen.oneOf(true, false)).map { case (l, d) => WTs(l, d) },
      Gen.choose(0, 70000).map(WStr(_)))
    // kinds 3..5 are arrays of leaf kind (k-3): the SHAPE fixes the element
    // kind, so two operands of the same shape always have compatible arrays
    // (a per-operand random element kind would make merge legitimately throw
    // InconsistentArray, which is not a lattice-law violation)
    case k if depth > 0 => genOfKind(k - 3, depth - 1).map(WArr(_))
    case _ => Gen.choose(0, 70000).map(WStr(_))
  }

  private def genObj(shape: Map[String, Int]): Gen[Witness] = {
    val fieldGens = shape.toVector.sortBy(_._1).map { case (k, kind) =>
      Gen.frequency[Witness](4 -> genOfKind(kind, 2), 1 -> Gen.const(WNull)).map(k -> _)
    }
    fieldGens.foldLeft(Gen.const(Vector.empty[(String, Witness)])) { (acc, g) =>
      for { v <- acc; f <- g } yield v :+ f
    }.map(WObj(_))
  }

  private val genShape: Gen[Map[String, Int]] = Gen.nonEmptyMap(
    Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.choose(0, 6)))

  private def rendered(w: Witness): String = HiveRender.renderType(w)

  test("bottom identity") {
    samples(genShape.flatMap(genObj)).foreach { w =>
      assert(Witness.merge(WNull, w) == w)
      assert(Witness.merge(w, WNull) == w)
    }
  }

  test("idempotence up to rendered type") {
    samples(genShape.flatMap(genObj)).foreach { w =>
      assert(rendered(Witness.merge(w, w)) == rendered(w))
    }
  }

  test("commutativity up to rendered type") {
    val g = for { s <- genShape; a <- genObj(s); b <- genObj(s) } yield (a, b)
    samples(g).foreach { case (a, b) =>
      assert(rendered(Witness.merge(a, b)) == rendered(Witness.merge(b, a)))
    }
  }

  test("associativity up to rendered type") {
    val g = for { s <- genShape; a <- genObj(s); b <- genObj(s); c <- genObj(s) } yield (a, b, c)
    samples(g).foreach { case (a, b, c) =>
      val l = Witness.merge(Witness.merge(a, b), c)
      val r = Witness.merge(a, Witness.merge(b, c))
      assert(rendered(l) == rendered(r))
    }
  }

  test("toSparkType is total and always constructs a valid type") {
    import org.apache.spark.sql.types.DecimalType
    // include extreme scales/precisions: the tiny-fraction class used to
    // construct DecimalType(p, s>p) and crash
    val genNum = for {
      a <- Gen.choose(-1e18, 1e18).map(BigDecimal(_))
      s <- Gen.choose(0, 45)
    } yield WNum(a.min(0).setScale(s), a.max(0).setScale(s), s)
    val gen = Gen.oneOf(genNum, genShape.flatMap(genObj))
    samples(gen).foreach { w =>
      val t = HiveRender.toSparkType(w) // must not throw
      def valid(dt: org.apache.spark.sql.types.DataType): Unit = dt match {
        case d: DecimalType => assert(d.scale <= d.precision && d.precision <= 38)
        case s: org.apache.spark.sql.types.StructType => s.fields.foreach(f => valid(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => valid(a.elementType)
        case _ =>
      }
      valid(t)
    }
  }

  test("any partitioning of a row list folds to the same rendered type") {
    val g = for {
      s <- genShape
      rows <- Gen.listOfN(12, genObj(s))
      cut1 <- Gen.choose(0, rows.length)
      cut2 <- Gen.choose(0, rows.length)
    } yield (rows, cut1 min cut2, cut1 max cut2)
    samples(g, 150).foreach { case (rows, c1, c2) =>
      val seq = rows.foldLeft(Witness.bottom)(Witness.merge(_, _))
      val dist = Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.drop(c2))
        .map(_.foldLeft(Witness.bottom)(Witness.merge(_, _)))
        .foldLeft(Witness.bottom)(Witness.merge(_, _))
      assert(rendered(seq) == rendered(dist))
    }
  }
}
