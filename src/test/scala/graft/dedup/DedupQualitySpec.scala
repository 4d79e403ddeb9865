package graft.dedup

import graft.SparkTestSession
import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end quality guarantees for the three dedup tiers whose outputs are
 * hash-keyed and therefore carry no SQL oracle — each gets the strongest
 * statement its algorithm actually makes:
 *  - SimHash + 4×16-bit pigeonhole is COMPLETE for hamming ≤ 3 (any two
 *    64-bit signatures differing in ≤3 bits agree on ≥1 chunk), so the
 *    query output must EQUAL the brute-force all-pairs answer.
 *  - MinHash LSH (8 bands × 4 rows) is probabilistic, but at J ≥ 0.9 the
 *    per-pair catch probability is 1−(1−0.9⁴)⁸ ≈ 0.9998 — every truly
 *    near-identical pair in the corpus must be emitted, and the estimate
 *    must track exact shingle-set Jaccard.
 *  - Embedding near-dup pairs must reproduce their exact cosine and the
 *    is_dup verdict.
 */
class DedupQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("simhash pigeonhole output EQUALS brute-force hamming<=3 pairs") {
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash64(col("text")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield {
      val (a, b) = (sigs(i)._1, sigs(j)._1)
      (math.min(a, b), math.max(a, b)) -> h.toLong
    }).toMap
    val got = Dedup.simhashDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(expected.nonEmpty, "test premise: corpus contains near-dup signatures")
  }

  test("minhash LSH catches every exact-Jaccard>=0.9 pair; estimates track truth") {
    val shingleSets = Tables.documents(spark, dir)
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), wordShingleHashes(col("text"), 3).as("hs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
    def jac(a: Set[Long], b: Set[Long]): Double =
      if (a.isEmpty && b.isEmpty) 0.0 else a.intersect(b).size.toDouble / a.union(b).size
    val highJ = (for {
      i <- shingleSets.indices.iterator
      j <- (i + 1) until shingleSets.length
      if jac(shingleSets(i)._2, shingleSets(j)._2) >= 0.9
    } yield (math.min(shingleSets(i)._1, shingleSets(j)._1),
      math.max(shingleSets(i)._1, shingleSets(j)._1))).toSet
    val emitted = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(highJ.nonEmpty, "test premise: corpus contains near-identical docs")
    val missed = highJ.diff(emitted.keySet)
    assert(missed.isEmpty, s"LSH missed high-Jaccard pairs: $missed")
    // k=32 estimator: sd ≈ √(J(1−J)/32) ≤ 0.09; 0.35 is a ~4σ band
    val bySet = shingleSets.toMap
    emitted.foreach { case ((a, b), est) =>
      val exact = jac(bySet(a), bySet(b))
      assert(math.abs(est - exact) <= 0.35, f"pair ($a,$b): est $est%.2f vs exact $exact%.2f")
    }
  }

  test("containment EQUALS brute-force directed shingle containment >= 0.8") {
    val sets = Tables.documents(spark, dir)
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), wordShingleHashes(col("text"), 3).as("hs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
    // mirror the query's stop-shingle cap: shingles in >100 docs are
    // excluded from intersections, NOT from the |sub| denominator
    val docFreq = sets.iterator.flatMap(_._2).toSeq.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val hot = docFreq.collect { case (s, n) if n > 100 => s }.toSet
    val expected = (for {
      (a, sa) <- sets.iterator
      (b, sb) <- sets.iterator
      if a != b && sa.size >= 5
      inter = (sa -- hot).intersect(sb -- hot).size.toLong
      bp = (2 * inter * 10000 + sa.size) / (2 * sa.size)
      if bp >= 8000
    } yield (a, b) -> bp).toMap
    val got = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(expected.nonEmpty, "test premise: corpus contains containment relations")
    assert(got == expected, s"got ${got.size} directed pairs, expected ${expected.size}")
  }

  test("span dedup EQUALS the brute-force tumbling-segment reference") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).trim))
    val segs = docs.flatMap { case (id, src, t) =>
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
      toks.grouped(10).map(g => (id, src, g.mkString(" "), g.length.toLong))
    }
    val crossDocCount = segs.groupBy(_._3).map { case (s, xs) => s -> xs.map(_._1).distinct.length }
    val expected = segs.groupBy(_._2).map { case (src, xs) =>
      (src, xs.length.toLong,
        xs.count(x => crossDocCount(x._3) > 1).toLong,
        xs.map(_._4).sum,
        xs.filter(x => crossDocCount(x._3) == 1).map(_._4).sum)
    }.toSeq.sortBy(_._1)
    val got = Dedup.spanDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(expected.exists(_._3 > 0), "test premise: cross-doc duplicated spans exist")
    assert(got == expected)
  }

  test("semantic dedup EQUALS brute-force within-cell cosine >= 0.3") {
    val emb = Tables.embeddings(spark, dir)
    // the same corpus-scaled k = max(16, ceil(sqrt(n))) the entry uses
    val k = math.max(16, math.ceil(math.sqrt(emb.count().toDouble)).toInt)
    val centroids = graft.similarity.Ann.kmeansCentroids(emb, k, 3)
    val assigned = graft.similarity.Ann.assignCells(emb, centroids)
      .select(col("cell"), col("vec_id"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      while (i < x.length) {
        val xv = x(i).toDouble; val yv = y(i).toDouble
        xy += xv * yv; xx += xv * xv; yy += yv * yv; i += 1
      }
      val d = math.sqrt(xx) * math.sqrt(yy)
      if (d == 0.0) 0.0 else xy / d
    }
    val expected = assigned.groupBy(_._1).valuesIterator.flatMap { cell =>
      val sorted = cell.sortBy(_._2)
      for {
        j <- sorted.indices
        i <- 0 until j
        if cos(sorted(i)._3, sorted(j)._3) >= 0.3
      } yield (sorted(j)._2, sorted(i)._2)
    }.toSeq.groupBy(_._1)
      .map { case (dup, xs) => dup -> (xs.map(_._2).min, xs.size.toLong) }
    val got = Dedup.semanticDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.nonEmpty, "test premise: clusters contain semantic near-dups")
    assert(got == expected, s"got ${got.size} dups, expected ${expected.size}")
  }

  test("embedding near-dup pairs reproduce exact cosines and verdicts") {
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      while (i < x.length) {
        val xv = x(i).toDouble; val yv = y(i).toDouble
        xy += xv * yv; xx += xv * xv; yy += yv * yv; i += 1
      }
      val d = math.sqrt(xx) * math.sqrt(yy)
      if (d == 0.0) 0.0 else xy / d
    }
    val rows = Dedup.embeddingNearDup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val expected = cos(embs(a), embs(b))
      assert(math.abs(r.getDouble(3) - expected) < 1e-12, s"pair ($a,$b)")
      assert(r.getBoolean(2) == (r.getDouble(3) >= 0.9))
    }
  }

  test("adversarial viral shingle: candidate volume bounded, true-pair recall intact") {
    // 5000 docs, 20 disjoint shingles each; a VIRAL shingle rides in 20%
    // of them (1000 docs — without the >100-doc stop-shingle cap it alone
    // would witness 1000*999/2 ~ 500k candidate pairs). Ten planted true
    // near-dup pairs share 19 of 20 shingles through NON-viral hashes.
    import spark.implicits._
    val nDocs = 5000
    val base = (0 until nDocs).flatMap { d =>
      val own = (0 until 20).map(k => (d.toLong, (1000000L + d * 100L + k)))
      val viral = if (d % 5 == 0) Seq((d.toLong, 7777L)) else Seq.empty
      own ++ viral
    }
    // planted pairs: doc 2i+1 copies doc 2i's first 19 shingles (i < 10),
    // using ODD ids so the copies never also carry the viral shingle
    val planted = (0 until 10).flatMap { i =>
      val src = 2 * i; val dst = (10000 + 2 * i + 1).toLong
      (0 until 19).map(k => (dst, 1000000L + src * 100L + k)) :+ (dst, 999L + dst)
    }
    val shingles = (base ++ planted).toDF("doc_id", "sh").repartition(13)
    val counts = shingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = Dedup.shinglePairCountsOn(shingles, counts)
      .select("id_a", "id_b", "inter", "n_a", "n_b").collect()
    // bounded: ONLY the ten planted pairs survive as candidates — the
    // viral shingle is capped out, disjoint docs share nothing
    assert(pairs.length == 10, s"candidate volume ${pairs.length}, want 10")
    val got = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0 until 10).foreach { i =>
      val key = (2L * i, (10000 + 2 * i + 1).toLong)
      assert(got.get(key).contains(19L), s"planted pair $key missing or wrong inter")
    }
    // and every pair carries the exact set sizes for downstream scoring
    pairs.foreach { r => assert(r.getLong(3) >= 19L && r.getLong(4) >= 19L) }
  }
}
