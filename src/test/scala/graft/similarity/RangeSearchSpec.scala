package graft.similarity

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Radius search against a sequential reimplementation of the identical
 *  quantized-integer threshold — membership must match EXACTLY (the whole
 *  point of the integer formulation), and the quantized decision must
 *  agree with float cosine away from the threshold knife edge. */
class RangeSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ann_hybrid_rrf equals the sequential shortlist-fusion reference") {
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = vecs.toMap
    val recShort = vecs.map(_._1).sorted.reverse.take(20).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val expected = (for (q <- vecs.map(_._1).filter(_ < 8)) yield {
      val cosShort = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val cands = (cosShort.keySet ++ (recShort.keySet - q))
      cands.toSeq.map { id =>
        val s = cosShort.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
          recShort.filterKeys(_ != q).get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (id, s)
      }.sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, s), i) => (q, id, s, i + 1L) }
    }).flatten.toSeq
    val got = Ann.hybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists { case (_, id, _, _) => recShort.contains(id) },
      "test premise: recency actually surfaces something cosine missed")
  }

  test("ann_range_search equals the sequential quantized-integer reference") {
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def quant(v: Array[Float]): Array[Long] = {
      val s = v.map(x => math.abs(x.toDouble)).max
      if (s == 0.0) v.map(_ => 0L)
      else v.map(x => math.floor(127.0 * x.toDouble / s + 0.5).toLong)
    }
    val q = vecs.map { case (id, v) => (id, quant(v)) }
    val n2 = q.map { case (id, qq) => id -> qq.map(x => x * x).sum }.toMap
    val expected = (for {
      (qid, qv) <- q if qid < 8
      (nid, nv) <- q if nid != qid
      dot = qv.zip(nv).map { case (a, b) => a * b }.sum
      if dot > 0 && dot * dot * 10000L >= 900L * n2(qid) * n2(nid)
    } yield {
      val den = n2(qid) * n2(nid)
      (qid, nid, (2 * dot * dot * 10000L + den) / (2 * den))
    }).sortBy(t => (t._1, t._2)).toSeq
    val got = Ann.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "test premise: some neighbor clears τ = 0.30")
    // sanity: every returned pair's FLOAT cosine is near/above τ (the int8
    // grid can move a true cosine by O(1/127) but not more)
    val byId = vecs.toMap
    for ((a, b, _) <- got) {
      val (va, vb) = (byId(a), byId(b))
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val cos = dot / (math.sqrt(va.map(x => x.toDouble * x).sum) * math.sqrt(vb.map(x => x.toDouble * x).sum))
      assert(cos > 0.27, s"pair ($a,$b) float cosine $cos far below threshold")
    }
  }

  test("ann_range_ivf equals brute-force range search on the real corpus") {
    val got = Ann.rangeSearchIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val brute = Ann.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute)
    assert(brute.nonEmpty, "test premise: some neighbor clears τ")
  }

  test("the IVF bound prunes most cells on a clustered corpus, losing nothing") {
    // 4 tight clusters around orthogonal directions; seeds (vec_id < 16)
    // and queries (vec_id < 8) cover every cluster. This is the shape real
    // embedding corpora have — and where the angular-radius bound earns
    // its keep (on the random testdata corpus cells are near-degenerate
    // and the bound correctly keeps everything).
    val dim = 64
    val rows = (0L until 200L).map { i =>
      val k = (i % 4).toInt
      val v = Array.tabulate(dim) { d =>
        val noise = (((i * 31 + d * 7) % 11) - 5).toFloat / 5.0f * 0.03f
        (if (d == k * 8) 1.0f else 0.0f) + noise
      }
      (i, v.toSeq)
    }
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val idx = Ann.rangeIvfIndex(emb)
    try {
      val nQueries = 8L
      val nCells = idx.cellStats.count()
      val probes = Ann.rangeIvfProbes(idx).count()
      info(s"probes: $probes of ${nQueries * nCells} (cells: $nCells)")
      assert(probes > 0, "every query must probe its own cluster's cells")
      assert(probes < nQueries * nCells / 2,
        s"bound pruned nothing on a clustered corpus: $probes probes")
      val got = Ann.rangeSearchIvfOn(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val brute = Ann.rangeSearchOn(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == brute, "prune must never change the answer")
      assert(brute.nonEmpty, "test premise: same-cluster neighbors clear τ")
      assert(brute.size < 8 * 199,
        "test premise: cross-cluster pairs fall below τ")
    } finally idx.assigned.unpersist()
  }
}
