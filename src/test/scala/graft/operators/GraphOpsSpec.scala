package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank correctness against an in-memory reference implementation of
 *  the same integer recurrence, plus the structural invariants the
 *  damping guarantees. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val Seed = 1000000000L

  private lazy val edges: Array[(Long, Long)] = {
    // same bulk threshold as bulkCoPurchaseEdges — both graph queries
    // read the shared thresholded edge base since r7
    val op = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    op.groupBy(_._1).valuesIterator.flatMap { xs =>
      for (a <- xs.toSeq; b <- xs.toSeq if a._2 != b._2) yield (a._2, b._2)
    }.toSet.toArray
  }

  private lazy val reference: Map[Long, Long] = {
    val od = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var rank: Map[Long, Long] = od.keysIterator.map(_ -> Seed).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.iterator.map { case (src, _) => rank(src) / od(src) }.sum
      }
      rank = in.map { case (n, s) => n -> (15 * Seed + 85 * s) / 100 }
    }
    rank
  }

  test("top-20 ranks EQUAL the sequential integer-PageRank reference") {
    val got = GraphOps.pagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = reference.toArray.sortBy { case (n, r) => (-r, n) }.take(20)
    assert(got.toSeq == expected.toSeq)
  }

  test("damping floor holds and ranks discriminate") {
    val ranks = reference.values
    assert(ranks.forall(_ >= 15 * Seed / 100), "every node keeps the 0.15 teleport mass")
    assert(ranks.toSet.size > 1, "test premise: the graph is not rank-regular")
  }

  test("label propagation EQUALS the sequential synchronous-LPA reference") {
    // naive reference: 3 synchronous rounds of most-frequent-neighbor
    // label, ties to the smallest label — written with plain maps, no
    // packing trick, so agreement proves the packed-argmax encoding
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keysIterator.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (n, ns) =>
        val freq = ns.groupBy(lbl).map { case (l, xs) => (l, xs.length) }
        val best = freq.toSeq.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }
    }
    val expected = lbl.groupBy(_._2)
      .map { case (c, m) => (c, m.size.toLong, m.keys.min) }
      .toArray.sortBy { case (c, n, _) => (-n, c) }.take(20)
    val got = GraphOps.labelPropagation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    assert(expected.exists(_._2 > 1), "test premise: LPA forms non-trivial communities")
  }

  test("graph_modularity EQUALS the sequential Newman-Q reference") {
    // sequential LPA (as above), then textbook Q = Σ_c [e_c/m − (d_c/2m)²]
    // computed from the same undirected edge set
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keysIterator.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (n, ns) =>
        val freq = ns.groupBy(lbl).map { case (l, xs) => (l, xs.length) }
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val und = edges.filter { case (x, y) => x < y }
    val m = und.length.toLong
    val internal = und.count { case (x, y) => lbl(x) == lbl(y) }.toLong
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val dc = deg.groupBy { case (n, _) => lbl(n) }.map { case (_, xs) => xs.values.sum }
    val sds = dc.map(d => BigInt(d) * d).sum
    val row = GraphOps.modularity(spark, dir).collect().head
    assert(row.getAs[Long]("m_edges") == m)
    assert(row.getAs[Long]("internal_edges") == internal)
    assert(row.getAs[Long]("n_communities") == dc.size.toLong)
    assert(BigInt(row.getAs[String]("sum_deg_sq")) == sds)
    val q = ((BigInt(4) * m * internal).toDouble - sds.toDouble) / (4.0 * m * m)
    assert(row.getAs[Double]("modularity") == q)
    assert(q > 0, "test premise: LPA communities beat the random baseline")
  }

  test("triangle count EQUALS the naive adjacency-set reference") {
    // naive reference: canonical undirected edge set, then for each edge
    // {x,y} count common neighbors z > y — each triangle once at its
    // smallest vertex. No orientation trick, so agreement here proves the
    // degree-ordered wedge join loses and double-counts nothing.
    val op = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = op.groupBy(_._1).valuesIterator.flatMap { xs =>
      for (a <- xs.toSeq; b <- xs.toSeq if a._2 < b._2) yield (a._2, b._2)
    }.toSet
    val adj = und.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (x, y)) =>
      m.updated(x, m.getOrElse(x, Set.empty) + y).updated(y, m.getOrElse(y, Set.empty) + x)
    }
    val naiveTri = und.iterator.map { case (x, y) =>
      (adj(x) & adj(y)).count(_ > y).toLong
    }.sum
    val naiveWedges = adj.valuesIterator.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val row = GraphOps.triangles(spark, dir).collect().head
    assert(row.getAs[Long]("n_nodes") == adj.size.toLong)
    assert(row.getAs[Long]("n_edges") == und.size.toLong)
    assert(row.getAs[Long]("n_wedges") == naiveWedges)
    assert(row.getAs[Long]("n_triangles") == naiveTri)
    assert(naiveTri > 0, "test premise: the co-purchase graph closes triangles")
  }

  test("graph_clustering census EQUALS the naive per-node adjacency-set reference") {
    // naive reference: per-node triangle count via common-neighbor
    // intersection over the FULL adjacency sets (no orientation trick),
    // per-node half-up cc in bp, then the same census rollup.
    val op = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = op.groupBy(_._1).valuesIterator.flatMap { xs =>
      for (a <- xs.toSeq; b <- xs.toSeq if a._2 < b._2) yield (a._2, b._2)
    }.toSet
    val adj = und.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (x, y)) =>
      m.updated(x, m.getOrElse(x, Set.empty) + y).updated(y, m.getOrElse(y, Set.empty) + x)
    }
    val ccBp = adj.toSeq.collect { case (n, nb) if nb.size >= 2 =>
      val t = nb.toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }.toLong
      val d = nb.size.toLong
      (2 * 2 * t * 10000 + d * (d - 1)) / (2 * d * (d - 1))
    }
    val row = GraphOps.clusteringCoeff(spark, dir).collect().head
    assert(row.getAs[Long]("n_eval") == ccBp.size.toLong)
    assert(row.getAs[Long]("n_closed") == ccBp.count(_ == 10000L).toLong)
    assert(row.getAs[Long]("sum_cc_bp") == ccBp.sum)
    assert(row.getAs[Long]("avg_cc_bp") == (2 * ccBp.sum + ccBp.size) / (2L * ccBp.size))
    assert(ccBp.exists(_ > 0), "test premise: some neighborhood closes")
    assert(ccBp.exists(_ < 10000), "test premise: not every neighborhood is a clique")
  }

  test("graph_components equals sequential union-find; HashMin oracle budget holds") {
    // sequential union-find ground truth on the collected edge set
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val op = Tables.lineitem(spark, d)
        .filter(col("l_quantity") >= 40)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val und = op.groupBy(_._1).valuesIterator.flatMap { xs =>
        for (a <- xs.toSeq; b <- xs.toSeq if a._2 < b._2) yield (a._2, b._2)
      }.toSet
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      und.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val nodes = und.flatMap(e => Seq(e._1, e._2))
      val truth = nodes.groupBy(find).map { case (_, ns) => (ns.min, ns.size.toLong) }
      val expected = truth.toSeq.sortBy { case (c, n) => (-n, c) }.take(10)
      val got = GraphOps.components(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == expected, s"component census diverged at $d")
      // the oracle's fixed HashMin budget: labels must reach fixpoint
      // within 16 rounds, or the generated SQL silently under-converges
      var lbl = nodes.iterator.map(n => n -> n).toMap
      var rounds = 0
      var changed = true
      while (changed && rounds <= 20) {
        rounds += 1
        val nbMin = (und.iterator.flatMap { case (x, y) => Seq(x -> lbl(y), y -> lbl(x)) })
          .toSeq.groupBy(_._1).map { case (n, ls) => n -> ls.map(_._2).min }
        val next = lbl.map { case (n, l) => n -> math.min(l, nbMin.getOrElse(n, l)) }
        changed = next != lbl
        lbl = next
      }
      assert(rounds <= 16, s"HashMin needs $rounds rounds at $d — raise the oracle budget")
    }
  }
}
