package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Label propagation must find exact components, including multi-hop
 *  chains that need several rounds, and must terminate on empty input. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def components(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("id_a", "id_b")
    Dedup.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two separate clusters get their min-id labels") {
    val c = components((1L, 2L), (2L, 3L), (7L, 9L))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("a long chain converges across multiple propagation rounds") {
    // 10-2-3-4-5-6-7-8-9 chain: min label 2 must travel the full diameter
    val chain = Seq(10L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L, 7L -> 8L, 8L -> 9L)
    val c = components(chain: _*)
    assert(c.values.toSet == Set(2L))
    assert(c.keySet == Set(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L))
  }

  test("empty pair set yields empty components without iterating") {
    assert(components().isEmpty)
  }

  test("self-pairs yield singleton clusters, not silent node loss") {
    val c = components((5L, 5L), (1L, 2L), (2L, 2L))
    assert(c == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  /** Independent oracle: plain driver-side union-find with min-id roots. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("large-star/small-star equals union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 10
      val nEdges = n / 2 + rnd.nextInt(n)
      val pairs = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b")
        val star = Dedup.connectedComponents(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(star == unionFind(pairs), s"trial $trial: star=$star expected=${unionFind(pairs)}")
      }
    }
  }

  test("path graph converges in O(log n) rounds, not O(n)") {
    import spark.implicits._
    val n = 64
    val path = (0L until (n - 1)).map(i => (i, i + 1))
    val (labels, rounds) = Dedup.starComponents(path.toDF("id_a", "id_b"))
    val c = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.values.toSet == Set(0L) && c.keySet == (0L until n).toSet)
    // diameter 63; propagation would need ~63 rounds, star needs ~log2(64)+slack
    assert(rounds <= 2 * 6 + 4, s"took $rounds rounds")
  }

  test("preCanonical path equals the defensive path on canonical inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      // canonical: distinct x < y pairs, no self-loops — the
      // bulkCoPurchaseEdges invariant graph_components relies on
      val pairs = Seq.fill(n * 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b")
        def labelsOf(pre: Boolean) =
          Dedup.connectedComponents(df, preCanonical = pre).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(labelsOf(true) == labelsOf(false), s"trial $trial")
        assert(labelsOf(true) == unionFind(pairs), s"trial $trial vs union-find")
      }
    }
  }

  test("graph_components edge base satisfies the preCanonical invariant") {
    // the production caller's guarantee, asserted against real testdata:
    // one row per undirected edge, x < y strict, no duplicates
    val und = graft.operators.GraphOps.bulkCoPurchaseEdges(spark, "/root/testdata/sf0.001")
    val bad = und.filter(org.apache.spark.sql.functions.col("x") >=
      org.apache.spark.sql.functions.col("y")).count()
    assert(bad == 0L)
    assert(und.count() == und.distinct().count())
  }

  test("dedup_clusters members sum to the docs appearing in ngram pairs") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Dedup.ngramJaccard(spark, dir).select("id_a", "id_b").collect()
    val nodes = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clusters = Dedup.dedupClusters(spark, dir).collect()
    assert(clusters.map(_.getLong(1)).sum == nodes.size)
    // every cluster id is its own minimum member
    assert(clusters.forall(r => nodes.contains(r.getLong(0))))
  }
}
