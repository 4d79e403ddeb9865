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
