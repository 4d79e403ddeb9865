package graft.similarity

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd training invariants: the objective never increases, centroids are
 *  partitioning-independent (exact decimal sums), and the trained-IVF
 *  query is deterministic. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("WCSS is non-increasing across Lloyd iterations") {
    val emb = Tables.embeddings(spark, dir)
    val w = (0 to 3).map(i => Ann.wcss(emb, Ann.kmeansCentroids(emb, k = 8, iters = i)))
    w.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, s"WCSS rose: $w") }
    assert(w.last < w.head, "training never improved the objective")
  }

  test("centroids are bit-identical under repartitioning") {
    val emb = Tables.embeddings(spark, dir)
    val a = Ann.kmeansCentroids(emb, k = 8, iters = 2)
    val b = Ann.kmeansCentroids(emb.repartition(13), k = 8, iters = 2)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("every vector lands in a valid cell; assignment is exhaustive") {
    val emb = Tables.embeddings(spark, dir)
    val centroids = Ann.kmeansCentroids(emb, k = 8, iters = 2)
    val cells = Ann.assignCells(emb, centroids).select("cell")
      .collect().map(_.getInt(0))
    assert(cells.length == emb.count())
    assert(cells.forall(c => c >= 0 && c < 8))
  }

  test("ann_kmeans_ivf returns ranked neighbors deterministically") {
    val r1 = Ann.kmeansIvfTopK(spark, dir).collect().map(_.toSeq).toSeq
    val r2 = Ann.kmeansIvfTopK(spark, dir).collect().map(_.toSeq).toSeq
    assert(r1 == r2)
    assert(r1.nonEmpty)
  }
}
