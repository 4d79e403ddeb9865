package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Recall@3 of the approximate ANN tiers against the exact brute-force
 * ground truth computed in the same codebase — turns "the machinery runs"
 * into "the index works". Floors are set with margin below the measured
 * values on the sf0.01 corpus (random 64-dim vectors — the hardest case
 * for an ANN index, since true neighbors are only weakly clustered).
 */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  /** Mean per-query |retrieved ∩ true-top-3| / 3. */
  private def recallAt3(approx: org.apache.spark.sql.DataFrame): Double = {
    val truth = Ann.bruteForceTopK(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val got = approx.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val perQuery = truth.map { case (q, t) =>
      val hit = got.getOrElse(q, Set.empty).intersect(t).size
      hit.toDouble / t.size
    }
    perQuery.sum / perQuery.size
  }

  test("LSH top-k recall@3 meets its floor") {
    val r = recallAt3(Ann.lshTopK(spark, dir))
    info(f"ann_lsh_topk recall@3 = $r%.3f")
    assert(r >= 0.6, f"LSH recall@3 $r%.3f below floor 0.6")
  }

  test("trained-IVF top-k recall@3 meets its floor") {
    val r = recallAt3(Ann.kmeansIvfTopK(spark, dir))
    info(f"ann_kmeans_ivf recall@3 = $r%.3f")
    assert(r >= 0.8, f"trained IVF recall@3 $r%.3f below floor 0.8")
  }
}
