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

  test("matryoshka two-stage recall@3 meets its floor; shortlist bounds it") {
    // end-to-end recall of the coarse-prefix → full-dim rerank pipeline
    val r = recallAt3(Ann.matryoshkaTopK(spark, dir))
    info(f"ann_matryoshka recall@3 = $r%.3f")
    // the rerank stage is EXACT on the shortlist, so end-to-end recall
    // equals shortlist coverage of the true top-3 — measure it separately
    // to prove the width-10 shortlist (not the rerank) is the binding term
    val shortlist = Ann.matryoshkaShortlist(spark, dir)
      .collect().map(row => (row.getLong(0), row.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val truth = Ann.bruteForceTopK(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .collect().map(row => (row.getLong(0), row.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val cov = truth.map { case (q, t) =>
      shortlist.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val coverage = cov.sum / cov.size
    info(f"matryoshka shortlist(10/16-dim) coverage of true top-3 = $coverage%.3f")
    assert(math.abs(r - coverage) < 1e-9,
      f"rerank must be exact on the shortlist: recall $r%.3f != coverage $coverage%.3f")
    // Floor is margin below the measured 0.25 on RANDOM 64-dim vectors —
    // the worst case for a prefix index, since untrained embeddings spread
    // energy uniformly (prefix/full rank correlation √(16/64) = 0.5).
    // Width cannot fix that: measured coverage vs width on this corpus is
    // 10→0.25, 20→0.33, 30→0.42, 50→0.50, 120→0.67 — width 120 already
    // touches 24% of the 500-vector corpus, i.e. widening degenerates
    // toward brute force. The test below shows width 10 is sufficient once
    // embeddings actually have matryoshka structure.
    assert(r >= 0.2, f"matryoshka recall@3 $r%.3f below floor 0.2")
  }

  test("knn-graph boundary recall is 24/24 on this corpus") {
    // the 7/8 replication band exists for exactly this number: the r9
    // residual miss was a candidate at margin 0.8851, just outside the
    // old 9/10 band (and invisible to query-side probing — the query sat
    // far from its own boundary). Pin the full 8×3 ground-truth coverage
    // so an index change that reopens the boundary hole fails loudly.
    val hits = Ann.knnGraphRecall(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_hit")).collect()(0).getLong(0)
    assert(hits == 24L, s"knn-graph recall regressed: $hits/24 ground-truth edges found")
  }

  test("matryoshka width-10 shortlist suffices on prefix-concentrated embeddings") {
    import org.apache.spark.sql.functions._
    import graft.similarity.TopK.{explodeRanks, topK}
    // simulate matryoshka-trained embeddings: tail dims carry 15% of their
    // original amplitude, so the 16-dim prefix dominates the full cosine —
    // the energy profile matryoshka representation learning produces
    val scaled = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i < lit(16), x).otherwise(x * lit(0.15f))).as("embedding"))
    val queries = broadcast(scaled.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val truthDf = scaled.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.TextFunctions.cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    val truth = explodeRanks(truthDf, "query_id", "neighbor_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val shortlist = Ann.matryoshkaShortlistOf(scaled)
      .collect().map(row => (row.getLong(0), row.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val cov = truth.map { case (q, t) =>
      shortlist.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val coverage = cov.sum / cov.size
    info(f"matryoshka shortlist coverage on structured embeddings = $coverage%.3f")
    assert(coverage >= 0.85,
      f"width-10 shortlist should cover structured-embedding top-3: $coverage%.3f < 0.85")
  }
}
