package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multi-corpus release hook: after [[CorpusCaches.releaseAll]] every
 *  snapshot's storage is unpinned and every memoized artifact rebuilds
 *  correctly on next use — a long session sweeping many corpora must not
 *  accumulate pinned cache without bound, and correctness must never
 *  depend on a cache hit. */
class CorpusCachesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("releaseAll unpins snapshot storage and artifacts rebuild identically") {
    // build two snapshot-backed artifacts from different modules
    val before = graft.operators.SweepSkyline.q86Bowley(spark, dir).collect().toSeq
    val knnBefore = graft.similarity.Ann.knnGraph(spark, dir).collect().toSeq
    val pinned = spark.sparkContext.getPersistentRDDs.size
    assert(pinned > 0, "snapshots should be pinned while memos are live")
    CorpusCaches.releaseAll()
    // DataFrame-level persists (locator barriers) are not snapshots; clear
    // them too so the assertion sees only what releaseAll left behind
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseAll must unpersist every snapshot RDD")
    // rebuilt artifacts must be identical — correctness never rides a cache
    assert(graft.operators.SweepSkyline.q86Bowley(spark, dir).collect().toSeq == before)
    assert(graft.similarity.Ann.knnGraph(spark, dir).collect().toSeq == knnBefore)
  }

  test("two-corpus sweep: storage returns to baseline between corpora") {
    // the scenario the hook exists for: one long session sweeping corpus
    // after corpus must end each corpus at the storage baseline, or pinned
    // snapshots (and their lineage-pinned shuffle files) accumulate without
    // bound across the sweep
    CorpusCaches.releaseAll()
    spark.catalog.clearCache()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val answers = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").map { d =>
      val bowley = graft.operators.SweepSkyline.q86Bowley(spark, d).collect().toSeq
      val knn = graft.similarity.Ann.knnGraph(spark, d).count()
      assert(spark.sparkContext.getPersistentRDDs.size > baseline.size,
        s"$d: snapshots should be pinned while the corpus is in use")
      CorpusCaches.releaseAll()
      spark.catalog.clearCache()
      assert(spark.sparkContext.getPersistentRDDs.keySet == baseline,
        s"$d: storage must return to the pre-corpus baseline after release")
      (bowley, knn)
    }
    // and the release between corpora must not have corrupted either: the
    // first corpus rebuilt cold answers exactly as it did mid-sweep
    val rebuilt = graft.operators.SweepSkyline.q86Bowley(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(rebuilt == answers.head._1)
    CorpusCaches.releaseAll()
  }
}
