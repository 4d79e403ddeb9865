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
}
