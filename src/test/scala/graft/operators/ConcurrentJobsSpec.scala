package graft.operators

import graft.SparkTestSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Proves q42_profile's concurrent-futures submission actually overlaps its
 * four distinct-count jobs on the scheduler — the design claim at
 * RelationalQueries2.q42Profile — rather than degenerating to serial
 * execution with extra thread ceremony.
 */
class ConcurrentJobsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q42_profile submits its four distinct counts as overlapping jobs") {
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val ends = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ends.put(j.jobId, System.nanoTime())
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // building the frame runs the four Await'd distinct-count jobs; the
      // returned stack() frame itself stays lazy, so every job the listener
      // sees here IS one of the concurrent submissions
      RelationalQueries2.q42Profile(spark, dir)
      // the listener bus is async; all jobs have finished (q42Profile
      // Awaits them), so just wait for the end events to drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while ((starts.isEmpty || starts.size != ends.size) && System.nanoTime() < deadline)
        Thread.sleep(20)
      val intervals = starts.keys.toSeq.flatMap(id => ends.get(id).map(e => (starts(id), e)))
      assert(intervals.size >= 4, s"expected the 4 distinct-count jobs, saw ${intervals.size}")
      val overlapping = intervals.combinations(2).count {
        case Seq((s1, e1), (s2, e2)) => s1 < e2 && s2 < e1
        case _ => false
      }
      info(s"jobs seen: ${intervals.size}, overlapping pairs: $overlapping")
      assert(overlapping >= 1,
        "no pair of q42 jobs overlapped — concurrent submission is not engaging")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
