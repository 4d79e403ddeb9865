package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The partitioned foreachBatch merge: each micro-batch must rewrite ONLY
 *  the key-hash buckets it touches and carry every other bucket across as
 *  hard links (same inode ⇒ byte-identical), while the final published
 *  target still equals the batch aggregate exactly. */
class UpsertMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // a multi-file events table, ONE USER PER FILE, so the AvailableNow
  // replay (1 file/trigger) produces several micro-batches each touching
  // at most 2 of the 8 key-hash buckets — the carry-over path must engage
  private lazy val replayDir: String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_upsert_spec")
    tmp.toFile.deleteOnExit()
    val out = tmp.resolve("events.parquet").toString
    (0L until 4L).foreach { u =>
      (1L to 6L).map { i =>
        (u * 10 + i, (3600L * i) * 1000000000L, u, if (i % 2 == 0) "click" else "view", i.toDouble)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(out)
    }
    tmp.toString
  }

  private def dataFiles(bucketDir: Path): Map[String, Path] =
    Files.list(bucketDir).iterator().asScala
      .filter { f => val n = f.getFileName.toString; !n.startsWith(".") && !n.startsWith("_") }
      .map(f => f.getFileName.toString -> f).toMap

  test("multi-batch upsert: untouched buckets are carried byte-identical, result exact") {
    val result = EventStreams.streamForeachUpsert(spark, replayDir, filesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = spark.read.parquet(s"$replayDir/events.parquet")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(result == expected, "published target must equal the batch aggregate")

    val root = EventStreams.upsertRoots((spark.sparkContext.applicationId, replayDir))
    val versions = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+")).toVector
      .sortBy(_.getFileName.toString.drop(1).toInt)
    assert(versions.size >= 3, s"replay should produce several batches, got ${versions.size}")

    var carried = 0
    var rewritten = 0
    versions.sliding(2).foreach { case Vector(prev, next) =>
      val prevBuckets = Files.list(prev).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket=")).map(p => p.getFileName.toString -> p).toMap
      Files.list(next).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket=")).foreach { b =>
          prevBuckets.get(b.getFileName.toString).foreach { pb =>
            val pf = dataFiles(pb); val nf = dataFiles(b)
            val sameInode = nf.nonEmpty && nf.keySet == pf.keySet &&
              nf.forall { case (n, f) => Files.isSameFile(f, pf(n)) }
            if (sameInode) {
              carried += 1
              // inode identity already implies it, but assert the verdict's
              // wording literally: the carried files are byte-identical
              nf.foreach { case (n, f) =>
                assert(java.util.Arrays.equals(Files.readAllBytes(f), Files.readAllBytes(pf(n))))
              }
            } else rewritten += 1
          }
        }
      case _ => ()
    }
    assert(carried >= 1, "at least one untouched bucket must be hard-link-carried across a batch")
    assert(rewritten >= 1, "at least one touched bucket must be rewritten across a batch")
  }

  test("upsert memo is keyed by (applicationId, dir) and re-use skips the replay") {
    EventStreams.streamForeachUpsert(spark, replayDir, filesPerTrigger = Some(1)).count()
    val appId = spark.sparkContext.applicationId
    assert(EventStreams.upsertRoots.keys.exists { case (a, d) => a == appId && d == replayDir },
      "memo key must carry the applicationId so a restarted session replays instead of " +
        "receiving a frame bound to a stopped context")
    val root = EventStreams.upsertRoots((appId, replayDir))
    val before = Files.list(root).iterator().asScala.map(_.getFileName.toString).toSet
    // a sibling session in the same app shares the context — memo hit, live frame
    val sibling = spark.newSession()
    val again = EventStreams.streamForeachUpsert(sibling, replayDir, filesPerTrigger = Some(1))
    assert(again.count() > 0)
    val after = Files.list(root).iterator().asScala.map(_.getFileName.toString).toSet
    assert(before == after, "memo hit must not replay (no new target versions)")
  }
}
