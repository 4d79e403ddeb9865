package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics under controlled input: MemoryStream lets us advance
 *  the watermark batch by batch and observe exactly which sessions close. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import EventStreams._

  private val us = 1000000L
  private def ev(id: Long, tSec: Long, user: Long): Event =
    Event(id, tSec * 1000 * us, user, "click", 1.0) // ts in nanos

  test("cepMatches detects view→purchase with no intervening click, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tev(id: Long, tSec: Long, user: Long, typ: String): Event =
      Event(id, tSec * 1000 * us, user, typ, 1.0)
    val input = MemoryStream[Event]
    val q = cepMatches(input.toDS())
      .writeStream.format("memory").queryName("cep_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: view only — state must carry it into the next batch
      input.addData(tev(1, 1000, 7, "view"))
      q.processAllAvailable()
      assert(spark.table("cep_test").count() == 0)
      // batch 2: purchase 60 s later → matches the CARRIED view
      input.addData(tev(2, 1060, 7, "purchase"))
      q.processAllAvailable()
      val out = spark.table("cep_test").as[CepMatch].collect().toSeq
      assert(out == Seq(CepMatch(7, 2, 1060 * us, 1000 * us)))
      // batch 3: view, then a click BETWEEN view and purchase kills it
      input.addData(tev(3, 2000, 8, "view"), tev(4, 2030, 8, "click"), tev(5, 2060, 8, "purchase"))
      q.processAllAvailable()
      assert(!spark.table("cep_test").as[CepMatch].collect().exists(_.user_id == 8))
      // batch 4: view older than 30 min does not match
      input.addData(tev(6, 3000, 9, "view"), tev(7, 3000 + 1801, 9, "purchase"))
      q.processAllAvailable()
      assert(!spark.table("cep_test").as[CepMatch].collect().exists(_.user_id == 9))
      // batch 5: click BEFORE the view is harmless
      input.addData(tev(8, 9000, 5, "click"), tev(9, 9010, 5, "view"), tev(10, 9020, 5, "purchase"))
      q.processAllAvailable()
      assert(spark.table("cep_test").as[CepMatch].collect()
        .exists(m => m.user_id == 5 && m.purchase_id == 10))
    } finally q.stop()
  }

  test("stream_backfill_union restores exactly-once from the doubled source") {
    // the replay ingests every event TWICE (history + live overlap);
    // equality with the single-copy batch rollup proves the in-stream
    // dedup removed exactly the overlap, nothing more, nothing less
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val batch = graft.Tables.events(spark, dir)
      .groupBy(expr("(ts div 3600000000000) * 3600000000").as("hour_start_us"))
      .agg(count(lit(1)).as("n_events"),
        expr("cast(sum(cast(value as decimal(12,2)) * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val got = EventStreams.streamBackfillUnion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == batch)
    assert(batch.map(_._2).sum ==
      graft.Tables.events(spark, dir).count(), "sink holds the single-copy event count")
  }

  test("replay builders work from a RELATIVE sf dir (symlink targets must be absolute)") {
    // regression: the replay builders symlink the events table into /tmp,
    // and a symlink TARGET resolves against the LINK's directory — with a
    // relative sf dir the links dangled and every replay-fed stream died
    // with UNABLE_TO_INFER_SCHEMA (14 queries at once in a bench run)
    import java.nio.file.{Files, Paths}
    val rel = Paths.get("target/rel_sf0.001")
    Files.deleteIfExists(rel)
    Files.createSymbolicLink(rel, Paths.get("/root/testdata/sf0.001"))
    try {
      val viaRel = EventStreams.streamHourlyCounts(spark, rel.toString).collect()
      val viaAbs = EventStreams.streamHourlyCounts(spark, "/root/testdata/sf0.001").collect()
      assert(viaRel.map(_.toString).sorted.toSeq == viaAbs.map(_.toString).sorted.toSeq,
        "relative and absolute sf dirs must produce identical stream output")
    } finally Files.deleteIfExists(rel)
  }

  test("sessionize closes a session when the gap exceeds 30 minutes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // session 1: two events 10 s apart; then a 31-min gap opens session 2
      input.addData(ev(1, 1000, 7), ev(2, 1010, 7))
      q.processAllAvailable()
      input.addData(ev(3, 1010 + 31 * 60, 7))
      q.processAllAvailable()
      // the gap event closes session 1 immediately (emitted on arrival)
      val out = spark.table("sess_test").as[SessionOut].collect()
      assert(out.toSeq == Seq(SessionOut(7, 1000 * us, 2)))
      // a later user advances the watermark past user 7's timeout
      input.addData(ev(4, 1010 + 120 * 60, 9))
      q.processAllAvailable()
      input.addData(ev(5, 1010 + 121 * 60, 9))
      q.processAllAvailable()
      val out2 = spark.table("sess_test").as[SessionOut].collect()
      assert(out2.exists(s => s.user_id == 7 && s.n_events == 1), s"timeout flush missing: ${out2.toSeq}")
    } finally q.stop()
  }

  test("hourlyCounts windows and counts by event type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDS().toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(ev(1, 3600, 1), ev(2, 3700, 1), ev(3, 7300, 2))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select("hour_start_us", "n").as[(Long, Long)].collect().toMap
      assert(rows == Map(3600L * us -> 2L, 7200L * us -> 1L))
    } finally q.stop()
  }
}
