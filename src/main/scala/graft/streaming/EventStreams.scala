package graft.streaming

import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Structured Streaming over the events table: watermarked tumbling-window
 * aggregation and stateful sessionization via `flatMapGroupsWithState` —
 * the streaming twins of q14_events_hourly and q15_sessionize.
 *
 * Design for an unbounded 100 TB/day stream:
 *  - event time derives from the nanosecond `ts` (micros precision);
 *    a 30-min watermark bounds window/session state;
 *  - sessionization keys state by user_id — state size is O(active users),
 *    closed sessions flush on event-time timeout;
 *  - the harness entries replay the parquet table through the SAME
 *    streaming plans with Trigger.AvailableNow into a memory sink, so the
 *    streaming path is exercised (and oracle-checked) in a batch harness.
 */
object EventStreams {

  final case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long)
  // public: the state encoder's generated code must see the constructor
  final case class SessState(startUs: Long, lastUs: Long, n: Long)

  val SessionGapUs: Long = 1800000000L // 30 min

  /** Event frame with a proper event-time column (micros → timestamp). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour counts with a 30-minute watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "30 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"), col("event_type"), col("n"), col("sum_value"))

  /** Stateful sessionization: 30-min-gap sessions per user. Emits one row
   *  per CLOSED session (on gap or event-time timeout). State per key is a
   *  single (start, last, count) triple. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val typed = withEventTime(events.toDF())
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_time"))
      .withWatermark("event_time", "30 minutes")
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1).flatMapGroupsWithState[SessState, SessionOut](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      case (user, rows, state: GroupState[SessState]) =>
        if (state.hasTimedOut) {
          val out = state.getOption.map(s => SessionOut(user, s.startUs, s.n)).toList
          state.remove()
          out.iterator
        } else {
          val sorted = rows.map(_._2).toVector.sorted
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          for (t <- sorted) {
            cur match {
              case Some(s) if t - s.lastUs <= SessionGapUs =>
                // a late (within-watermark) event must not move the session
                // end backwards or the next on-time event falsely closes it
                cur = Some(s.copy(startUs = math.min(s.startUs, t),
                  lastUs = math.max(s.lastUs, t), n = s.n + 1))
              case Some(s) =>
                closed ::= SessionOut(user, s.startUs, s.n)
                cur = Some(SessState(t, t, 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastUs / 1000 + SessionGapUs / 1000 + 60000)
          }
          closed.reverseIterator
        }
    }
  }

  // ---- harness entries: replay parquet through the streaming plans --------

  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.events(spark, dir).schema
    // the file stream source wants a directory; glob-filter to one table
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Streaming hourly counts replayed over the parquet — one AvailableNow
   *  pass into a memory sink. Same result as the batch plan, so it carries
   *  a real oracle. */
  def streamHourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_hourly_${System.nanoTime()}"
    val q = hourlyCounts(eventsStream(spark, dir))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy("hour_start_us", "event_type")
  }

  /** Streaming sessionization replayed over the parquet. With a bounded
   *  replay the final watermark never passes the last sessions, so emitted
   *  rows are the sessions CLOSED by a later event — deterministic, but a
   *  subset of the batch q15 sessions (documented streaming semantics). */
  def streamSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"stream_sessions_${System.nanoTime()}"
    val ev = eventsStream(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")).as[Event]
    val q = sessionize(ev)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy("user_id", "session_start_us")
  }

  /** Evolving-schema-over-a-stream: the witness aggregator (the engine's
   *  core) running as a STREAMING stateful aggregation — per event type,
   *  the unified Hive type of all props seen so far, updated per batch.
   *  The witness semilattice is exactly the merge-friendly state streaming
   *  aggregation needs; after a bounded replay the state equals the batch
   *  schema_props_by_type result. */
  def streamSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val name = s"stream_schema_${System.nanoTime()}"
    val q = eventsStream(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.schemer.InferSchema.infer_hive_type(col("props")).as("hive_type"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).orderBy("event_type")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("stream_schema_evolution", streamSchemaEvolution, None),
    QueryDef("stream_hourly_counts", streamHourlyCounts, Some("""
      SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_start_us,
             event_type, count(*) AS n,
             cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_start_us, event_type""")),
    QueryDef("stream_sessions", streamSessions, None)
  )
}
