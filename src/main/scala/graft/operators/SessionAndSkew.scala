package graft.operators

import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Native session windows + explicit skew salting.
 *
 * `q30_session_window` uses Spark's built-in `session_window` aggregation —
 * the dedicated gap-session operator (vs q15's lag+running-sum formulation;
 * both carry oracles and must agree on session counts).
 *
 * `q31_salted_join` demonstrates manual key salting: when BOTH join sides
 * are too big to broadcast and the key is heavily skewed (here a 3-value
 * key), a plain shuffle join sends each hot key to ONE reducer. Salting
 * fans the hot side across `Salts` reducers by a deterministic row hash
 * and replicates the small side once per salt — the classic pre-AQE skew
 * fix, still needed when AQE's skew-split can't apply (e.g. hash joins on
 * extreme single-key skew). Correctness is provable: the oracle is the
 * UNsalted join.
 */
object SessionAndSkew {

  /** Gap-based sessions per user via the native session_window operator;
   *  emits the same per-user session census as q15 (30-min gap). */
  def q30SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("sess_len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max("sess_len").as("max_len"))
      .orderBy("user_id")

  val Salts = 8

  /** Salted aggregation-join on a 3-value skewed key: lineitem enriched by
   *  a per-(returnflag,linestatus) label table. The fact side gets a
   *  deterministic salt from its unique row key; the label side is
   *  replicated once per salt; join on (key, salt) spreads each hot key
   *  over `Salts` reducers. Aggregated so the output is small and
   *  oracle-comparable. */
  def q31SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts)))
    // the 6-row label dim is the column DOMAIN ({A,N,R} × {F,O}) as a
    // literal local relation — a pipeline ships tiny dims as config rather
    // than re-scanning the fact table to distinct() them (inner join, so a
    // domain value absent from the data can't appear in the output).
    // shuffle_hash pins the demo to the salted SHUFFLE plan: the operator
    // models a dim too big to broadcast.
    val labels = Seq(("A", "F"), ("A", "O"), ("N", "F"), ("N", "O"), ("R", "F"), ("R", "O"))
      .toDF("rf", "ls")
      .withColumn("label", concat_ws("/", col("rf"), col("ls")))
      .crossJoin(spark.range(Salts).select(col("id").cast("int").as("salt")))
      .hint("shuffle_hash")
    li.join(labels,
        col("l_returnflag") === col("rf") && col("l_linestatus") === col("ls") &&
        li("salt") === labels("salt"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .orderBy("label")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q30_session_window", q30SessionWindow, Some("""
      SELECT user_id, count(*) AS n_sessions, max(sess_len) AS max_len FROM (
        SELECT user_id, sess_id, count(*) AS sess_len FROM (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        >= 1800000000 THEN 1 ELSE 0 END AS new_sess
            FROM events) g) s
        GROUP BY user_id, sess_id) c
      GROUP BY user_id
      ORDER BY user_id""")),
    QueryDef("q31_salted_join", q31SaltedJoin, Some("""
      SELECT concat_ws('/', l_returnflag, l_linestatus) AS label,
             count(*) AS n,
             cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty
      FROM lineitem
      GROUP BY 1 ORDER BY label"""))
  )
}
