package graft.operators

import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Core relational operator suite — aggregations, joins (broadcast / shuffle /
 * semi / anti), windows, rollup, set ops, top-k — declared with the
 * DataFrame API so Catalyst owns the physical plan.
 *
 * Scale notes (designed for ~100 TB, tested at sf0.1):
 *  - dimension tables (`region`, `nation`, `part`, `supplier`) are
 *    broadcast explicitly — no shuffle of the fact side for those joins;
 *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and
 *    AQE (enabled in the session) handles skew/coalescing at runtime;
 *  - money arithmetic is cast to DECIMAL(12,2) *before* aggregation: decimal
 *    sums are exact and order-independent, so results are reproducible
 *    across any partitioning (and hash-comparable against the DuckDB
 *    oracle) — double sums would drift in the low bits per merge order.
 *
 * Output-type discipline (applies to every oracled query in the repo):
 * FINAL output columns are only string/bigint/double/boolean/timestamp —
 * never DECIMAL or HUGEINT on either side. The aggregation itself stays
 * exact decimal; only the last projection converts, and both engines'
 * decimal→double casts are correctly rounded (verified bit-exact), so the
 * one conversion is deterministic. Rationale: the correctness gate reads
 * the Spark parquet with scale-preserving Decimals but materializes the
 * oracle through a float64 path, so a DECIMAL output whose value has a
 * trailing zero ('1.00' vs '1.0') false-fails even when values are
 * bit-identical. Integer sums get an explicit BIGINT cast on the DuckDB
 * side (its sum(BIGINT) is HUGEINT, which also floats through that path).
 */
object RelationalQueries {

  private def dec(c: String) = col(c).cast("decimal(12,2)")

  /** TPC-H Q1 shape: scan-filter-aggregate over the widest fact table.
   *  Whole-stage-codegen'd hash aggregate; partial aggregation map-side. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1999-12-01 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q6 shape: highly selective filter + scalar aggregate. The three
   *  predicates all push down to the parquet scan. */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= to_timestamp_ntz(lit("1998-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp_ntz(lit("1999-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"))

  /** TPC-H Q3 shape: 3-way join + group + top-k. customer is the small side
   *  at every SF (1/40 of lineitem) → broadcast; orders ⋈ lineitem shuffles
   *  on orderkey. Top-k via orderBy+limit = TakeOrderedAndProject (no full
   *  sort at scale). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp_ntz(lit("1998-06-30 00:00:00"))
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "FURNITURE")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4 shape: EXISTS as a left-semi join with a non-equi conjunct. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    ord.join(li, col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5 shape: star join through two broadcast dims into the fact
   *  chain. region+nation are tiny at any SF → broadcast both. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dims = broadcast(
      Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .groupBy("r_name")
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount"))).cast("double").as("revenue"))
      .orderBy("r_name")
  }

  /** Top-3 orders by value within each priority class — via the bounded
   *  [[graft.similarity.TopKAgg]], NOT a row_number window: with only 5
   *  priority classes, a per-priority window would funnel the entire
   *  orders table through 5 reducer tasks (the exact anti-pattern the
   *  TopK scaladoc names). The aggregate keeps an O(3) buffer per class
   *  per map task and only buffers shuffle; tie semantics (price desc,
   *  orderkey asc) match the oracle's window exactly. */
  def q7TopPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import graft.similarity.TopK._
    val grouped = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
    explodeRanks(grouped, "o_orderpriority", "o_orderkey")
      .withColumnRenamed("rank", "rn")
      .orderBy("o_orderpriority", "rn")
  }

  /** Running-total window: cumulative spend per customer in order-date
   *  order. One shuffle on custkey; sort within partition. */
  def q8RunningSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec("o_totalprice")).over(w).cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distinct aggregates (expand-based in Spark; two-phase at scale). */
  def q9DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))

  /** ROLLUP grouping sets — partial aggregation still applies. */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** INTERSECT: customers of one segment who actually ordered. */
  def q11Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "FURNITURE").select("c_custkey")
      .intersect(Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Anti join: customers with no orders at all. Shuffled hash anti-join on
   *  the key; at 100 TB the orders side is pre-aggregated to distinct keys
   *  by Catalyst's own rewrite. */
  def q12NoOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Dimension-table profile: min/max/count/sum by brand. */
  def q13BrandStats(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        sum(dec("p_retailprice")).cast("double").as("sum_price"))
      .orderBy("p_brand")

  /** Event-time bucketing on the raw nanosecond Long. Integer `div` only:
   *  nanos exceed 2^53, double division would corrupt the bucket. The
   *  oracle buckets DuckDB's microsecond view of the same column. */
  def q14EventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec("value")).cast("double").as("sum_value"))
      .orderBy("hour_bucket", "event_type")

  /** Batch sessionization: 30-min-gap sessions per user via lag + running
   *  sum — the batch twin of the streaming session operator
   *  (graft.streaming). Works on microsecond-truncated time so the oracle
   *  (whose DuckDB view only has micros) computes the identical result.
   *  Gap convention: a new session starts at gap >= 30 min (half-open),
   *  matching Spark's native session_window so q30 agrees on any data. */
  def q15Sessionize(spark: SparkSession, dir: String): DataFrame =
    // the shared per-corpus gap-session artifact
    // ([[SessionAndSkew.gapSessions]]) carries per-session event counts;
    // the census is one bounded aggregate over it (q67 reads the same
    // build — one sessionization window per run instead of two)
    SessionAndSkew.gapSessions(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_len"))
      .orderBy("user_id")

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q1_pricing_summary", q1PricingSummary, Some("""
      SELECT l_returnflag, l_linestatus,
             cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
             cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_base_price,
             cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= timestamp '1999-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),
    QueryDef("q6_revenue", q6Revenue, Some("""
      SELECT cast(sum(cast(l_extendedprice as decimal(12,2)) * cast(l_discount as decimal(12,2))) as double) AS revenue
      FROM lineitem
      WHERE l_shipdate >= timestamp '1998-01-01 00:00:00'
        AND l_shipdate < timestamp '1999-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),
    QueryDef("q3_shipping_priority", q3ShippingPriority, Some("""
      SELECT l_orderkey, o_orderpriority,
             cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'FURNITURE'
        AND o_orderdate < timestamp '1998-06-30 00:00:00'
        AND l_shipdate > timestamp '1998-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")),
    QueryDef("q4_order_priority", q4OrderPriority, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    QueryDef("q5_region_revenue", q5RegionRevenue, Some("""
      SELECT r_name,
             cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""")),
    QueryDef("q7_top_per_priority", q7TopPerPriority, Some("""
      SELECT o_orderpriority, o_orderkey, rn FROM (
        SELECT o_orderpriority, o_orderkey,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_orderpriority, rn""")),
    QueryDef("q8_running_spend", q8RunningSpend, Some("""
      SELECT o_custkey, o_orderkey,
             cast(sum(cast(o_totalprice as decimal(12,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey""")),
    QueryDef("q9_distinct_agg", q9DistinctAgg, Some("""
      SELECT count(DISTINCT o_custkey) AS n_cust,
             count(DISTINCT o_orderpriority) AS n_prio,
             count(*) AS n_orders
      FROM orders""")),
    QueryDef("q10_rollup", q10Rollup, Some("""
      SELECT l_returnflag, l_linestatus,
             cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty, count(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),
    QueryDef("q11_intersect", q11Intersect, Some("""
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
      INTERSECT
      SELECT o_custkey FROM orders
      ORDER BY c_custkey""")),
    QueryDef("q12_no_orders", q12NoOrders, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),
    QueryDef("q13_brand_stats", q13BrandStats, Some("""
      SELECT p_brand, count(*) AS n_parts, min(p_size) AS min_size,
             max(p_size) AS max_size,
             cast(sum(cast(p_retailprice as decimal(12,2))) as double) AS sum_price
      FROM part GROUP BY p_brand ORDER BY p_brand""")),
    QueryDef("q14_events_hourly", q14EventsHourly, Some("""
      SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
             count(*) AS n, cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_bucket, event_type""")),
    QueryDef("q15_sessionize", q15Sessionize, Some("""
      SELECT user_id, count(*) AS n_sessions, max(sess_len) AS max_len FROM (
        SELECT user_id, sess_id, count(*) AS sess_len FROM (
          SELECT user_id, event_id,
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
      ORDER BY user_id"""))
  )
}
