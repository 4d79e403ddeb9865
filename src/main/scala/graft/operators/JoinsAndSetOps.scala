package graft.operators

import graft.Tuning
import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Outer-join and set-operation coverage: left/full outer joins with null
 *  semantics, EXCEPT, UNION ALL — completing the join/set-op matrix
 *  (inner/broadcast/semi/anti/cross/as-of live in the other batches). */
object JoinsAndSetOps {

  /** Left outer join + null-aware aggregation: every customer with their
   *  order stats; customers without orders keep zero counts. */
  def q26LeftOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_mktsegment")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast("decimal(12,2)")), lit(0).cast("decimal(12,2)")).cast("double").as("spend"))
      .orderBy("c_custkey")

  /** Full outer join across two aggregates: per-nation customer count vs
   *  supplier count; either side may be missing → nulls survive. */
  def q27FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  /** MERGE/upsert (SCD-style): apply a change set to a base table in one
   *  full-outer join + coalesce pass — the batch form of `MERGE INTO`
   *  (update matched keys, insert new keys, pass unmatched rows through),
   *  which vanilla parquet lacks as a statement but a pipeline still needs.
   *  Change set = per-customer order spend (matched keys -> updated
   *  balance) plus a deterministic slice of shifted keys standing in for
   *  brand-new rows. One shuffle per side on the merge key; at warehouse
   *  scale both sides would be bucketed on it ([[graft.sources.Sinks]]
   *  demonstrates that layout). Output: per-op row counts + exact decimal
   *  balance sums. */
  def q38Upsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_acctbal").cast("decimal(12,2)").as("bal"))
    // the %3 slice leaves ~a third of the base untouched so all three
    // merge outcomes (update / insert / keep) are exercised and oracled
    val changes = Tables.orders(spark, dir)
      .filter(col("o_custkey") % 3 =!= 0)
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("new_bal"))
      .unionByName(
        Tables.orders(spark, dir)
          .filter(col("o_custkey") % 100 === 0)
          .groupBy((col("o_custkey") + 1000000L).as("key"))
          .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("new_bal")))
    base.join(changes, Seq("key"), "full_outer")
      .select(
        when(col("new_bal").isNotNull && col("bal").isNotNull, "update")
          .when(col("new_bal").isNotNull, "insert")
          .otherwise("keep").as("op"),
        coalesce(col("new_bal"), col("bal")).as("merged_bal"))
      .groupBy("op")
      .agg(count(lit(1)).as("n"), sum(col("merged_bal")).cast("double").as("total_bal"))
      .orderBy("op")
  }

  /** EXCEPT (distinct): churned customers — ordered before 1998, never
   *  after. */
  def q28Except(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cutoff = to_timestamp_ntz(lit("1998-01-01 00:00:00"))
    ord.filter(col("o_orderdate") < cutoff).select(col("o_custkey").as("custkey"))
      .except(ord.filter(col("o_orderdate") >= cutoff).select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** UNION ALL with a source tag, aggregated: one account-balance profile
   *  across both entity kinds. */
  def q29UnionAll(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(lit("customer").as("kind"), col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val s = Tables.supplier(spark, dir)
      .select(lit("supplier").as("kind"), col("s_acctbal").cast("decimal(12,2)").as("bal"))
    c.unionAll(s)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(col("bal")).cast("double").as("total_bal"), max(col("bal")).cast("double").as("max_bal"))
      .orderBy("kind")
  }

  /** Range (interval) join: pairs of orders by the SAME customer placed
   *  within 30 days of each other. Spark has no native range-join node, and
   *  a raw theta join is O(n²) per key — the scalable form buckets each row
   *  into coarse 30-day epochs, equi-joins on (custkey, bucket) with each
   *  left row probing its own and the next bucket (any pair ≤ 30 days apart
   *  shares or straddles one boundary), then applies the exact predicate.
   *  The oracle is the plain inequality join — same rows, quadratic plan. */
  def q34RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bucketDays = 30L
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
      (unix_date(col("o_orderdate").cast("date"))).as("d"))
    val withBucket = o.withColumn("b", col("d") / lit(bucketDays) cast "long")
    // left probes bucket b and b+1; right sits in its own bucket
    val probes = withBucket.select(col("ck"), col("ok"), col("d"),
      explode(array(col("b"), col("b") + 1)).as("pb"))
    val right = withBucket.select(
      col("ck").as("ck2"), col("ok").as("ok2"), col("d").as("d2"), col("b").as("pb"))
    probes.join(right, Seq("pb"))
      .filter(col("ck") === col("ck2") && col("ok") < col("ok2") &&
        col("d2") >= col("d") && col("d2") - col("d") <= bucketDays)
      .groupBy(col("ck").as("custkey"))
      .agg(count(lit(1)).as("n_pairs"), max(col("d2") - col("d")).cast("bigint").as("max_gap_days"))
      .orderBy("custkey")
  }

  /** NULL-SAFE dimension lookup — the `<=>` (IS NOT DISTINCT FROM) join:
   *  orders with a nullable derived key (status 'P' → NULL) joined to a
   *  3-row literal dim whose NULL row catches the unknowns. A plain `=`
   *  join silently DROPS null keys; the null-safe form routes them to the
   *  'unknown' label — the semantics a dimension lookup actually wants.
   *  Broadcast join, one aggregate. */
  def q47NullSafeLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = broadcast(Seq(
      (Some("F"), "final"), (Some("O"), "open"), (None, "pending_unknown"))
      .toDF("dk", "label"))
    Tables.orders(spark, dir)
      .select(nullif(col("o_orderstatus"), lit("P")).as("k"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
      .join(dim, col("k") <=> col("dk"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("total"))
      .orderBy("label")
  }

  /** Exact per-line revenue in 1e-4-dollar units: cents × percent, both
   *  exact integers (prices/discounts carry 2 decimals), so group sums are
   *  order-independent hugeint/decimal(38) arithmetic in both engines. */
  private def revU: org.apache.spark.sql.Column =
    (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("decimal(18,0)") *
      (lit(100).cast("decimal(18,0)") -
        (col("l_discount").cast("decimal(12,2)") * 100).cast("decimal(18,0)"))

  /** TPC-H Q8 shape — national market share: of all PROMO-part revenue
   *  sold to ASIA-region customers, the fraction supplied by NATION_7, per
   *  order year. The canonical star-join stress test: one fact (lineitem)
   *  against four dimension arms (part; orders→customer→nation→region;
   *  supplier→nation), then a single grouped aggregate.
   *
   *  Scale shape: only the 25-row nation / 5-row region dims are forced
   *  broadcast; customer and supplier are NOT (at 100 TB they are
   *  billion-row tables — AQE may still choose broadcast at small SF).
   *  The region filter semi-reduces customers 5× BEFORE the orders join,
   *  and the p_type filter pushes to the part scan, so the two fact-side
   *  shuffles (orderkey, suppkey) carry only qualifying rows. Share is an
   *  exact integer basis-point division; doubles appear only on output. */
  def q60MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val asiaNationKeys = nat
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val asiaCust = Tables.customer(spark, dir)
      .join(broadcast(asiaNationKeys), col("c_nationkey") === col("cnk"), "left_semi")
      .select(col("c_custkey"))
    val asiaOrders = Tables.orders(spark, dir)
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("bigint").as("yr"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val nationRev = when(col("supp_nation") === "NATION_7", col("rev_u"))
      .otherwise(lit(0).cast("decimal(38,0)"))
    Tables.lineitem(spark, dir)
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(asiaOrders, col("l_orderkey") === col("o_orderkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .select(col("yr"), col("supp_nation"), revU.as("rev_u"))
      .groupBy("yr")
      .agg(sum(col("rev_u")).as("den"), sum(nationRev).as("num"))
      .select(col("yr"),
        (col("den").cast("double") / 1e4).as("total_rev"),
        (col("num").cast("double") / 1e4).as("nation_rev"),
        expr("(num * 10000) div den").as("share_bp"))
      .orderBy("yr")
  }

  /** TPC-H Q9 shape — product-line profit by supplier nation × year over
   *  widget parts, with cost proxied at 60% of retail (no partsupp table
   *  in this corpus). Profit is exact integer 1e-6-dollar units:
   *  rev(cents×pct)×100 − qty(hundredths)×retail(cents)×60 — zero float
   *  boundaries until the output column, so the 6-table join tree is
   *  hash-reproducible at any partitioning.
   *
   *  Scale shape: same discipline as q60 — nation broadcast, the p_name
   *  LIKE filter pushed into the part scan (prunes the partkey shuffle),
   *  supplier/orders joins on their natural keys with AQE free to pick
   *  broadcast at small SF and shuffle-hash at 100 TB. */
  def q61ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val widgetParts = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(12,2)") * 100).cast("decimal(18,0)").as("retail_c"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val orderYear = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("bigint").as("yr"))
    val qtyH = (col("l_quantity").cast("decimal(12,2)") * 100).cast("decimal(18,0)")
    Tables.lineitem(spark, dir)
      .join(widgetParts, col("l_partkey") === col("p_partkey"))
      .join(orderYear, col("l_orderkey") === col("o_orderkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .select(col("supp_nation"), col("yr"),
        (revU * 100 - qtyH * col("retail_c") * 60).as("profit_u6"))
      .groupBy("supp_nation", "yr")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("profit_u6")).as("p6"))
      .select(col("supp_nation"), col("yr"), col("n_lines"),
        (col("p6").cast("double") / 1e6).as("profit"))
      .orderBy("supp_nation", "yr")
  }

  /** LOG COMPACTION — the Kafka-compacted-topic / CDC-materialization
   *  semantics: the event stream is a change log keyed by
   *  (user_id, event_type); compaction keeps only the LATEST record per
   *  key, last-writer-wins ordered by (ts, event_id) so concurrent
   *  timestamps still resolve deterministically. q38 merges one change
   *  SET into a base; this collapses the whole unbounded log.
   *
   *  Scale shape: ONE `max_by` hash aggregate — partial compaction
   *  happens map-side inside each scan task before the single shuffle on
   *  the key, which is exactly how a 100 TB log compacts (never a
   *  window/row_number funnel over the full log). Output is bounded by
   *  the live key space, not the log length. */
  def q62LogCompact(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(
        max_by(struct(col("event_id"), col("value")), struct(col("ts"), col("event_id"))).as("last"),
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_changes"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("last_value"),
        col("last_ts"), col("n_changes"))
      .orderBy("user_id", "event_type")

  /** ASSOCIATION RULES over order baskets — support / confidence / lift
   *  for part pairs bought together (the market-basket classic, exact
   *  integers until the one lift division both engines agree on).
   *  Directed rules a→b, minimum pair support 3 applied BEFORE the
   *  dimension joins (a-priori pruning — candidate pairs above threshold
   *  are vanishingly few, so the rule table is small at any scale).
   *
   *  Scale shape: ONE shuffle of lineitem builds per-order BASKET arrays
   *  (`collect_set` dedupes in-agg, so no separate distinct pass; the
   *  parquet layout clusters order keys, so map-side partial aggregation
   *  collapses most of the shuffle — sf10: 7 s vs 14 s for the
   *  distinct-then-self-join form this replaces). Everything else derives
   *  from that one exchange, which ReuseExchange shares across all three
   *  consumers: pair generation explodes each basket's O(basket²) sorted
   *  pairs MAP-SIDE (baskets are small by construction — never a
   *  part-level cartesian, and no 60M-row order-key join re-shuffle);
   *  item counts explode the same arrays; the 1-row order count
   *  broadcasts. Counts partial-aggregate map-side; top-20 by confidence
   *  via TakeOrdered. (The previous form paid the distinct shuffle PLUS
   *  an order-key self-join re-shuffle of both 60M-row sides — 36 s at
   *  sf10 vs 21 s for this plan.) */
  def q64AssocRules(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set("pk")).as("items"))
      // three consumers (order count, item counts, pair explode) and
      // `collect_set` is non-deterministic to the canonicalizer, so
      // ReuseExchange can NOT share the basket shuffle — persist the
      // per-order array frame (rows = |orders|: 150M at sf100) instead of
      // rebuilding it per consumer. Level measured at sf100 (48g, one
      // disk): MEMORY_AND_DISK 255/324 s vs DISK_ONLY 316/447 s — the
      // columnar cache is compressed, so keeping it heap-resident beats
      // contending with shuffle spill for the same spindle
      .persist(Tuning.persistLevel)
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val cnt = baskets.select(explode(col("items")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("cnt"))
      .persist(Tuning.persistLevel) // joined twice (antecedent and consequent sides)
    // pair counts are symmetric: count each unordered pair ONCE (halves
    // the generated pair stream and the aggregate's key space), then
    // emit both rule directions from the counted row. Arrays are sorted,
    // so pairing each element with its suffix yields exactly the u < v
    // unordered pairs. The pair key PACKS into one bigint (u·2³² + v —
    // exact while the HIGH id < 2³¹, i.e. part keys ≲ 2.1·10⁹ ≈ sf10k;
    // they reach ~2·10⁸ at sf100): the pair aggregate is the query's dominant
    // exchange (billions of rows at sf100), and one 8-byte key halves
    // its shuffled key bytes and gives the map-side hash partial
    // aggregation a single-long key instead of a two-column row.
    val undirected = baskets
      .select(col("items"), posexplode(col("items")).as(Seq("i", "u")))
      .select(col("u"),
        explode(slice(col("items"), col("i") + lit(2),
          size(col("items")) - col("i") - lit(1))).as("v"))
      .select((col("u") * lit(4294967296L) + col("v")).as("uv")) // fused map-side
      .groupBy(col("uv"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= 3)
      .select(expr("uv div 4294967296").as("u"),
        pmod(col("uv"), lit(4294967296L)).as("v"), col("pair_n"))
    // both rule directions from ONE counted row (a unionAll of two
    // selects over `undirected` would duplicate the whole 90M-pair agg
    // subplan — the non-deterministic collect_set upstream defeats
    // ReuseExchange, so the duplication is a real second pass)
    val pairs = undirected
      .select(explode(array(
        struct(col("u").as("a"), col("v").as("b")),
        struct(col("v").as("a"), col("u").as("b")))).as("p"), col("pair_n"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("pair_n"))
    pairs
      .join(cnt.select(col("pk").as("a"), col("cnt").as("cnt_a")), "a")
      .join(cnt.select(col("pk").as("b"), col("cnt").as("cnt_b")), "b")
      .crossJoin(broadcast(nOrders)) // 1-row broadcast: no real cross
      .select(col("a"), col("b"), col("pair_n"),
        expr("pair_n * 10000 div n_orders").as("support_bp"),
        expr("pair_n * 10000 div cnt_a").as("confidence_bp"),
        ((col("pair_n") * col("n_orders")).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double")).as("lift"))
      .orderBy(col("confidence_bp").desc, col("a"), col("b"))
      .limit(20)
  }

  /** EXCEPT ALL — bag (multiset) difference, the multiplicity-preserving
   *  set-op q28's distinct EXCEPT can't express: a customer with 5
   *  orders before the cutoff and 2 after keeps 3 rows. Rolled up to
   *  (custkey, surplus) so the multiplicities themselves are the
   *  verified output. Spark plans exceptAll as an aggregate of signed
   *  counts + generator replication — no sort, no distinct. */
  def q65ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cutoff = to_timestamp_ntz(lit("1998-01-01 00:00:00"))
    ord.filter(col("o_orderdate") < cutoff).select(col("o_custkey").as("custkey"))
      .exceptAll(ord.filter(col("o_orderdate") >= cutoff).select(col("o_custkey").as("custkey")))
      .groupBy("custkey").agg(count(lit(1)).as("surplus"))
      .orderBy("custkey")
  }

  /** UNPIVOT (melt) — the wide→long reshape that feeds generic
   *  metric-store sinks: per return flag, the three revenue measures
   *  unpivoted to (flag, measure, value) rows via `stack`, the inverse
   *  of q16's pivot. The stack generator is a narrow projection — the
   *  only shuffle is the small upstream aggregate. */
  def q66Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("price"),
        sum((col("l_extendedprice").cast("decimal(12,2)") *
          col("l_discount").cast("decimal(12,2)"))).cast("double").as("disc"))
      .selectExpr("l_returnflag",
        "stack(3, 'qty', qty, 'price', price, 'disc', disc) as (measure, value)")
      .orderBy("l_returnflag", "measure")

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q65_except_all", q65ExceptAll, Some("""
      SELECT custkey, count(*) AS surplus FROM (
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate < timestamp '1998-01-01 00:00:00'
        EXCEPT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= timestamp '1998-01-01 00:00:00') t
      GROUP BY custkey ORDER BY custkey""")),
    QueryDef("q66_unpivot", q66Unpivot, Some("""
      WITH w AS (
        SELECT l_returnflag,
               cast(sum(cast(l_quantity as decimal(12,2))) as double) AS qty,
               cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS price,
               cast(sum(cast(l_extendedprice as decimal(12,2))
                        * cast(l_discount as decimal(12,2))) as double) AS disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, measure, value
      FROM w UNPIVOT (value FOR measure IN (qty, price, disc))
      ORDER BY l_returnflag, measure""")),
    QueryDef("q64_assoc_rules", q64AssocRules, Some("""
      WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
      cnt AS (SELECT pk, count(*) AS c FROM op GROUP BY pk),
      pairs AS (
        SELECT x.pk AS a, y.pk AS b, count(*) AS pair_n
        FROM op x JOIN op y ON x.ok = y.ok AND x.pk <> y.pk
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT a, b, pair_n,
             cast(pair_n * 10000 // n.n_orders as bigint) AS support_bp,
             cast(pair_n * 10000 // ca.c as bigint) AS confidence_bp,
             cast(pair_n * n.n_orders as double) / cast(ca.c * cb.c as double) AS lift
      FROM pairs
      JOIN cnt ca ON ca.pk = a
      JOIN cnt cb ON cb.pk = b, n
      ORDER BY confidence_bp DESC, a, b LIMIT 20""")),
    QueryDef("q62_log_compact", q62LogCompact, Some("""
      WITH r AS (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id, event_type) AS n_changes,
               max(epoch_us(ts)) OVER (PARTITION BY user_id, event_type) AS mx
        FROM events)
      SELECT user_id, event_type, event_id AS last_event_id, value AS last_value,
             mx * 1000 AS last_ts, n_changes
      FROM r WHERE rn = 1 ORDER BY user_id, event_type""")),
    QueryDef("q60_market_share", q60MarketShare, Some("""
      WITH b AS (
        SELECT year(o_orderdate) AS yr, n2.n_name AS supp_nation,
               cast(cast(l_extendedprice as decimal(12,2)) * 100 as hugeint)
                 * (100 - cast(cast(l_discount as decimal(12,2)) * 100 as hugeint)) AS rev_u
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey)
      SELECT cast(yr as bigint) AS yr,
             cast(sum(rev_u) as double) / 1e4 AS total_rev,
             cast(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_u ELSE 0 END) as double) / 1e4
               AS nation_rev,
             cast(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_u ELSE 0 END) * 10000
                  // sum(rev_u) as bigint) AS share_bp
      FROM b GROUP BY yr ORDER BY yr""")),
    QueryDef("q61_profit_by_nation", q61ProfitByNation, Some("""
      WITH b AS (
        SELECT n_name AS supp_nation, year(o_orderdate) AS yr,
               cast(cast(l_extendedprice as decimal(12,2)) * 100 as hugeint)
                 * (100 - cast(cast(l_discount as decimal(12,2)) * 100 as hugeint)) * 100
               - cast(cast(l_quantity as decimal(12,2)) * 100 as hugeint)
                 * cast(cast(p_retailprice as decimal(12,2)) * 100 as hugeint) * 60 AS profit_u6
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey)
      SELECT supp_nation, cast(yr as bigint) AS yr,
             count(*) AS n_lines,
             cast(sum(profit_u6) as double) / 1e6 AS profit
      FROM b GROUP BY 1, 2 ORDER BY 1, 2""")),
    QueryDef("q47_nullsafe_lookup", q47NullSafeLookup, Some("""
      SELECT label, count(*) AS n,
             cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS total
      FROM (SELECT nullif(o_orderstatus, 'P') AS k, o_totalprice FROM orders) o
      JOIN (VALUES ('F', 'final'), ('O', 'open'), (NULL, 'pending_unknown')) d(k, label)
        ON o.k IS NOT DISTINCT FROM d.k
      GROUP BY label ORDER BY label""")),
    QueryDef("q38_upsert", q38Upsert, Some("""
      WITH base AS (
        SELECT c_custkey AS key, cast(c_acctbal as decimal(12,2)) AS bal FROM customer),
      changes AS (
        SELECT o_custkey AS key, sum(cast(o_totalprice as decimal(12,2))) AS new_bal
        FROM orders WHERE o_custkey % 3 <> 0 GROUP BY 1
        UNION ALL
        SELECT o_custkey + 1000000 AS key, sum(cast(o_totalprice as decimal(12,2))) AS new_bal
        FROM orders WHERE o_custkey % 100 = 0 GROUP BY 1),
      merged AS (
        SELECT CASE WHEN c.new_bal IS NOT NULL AND b.bal IS NOT NULL THEN 'update'
                    WHEN c.new_bal IS NOT NULL THEN 'insert'
                    ELSE 'keep' END AS op,
               coalesce(c.new_bal, b.bal) AS merged_bal
        FROM base b FULL OUTER JOIN changes c USING (key))
      SELECT op, count(*) AS n, cast(sum(merged_bal) as double) AS total_bal
      FROM merged GROUP BY op ORDER BY op""")),
    QueryDef("q34_range_join", q34RangeJoin, Some("""
      SELECT a.o_custkey AS custkey, count(*) AS n_pairs,
             max(date_diff('day', cast(a.o_orderdate as date), cast(b.o_orderdate as date))) AS max_gap_days
      FROM orders a JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND a.o_orderkey < b.o_orderkey
       AND b.o_orderdate >= a.o_orderdate
       AND date_diff('day', cast(a.o_orderdate as date), cast(b.o_orderdate as date)) <= 30
      GROUP BY 1 ORDER BY custkey""")),
    QueryDef("q26_left_outer", q26LeftOuter, Some("""
      SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
             cast(coalesce(sum(cast(o_totalprice as decimal(12,2))), 0) as double) AS spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment
      ORDER BY c_custkey""")),
    QueryDef("q27_full_outer", q27FullOuter, Some("""
      SELECT coalesce(nk_c, nk_s) AS nationkey, n_cust, n_supp FROM
        (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1) c
        FULL OUTER JOIN
        (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) s
        ON nk_c = nk_s
      ORDER BY nationkey""")),
    QueryDef("q28_except", q28Except, Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < timestamp '1998-01-01 00:00:00'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1998-01-01 00:00:00'
      ORDER BY custkey""")),
    QueryDef("q29_union_all", q29UnionAll, Some("""
      SELECT kind, count(*) AS n, cast(sum(bal) as double) AS total_bal, cast(max(bal) as double) AS max_bal
      FROM (
        SELECT 'customer' AS kind, cast(c_acctbal as decimal(12,2)) AS bal FROM customer
        UNION ALL
        SELECT 'supplier' AS kind, cast(s_acctbal as decimal(12,2)) AS bal FROM supplier) u
      GROUP BY kind ORDER BY kind"""))
  )
}
