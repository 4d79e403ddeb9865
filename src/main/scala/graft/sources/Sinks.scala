package graft.sources

import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sink-side layout operators: partitioned parquet writes and the
 * partition-pruned reads they enable — at 100 TB, partitioning by a
 * low-cardinality filter column (date, language, source) is what turns a
 * full-corpus scan into a directory listing.
 */
object Sinks {

  /** Paths already written by THIS process — the builder is invoked for
   *  plan dumps too, which must not re-run the heavy write. */
  private val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write documents partitioned by `lang`, read back with a lang filter —
   *  the read plan prunes to one partition directory (PartitionFilters in
   *  `graft.Plans sink_partition_pruning`), so the count touches only the
   *  matching files. Output oracled against the unpartitioned table.
   *  The output path embeds the Spark application id: concurrent processes
   *  (driver Verify + a developer Bench) must not race each other's
   *  overwrite against a mid-flight read. */
  def partitionPruning(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_sink_" +
      s"${spark.sparkContext.applicationId}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (written.add(out)) {
      Tables.documents(spark, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(out)
    }
    spark.read.parquet(out)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_en_docs"), sum(col("n_chars")).cast("bigint").as("total_chars"))
      .orderBy("source")
  }

  /** Write orders and lineitem BUCKETED (8 buckets, sorted) on the join
   *  key, then join the bucketed tables: both sides arrive pre-partitioned
   *  AND pre-sorted, so the sort-merge join runs with NO shuffle and NO
   *  sort — the layout a 100 TB warehouse uses so its biggest recurring
   *  join never re-shuffles the fact tables (PlanSpec asserts the
   *  shuffle-free join plan). Result oracled against the plain join. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    joinSides(spark, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** The bucket-join input (pre-agg) — separated so the spec can assert
   *  the join subplan is exchange- and sort-free. */
  private[graft] def joinSides(spark: SparkSession, dir: String): DataFrame = {
    val key = s"${spark.sparkContext.applicationId}_$dir".replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_bucketed_$key"
    val (tOrders, tLine) = (s"graft_bkt_orders_$key", s"graft_bkt_lineitem_$key")
    if (written.add(base)) {
      // repartition on the bucket key first: ONE file per bucket, which is
      // the layout Spark trusts to elide the merge-join sort (with several
      // files per bucket only per-file order is known and it re-sorts)
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable(tOrders)
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable(tLine)
    }
    spark.table(tOrders).join(spark.table(tLine),
      col("o_orderkey") === col("l_orderkey"))
  }

  /** CSV round trip — the interchange-format surface: a projection of the
   *  events table written as headered CSV, read back with an EXPLICIT
   *  schema (never inferSchema — a second full scan at any size), and
   *  aggregated. Doubles survive the text round trip exactly (shortest
   *  round-trip formatting on write, exact parse on read), and the
   *  aggregate matches the parquet-direct oracle bit-for-bit. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_csv_" +
      s"${spark.sparkContext.applicationId}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (written.add(out)) {
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").option("header", "true").csv(out)
    }
    spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("header", "true").csv(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** ORC round trip — the second columnar format Spark ships natively:
   *  a lineitem projection written as ORC WITH predicate-pushdown-friendly
   *  layout, read back with a filter that reaches the ORC reader
   *  (`PushedFilters` in the plan, same contract as the parquet scans),
   *  and aggregated. Exercises that the engine's outputs are not
   *  parquet-bound: a warehouse standardized on ORC runs the same plans. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_orc_" +
      s"${spark.sparkContext.applicationId}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (written.add(out)) {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        .write.mode("overwrite").orc(out)
    }
    spark.read.orc(out)
      .filter(col("l_quantity") >= 25.0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("sink_orc_roundtrip", orcRoundtrip, Some("""
      SELECT l_returnflag, count(*) AS n,
             cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS revenue
      FROM lineitem WHERE l_quantity >= 25.0
      GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("sink_csv_roundtrip", csvRoundtrip, Some("""
      SELECT event_type, count(*) AS n,
             cast(sum(cast(value as decimal(12,2))) as double) AS sum_value,
             count(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef("sink_partition_pruning", partitionPruning, Some("""
      SELECT source, count(*) AS n_en_docs, cast(sum(n_chars) as bigint) AS total_chars
      FROM documents WHERE lang = 'en'
      GROUP BY source ORDER BY source""")),
    QueryDef("sink_bucketed_join", bucketedJoin, Some("""
      SELECT o_orderpriority, count(*) AS n_items,
             cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS revenue
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1"""))
  )
}
