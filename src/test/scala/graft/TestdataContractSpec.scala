package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the loader contract against the REAL driver testdata, not fixtures:
 *  whatever physical type `/root/testdata` was (re)generated with, the
 *  loader must hand every consumer `events.ts` as an epoch-NANOSECOND Long.
 *  The r6 regeneration switched events.ts from INT64 TIMESTAMP(NANOS) to
 *  timestamp[us] minutes before the driver ran and 24 queries crashed —
 *  this spec fails locally the moment that class of drift happens again.
 */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // plausibility window for epoch NANOS: 2015-01-01 .. 2035-01-01. A loader
  // that leaks micros (~1.6e15), millis, or seconds lands far outside it.
  private val NanosLo = 1420070400L * 1000000000L
  private val NanosHi = 2051222400L * 1000000000L

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d, "events.parquet").exists())

  test("driver testdata exists for at least one scale factor") {
    assert(sfDirs.nonEmpty, "no /root/testdata sf dirs found")
  }

  for (dir <- sfDirs) {
    test(s"events.ts loads as epoch-nanos Long from $dir") {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == LongType,
        s"loader contract: ts must be LongType, got ${ev.schema("ts").dataType}")
      val r = ev.agg(min("ts"), max("ts"), count(lit(1))).head()
      val (lo, hi, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n > 0)
      assert(lo >= NanosLo && hi <= NanosHi,
        s"ts range [$lo, $hi] is not plausible epoch nanos — loader normalization broke")
    }
  }

  // the generalized r6 lesson: a regeneration can change ANY table's shape
  // minutes before a driver run — pin every table's loaded column set so
  // drift fails a local test instead of 24 driver queries
  private val ExpectedCols = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  test("every testdata table loads with the column set the suite assumes") {
    val dir = sfDirs.head
    for ((t, cols) <- ExpectedCols) {
      val got = Tables.load(spark, dir, t).schema.fieldNames.toSeq
      assert(got == cols, s"$t column drift: got $got")
    }
  }

  test("streamed events carry the same Long-nanos ts as the batch loader") {
    // the streaming source path normalizes independently of Tables.load;
    // both must agree bit-for-bit on (min, max, sum-hash) of ts
    val dir = sfDirs.head
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val batch = Tables.events(spark, dir)
      .agg(min("ts"), max("ts"), bit_xor(xxhash64(col("ts")))).head()
    val name = s"ts_contract_${java.lang.Long.toHexString(System.nanoTime())}"
    // private streaming source goes through EventStreams' public replay
    // entries; here it is enough to check the schema-on-read path used there
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val q = Tables.normalizeTs(
        spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
          .parquet(dir).where(lit(true)))
      .agg(min("ts").as("mn"), max("ts").as("mx"), bit_xor(xxhash64(col("ts"))).as("h"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name).head()
    assert(streamed.getLong(0) == batch.getLong(0))
    assert(streamed.getLong(1) == batch.getLong(1))
    assert(streamed.getLong(2) == batch.getLong(2))
  }
}
