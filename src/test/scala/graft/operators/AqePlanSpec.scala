package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The PlanSpec invariants asserted on FINALIZED adaptive plans — what a
 *  real cluster actually executes. AQE re-plans joins from runtime stats
 *  (demote/promote broadcast, coalesce partitions, split skew), so a guard
 *  that only checks the initial static plan could pass while AQE silently
 *  rewrites the shape at scale. Each test runs the query, then asserts on
 *  `executedPlan` AFTER execution (isFinalPlan=true). */
class AqePlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect() // materializes — AQE finalizes every stage
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("isFinalPlan=false"), s"$q plan not finalized:\n$p")
    p
  }

  test("AQE is on (the cluster default this suite certifies under)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("q3/q5: dimension joins stay broadcast in the finalized plan") {
    for (q <- Seq("q3_shipping_priority", "q5_region_revenue"))
      assert(finalPlan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast under AQE")
  }

  test("no cartesian products materialize at runtime") {
    for (q <- Seq("q1_pricing_summary", "q5_region_revenue", "dedup_minhash_lsh",
                  "q26_left_outer", "q44_funnel"))
      assert(!finalPlan(q).contains("CartesianProduct"), s"$q finalized to a cartesian")
  }

  test("ANN top-k stays the bounded aggregate, never an AQE-introduced window") {
    for (q <- Seq("ann_bruteforce_topk", "ann_ivf_topk")) {
      val p = finalPlan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q lost the bounded top-k aggregate")
      assert(!p.contains("Window"), s"$q gained a window under AQE")
    }
  }

  test("graph_pagerank: rank joins finalize as broadcasts — the edge table never re-shuffles per round") {
    val p = finalPlan("graph_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    // 3 rounds × (rank ⋈ edges): the O(nodes) rank side must broadcast in
    // the finalized plan; a sort-merge join would shuffle the full edge
    // table every round
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "per-round rank joins must broadcast the small rank table:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q31: the salted join is still a shuffle join after AQE re-planning") {
    // the salt exists to spread one hot key across reducers; AQE demoting
    // the join to broadcast would silently defeat the demonstration, and
    // promoting it is fine only if the salt keys still shuffle — pin it
    assert(finalPlan("q31_salted_join").contains("ShuffledHashJoin"))
  }

  test("AQE coalesces undersized shuffle partitions in the finalized plan") {
    // with shuffle.partitions sized for the full corpus (32 here, thousands
    // on a cluster), a small aggregate's reduce side would otherwise run
    // one near-empty task per configured partition — at 100 TB settings
    // that's thousands of no-op tasks per stage. The finalized plan must
    // show the AQEShuffleRead collapsing them to the data's actual size.
    val p = finalPlan("q4_order_priority")
    assert(p.contains("AQEShuffleRead coalesced"),
      s"expected coalesced shuffle reads in the finalized plan:\n$p")
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    // Spark's InjectRuntimeFilter: when a shuffle join's creation side
    // carries a selective predicate, a bloom filter built from its join
    // keys is pushed into the application side's SCAN — at 100 TB this is
    // the difference between shuffling the whole fact table and shuffling
    // only rows that can match. Engagement depends on size thresholds the
    // toy corpus can't meet (application side must look like a 10 GB+
    // scan), so shrink them the same way the skew test does and pin that
    // the rewrite actually fires on our join shape.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      import org.apache.spark.sql.functions._
      val orders = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      val li = graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
      val j = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"runtime bloom filter did not inject into the application-side scan:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE skew-split engages on a synthetic skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      // shrink the thresholds to toy scale: one key owns ~95% of the rows,
      // so its shuffle partition exceeds both the absolute threshold and
      // 5x the median — exactly the shape a 100 TB hot key produces
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import org.apache.spark.sql.functions._
      val hot = spark.range(0, 200000)
        .select(when(col("id") < 190000, 0L).otherwise(col("id") % 97).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 97).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = hot.join(dim, "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
