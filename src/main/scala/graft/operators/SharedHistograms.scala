package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The per-corpus exact price histograms — the two value distributions the
 *  whole robust-stat family (sketch_stats, q69 equiheight, q87 Tukey on
 *  lineitem; q80 MAD, q86 Bowley, q88 winsorized on orders) is a pure
 *  functional of. Built once per (application, corpus) via
 *  [[ScalableRank.sharedValueCounts]]; each table is bounded by its VALUE
 *  DOMAIN (~600k distinct price cents regardless of row count), so after
 *  the one build scan every consumer runs in O(domain) — no further
 *  corpus scans. This is the classic warehouse statistics artifact
 *  (equi-height histogram source), kept exact. */
object SharedHistograms {
  /** (cents, __c) over lineitem l_extendedprice in exact decimal cents. */
  def lineitemPriceCounts(spark: SparkSession, dir: String): DataFrame =
    ScalableRank.sharedValueCounts(spark, dir, "lineitem_extendedprice_cents", "cents") {
      Tables.lineitem(spark, dir).select(
        expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as decimal(38,0))")
          .cast("long").as("cents"))
    }

  /** (cents, __c) over orders o_totalprice in exact decimal cents. */
  def ordersPriceCounts(spark: SparkSession, dir: String): DataFrame =
    ScalableRank.sharedValueCounts(spark, dir, "orders_totalprice_cents", "cents") {
      Tables.orders(spark, dir).select(
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as decimal(38,0))")
          .cast("long").as("cents"))
    }
}
