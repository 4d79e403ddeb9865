package graft.operators

import graft.Tables
import graft.Tables.QueryDef
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis queries over the documents table: token statistics,
 * quality features, language ID, fingerprinting. All map-side column
 * expressions + one aggregation — the cheapest possible shape for a
 * 100 TB corpus scan (no shuffle except the final small groupBy).
 */
object TextQueries {

  /** Per-language token statistics. tokenCount is plain length arithmetic,
   *  so the oracle can replicate it exactly. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        sum(tokenCount(col("text")).cast("long")).as("total_tokens"),
        max(tokenCount(col("text")).cast("long")).as("max_tokens"),
        sum(col("n_chars")).as("total_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** Per-document integer quality features — exact-arithmetic columns only,
   *  mirrored 1:1 in the oracle. */
  def qualityFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        punctCount(col("text")).cast("long").as("n_punct"),
        meanTokenLenX100(col("text")).as("mean_tok_len_x100"),
        (length(col("text")) === col("n_chars")).as("len_consistent"))
      .orderBy("doc_id")

  /** Heuristic quality score + language ID per doc (composite heuristics —
   *  rows-only check), aggregated per source for a compact result. */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), qualityScore(col("text")).as("q"), langId(col("text")).as("pred_lang"))
      .groupBy("source")
      .agg(
        round(avg(col("q")), 3).as("avg_quality"),
        count(when(col("pred_lang") === "en", 1)).as("n_pred_en"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Language-ID confusion: predicted vs labeled language counts. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  /** Document fingerprints (rolling hash) for the lowest doc_ids — the
   *  per-doc form of dedup_fingerprint. xxhash64-based → rows-only. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id")

  val defs: Vector[QueryDef] = Vector(
    QueryDef("text_token_stats", tokenStats, Some("""
      SELECT lang,
             cast(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END) as bigint) AS total_tokens,
             cast(max(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END) as bigint) AS max_tokens,
             cast(sum(n_chars) as bigint) AS total_chars,
             count(*) AS n_docs
      FROM documents GROUP BY lang ORDER BY lang""")),
    QueryDef("text_quality_features", qualityFeatures, Some("""
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS n_tokens,
             length(text) - length(translate(text, '.,;:!?', '')) AS n_punct,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE (length(replace(trim(text), ' ', '')) * 100)
                       / (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1) END AS mean_tok_len_x100,
             length(text) = n_chars AS len_consistent
      FROM documents ORDER BY doc_id""")),
    QueryDef("text_quality_by_source", qualityBySource, None),
    QueryDef("text_lang_confusion", langConfusion, None),
    QueryDef("text_fingerprints", fingerprints, None)
  )
}
