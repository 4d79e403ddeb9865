package graft.similarity

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, posexplode, udaf}

/** One scored candidate: higher `score` wins, ties broken by lower `id`. */
final case class Scored(score: Double, id: Long)

/**
 * Bounded top-k aggregate — the scale-safe form of "top k per group".
 *
 * A `row_number().over(Window.partitionBy(groupCol))` top-k shuffles EVERY
 * scored row into one reducer per group; with few groups (e.g. 8 ANN query
 * ids against a whole corpus) that is a handful of straggler tasks doing
 * all the work. This aggregator instead keeps an O(k) buffer per group per
 * map task, and Spark's partial aggregation (ObjectHashAggregate) merges
 * the buffers: the shuffle carries only #groups × #tasks × k rows, and no
 * task ever sees more than its own partition.
 *
 * The buffer is kept sorted (best first), so the common no-op case — a row
 * worse than the current k-th — is a single comparison against the last
 * element.
 */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def zero: Seq[Scored] = Vector.empty

  def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.size >= k && !better(in, buf.last)) buf
    else (buf :+ in).sortWith(better).take(k)

  def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sortWith(better).take(k)

  def finish(r: Seq[Scored]): Seq[Scored] = r

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

/** One string-keyed candidate: LOWER `score` wins (lexicographic), ties
 *  broken by lower `id` — the ordering of a deterministic hash sample. */
final case class ScoredStr(score: String, id: Long)

/** Bounded BOTTOM-k by string key — same scale story as [[TopKAgg]] (O(k)
 *  buffer per group per map task, only buffers shuffle), for per-stratum
 *  deterministic sampling: keep the k lexicographically-smallest
 *  (hash, id) pairs per group instead of a per-group row_number window. */
class TopKMinStrAgg(k: Int) extends Aggregator[ScoredStr, Seq[ScoredStr], Seq[ScoredStr]] {
  private def better(a: ScoredStr, b: ScoredStr): Boolean =
    a.score < b.score || (a.score == b.score && a.id < b.id)

  def zero: Seq[ScoredStr] = Vector.empty

  def reduce(buf: Seq[ScoredStr], in: ScoredStr): Seq[ScoredStr] =
    if (buf.size >= k && !better(in, buf.last)) buf
    else (buf :+ in).sortWith(better).take(k)

  def merge(a: Seq[ScoredStr], b: Seq[ScoredStr]): Seq[ScoredStr] =
    (a ++ b).sortWith(better).take(k)

  def finish(r: Seq[ScoredStr]): Seq[ScoredStr] = r

  def bufferEncoder: Encoder[Seq[ScoredStr]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredStr]] = ExpressionEncoder()
}

object TopK {

  /** `topK(k)(scoreCol, idCol)` → `array<struct<score,id>>`, best first. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k))

  /** `topKMinStr(k)(hashCol, idCol)` → the k smallest, in order. */
  def topKMinStr(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKMinStrAgg(k))

  /** Explode a grouped top-k result into (group..., id, rank) rows with a
   *  1-based BIGINT rank. `top` must be the aggregator's output column. */
  def explodeRanks(grouped: org.apache.spark.sql.DataFrame,
                   groupCol: String, idAlias: String): org.apache.spark.sql.DataFrame =
    grouped
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), col("col.id").as(idAlias),
        (col("pos") + 1).cast("bigint").as("rank"))
}
