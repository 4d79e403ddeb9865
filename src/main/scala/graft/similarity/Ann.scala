package graft.similarity

import graft.Tables
import graft.Tables.QueryDef
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over the embedding column (`Array[Float]`, 64-dim).
 *
 * Two paths, mirroring how a 100 TB pipeline would tier them:
 *  - brute-force top-k: the exactness baseline. The QUERY set is broadcast
 *    (it's small by construction); the corpus side streams map-side —
 *    no shuffle of the corpus, one narrow pass + per-query top-k heap
 *    (TakeOrderedAndProject shape after the window filter).
 *  - IVF-style partitioned search: corpus pre-assigned to its nearest
 *    centroid (a broadcast argmin pass, done once and cheap to persist);
 *    queries probe only their own cell — the classic recall/cost trade.
 *    Centroids here are seed vectors taken deterministically from the
 *    corpus; a production build would k-means them, the Spark plumbing is
 *    identical.
 *
 * All vector math is double-cast before multiply so scores are reproducible
 * and comparable with the DuckDB oracle's double cosine.
 */
object Ann {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force top-5 cosine neighbors for query vectors
   *  (vec_id < 8), self excluded; rank ties broken by neighbor id. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = broadcast(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    emb.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(asDouble(col("q_emb")), asDouble(col("embedding"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** IVF-style search: 16 deterministic centroids (vec_id < 16), corpus
   *  assigned to nearest centroid by dot product, queries (vec_id < 8)
   *  search only their own cell. Emits top-3 in-cell neighbors. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = broadcast(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb")))
    val byVec = Window.partitionBy("vec_id").orderBy(col("dot").desc, col("centroid_id"))
    val assigned = emb.crossJoin(centroids)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        dot(asDouble(col("embedding")), asDouble(col("c_emb"))).as("dot"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("cell"))
      .persist() // the cell assignment feeds both the query set and the corpus side
    val queries = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(queries), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(asDouble(col("q_emb")), asDouble(col("embedding"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN: hyperplane signature as the cell key instead of
   *  centroids — zero model state, works on any scale, lower recall. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val sigs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        hyperplaneSig(asDouble(col("embedding")), 8, dim).as("cell"))
      .persist() // signature feeds both the query set and the probe join
    val queries = broadcast(sigs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    sigs.join(queries, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(asDouble(col("q_emb")), asDouble(col("embedding"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("ann_bruteforce_topk", bruteForceTopK, Some("""
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                          e.vec_id) AS rank
        FROM embeddings q
        JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < 8) t
      WHERE rank <= 5
      ORDER BY query_id, rank""")),
    QueryDef("ann_ivf_topk", ivfTopK, None),
    QueryDef("ann_lsh_topk", lshTopK, None)
  )
}
