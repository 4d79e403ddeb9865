package graft.similarity

/**
 * Generator for a DuckDB oracle that reproduces the FULL Lloyd k-means
 * training of [[Ann.kmeansCentroids]] (k=16, 3 iterations) plus the
 * cell-probe search of [[Ann.kmeansIvfTopK]] — making the trained-IVF
 * query hash-checkable instead of rows-only.
 *
 * Every stage replays the engine's exact arithmetic:
 *  - assignment scores `2·x·c − ‖c‖²` as left-associative double `+`
 *    chains (the same IEEE operation order as the fused
 *    [[graft.functions.ArrayDot]] loop and Scala's `map(v*v).sum`);
 *    argmax ties to the lowest cell (`row_number … ORDER BY s DESC, cell`
 *    ≡ `array_position(scores, array_max(scores))`);
 *  - centroid means as exact DECIMAL(27,10) dimension sums (float widened
 *    to double first — DuckDB's direct FLOAT→DECIMAL cast rounds through
 *    float arithmetic and diverges; via DOUBLE it matches Spark's cast
 *    bit-for-bit, verified over the corpus), divided in double after a
 *    correctly-rounded VARCHAR→DOUBLE parse (the twin of the engine's
 *    `Double.parseDouble(dec.toPlainString)`);
 *  - empty cells keep their previous centroid (LEFT JOIN + coalesce).
 */
object KmeansOracle {

  val K = 16
  val Dim = 64
  val Iters = 3

  /** Left-associative dot chain `e.embedding · c.cl` (embedding is FLOAT,
   *  widened per element exactly like ArrayDot). */
  private def dotChain: String =
    (1 to Dim).map(j => s"cast(e.embedding[$j] as double)*c.cl[$j]").mkString(" + ")

  /** Left-associative `‖c‖²` chain — Scala's `c.map(v => v*v).sum`. */
  private def nrmChain: String =
    (1 to Dim).map(j => s"c.cl[$j]*c.cl[$j]").mkString(" + ")

  private def assignCte(it: Int): String =
    s"""a$it AS MATERIALIZED (
       |        SELECT vec_id, embedding, cell FROM (
       |          SELECT e.vec_id, e.embedding, c.cell,
       |                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |                   (2.0*($dotChain) - ($nrmChain)) DESC, c.cell) AS rn
       |          FROM embeddings e, c$it c) t
       |        WHERE rn = 1)""".stripMargin

  private def meansAndNextCte(it: Int): String =
    s"""m$it AS MATERIALIZED (
       |        SELECT cell, i AS dim,
       |               cast(cast(sum(cast(cast(embedding[i] as double) as decimal(27,10))) as varchar) as double)
       |                 / count(*) AS val
       |        FROM a$it, unnest(range(1, ${Dim + 1})) u(i)
       |        GROUP BY cell, i),
       |      c${it + 1} AS MATERIALIZED (
       |        SELECT c.cell, coalesce(n.cl, c.cl) AS cl
       |        FROM c$it c LEFT JOIN (
       |          SELECT cell, list(val ORDER BY dim) AS cl FROM m$it GROUP BY cell) n
       |        ON n.cell = c.cell)""".stripMargin

  /** The complete oracle SQL for ann_kmeans_ivf. */
  lazy val sql: String = {
    val seed =
      s"""c0 AS MATERIALIZED (
         |        SELECT vec_id AS cell, list_transform(embedding, x -> cast(x as double)) AS cl
         |        FROM embeddings WHERE vec_id < $K)""".stripMargin
    val rounds = (0 until Iters).map(it => s"${assignCte(it)},\n      ${meansAndNextCte(it)}")
    val finalAssign = assignCte(Iters)
    s"""
       |      WITH $seed,
       |      ${rounds.mkString(",\n      ")},
       |      $finalAssign,
       |      q AS (SELECT vec_id AS query_id, embedding AS q_emb, cell
       |            FROM a$Iters WHERE vec_id < 8)
       |      SELECT query_id, neighbor_id, rank FROM (
       |        SELECT q.query_id, a.vec_id AS neighbor_id,
       |               row_number() OVER (
       |                 PARTITION BY q.query_id
       |                 ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) DESC,
       |                          a.vec_id) AS rank
       |        FROM a$Iters a JOIN q ON a.cell = q.cell
       |        WHERE a.vec_id <> q.query_id) t
       |      WHERE rank <= 3
       |      ORDER BY query_id, rank""".stripMargin
  }
}
