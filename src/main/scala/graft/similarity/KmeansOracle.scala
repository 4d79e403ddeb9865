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

  /** Shared CTE prefix — seed, the Lloyd training rounds, and the final
   *  assignment `a$Iters(vec_id, embedding, cell)` — reused by both the
   *  trained-IVF search oracle and the SemDeDup oracle (one training, two
   *  consumers, mirroring how the engine shares [[Ann.kmeansCentroids]]). */
  private def trainedCtesFor(kExpr: String): String = {
    val seed =
      s"""c0 AS MATERIALIZED (
         |        SELECT vec_id AS cell, list_transform(embedding, x -> cast(x as double)) AS cl
         |        FROM embeddings WHERE vec_id < $kExpr)""".stripMargin
    val rounds = (0 until Iters).map(it => s"${assignCte(it)},\n      ${meansAndNextCte(it)}")
    s"""$seed,
       |      ${rounds.mkString(",\n      ")},
       |      ${assignCte(Iters)}""".stripMargin
  }

  private lazy val trainedCtes: String = trainedCtesFor(K.toString)

  /** Corpus-scaled cell count k = max(16, ⌈√n⌉) as a SQL scalar — the
   *  exact twin of the engine's `math.max(16, ceil(sqrt(n)))` (IEEE sqrt
   *  is correctly rounded in both engines, the [[Ann.knnGraph]]
   *  precedent). Only the SEED CTE depends on k, so the whole Lloyd
   *  unroll works unchanged at any corpus size. */
  private val KDyn: String =
    "greatest(16, cast(ceil(sqrt(cast((SELECT count(*) FROM embeddings) as double))) as bigint))"

  /** The complete oracle SQL for ann_kmeans_ivf. */
  lazy val sql: String = {
    s"""
       |      WITH $trainedCtes,
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

  /** Oracle for ann_recall_report: the trained-IVF top-3 (the same chain
   *  as [[sql]]) LEFT-joined against the exact brute-force top-3 ground
   *  truth, hits counted per query in integer basis points. */
  lazy val recallSql: String = {
    s"""
       |      WITH $trainedCtes,
       |      q AS (SELECT vec_id AS query_id, embedding AS q_emb, cell
       |            FROM a$Iters WHERE vec_id < 8),
       |      ivf AS (
       |        SELECT query_id, neighbor_id FROM (
       |          SELECT q.query_id, a.vec_id AS neighbor_id,
       |                 row_number() OVER (
       |                   PARTITION BY q.query_id
       |                   ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) DESC,
       |                            a.vec_id) AS rank
       |          FROM a$Iters a JOIN q ON a.cell = q.cell
       |          WHERE a.vec_id <> q.query_id) t
       |        WHERE rank <= 3),
       |      bf AS (
       |        SELECT query_id, neighbor_id FROM (
       |          SELECT qq.vec_id AS query_id, e.vec_id AS neighbor_id,
       |                 row_number() OVER (
       |                   PARTITION BY qq.vec_id
       |                   ORDER BY list_cosine_similarity(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
       |                            e.vec_id) AS rank
       |          FROM embeddings qq JOIN embeddings e ON e.vec_id <> qq.vec_id
       |          WHERE qq.vec_id < 8) t
       |        WHERE rank <= 3)
       |      SELECT b.query_id,
       |             cast(count(i.neighbor_id) as bigint) AS n_hit,
       |             cast(count(i.neighbor_id) * 10000 // 3 as bigint) AS recall_bp
       |      FROM bf b LEFT JOIN ivf i
       |        ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
       |      GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
  }

  /** Oracle for dedup_semantic (SemDeDup): the trained assignment chain
   *  at the CORPUS-SCALED cell count [[KDyn]] (√n cells keep the in-cell
   *  pair join ~n^1.5 — the fixed-16 variant OOM-scaled as n²/16 and ate
   *  153 s of the sf10 suite), then within-cell pairwise cosines as
   *  left-associative double
   *  `+` chains — the identical IEEE operation order as the fused
   *  [[graft.functions.ArrayCosine]] loop (the construction already
   *  validated bit-for-bit by the dedup_embedding oracle), so the ≥ 0.3
   *  threshold decides identically on both sides. Output is integer-only
   *  (ids + counts); no float crosses the compare boundary. */
  lazy val semdedupSql: String = {
    val nrm = (1 to Dim)
      .map(j => s"cast(embeddings.embedding[$j] as double)*cast(embeddings.embedding[$j] as double)")
      .mkString(" + ")
    val xy = (1 to Dim)
      .map(j => s"cast(a.embedding[$j] as double)*cast(b.embedding[$j] as double)")
      .mkString(" + ")
    s"""
       |      WITH ${trainedCtesFor(KDyn)},
       |      v AS MATERIALIZED (SELECT vec_id, ($nrm) AS nrm FROM embeddings),
       |      r AS (
       |        SELECT *, row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rs
       |        FROM a$Iters),
       |      p AS (
       |        SELECT b.vec_id AS dup_id, a.vec_id AS id_a,
       |               CASE WHEN sqrt(va.nrm) * sqrt(vb.nrm) = 0 THEN 0.0
       |                    ELSE ($xy) / (sqrt(va.nrm) * sqrt(vb.nrm)) END AS cos
       |        FROM r a JOIN r b
       |          ON a.cell = b.cell
       |         AND b.rs - a.rs BETWEEN 1 AND ${graft.dedup.Dedup.SemDedupWindow}
       |        JOIN v va ON va.vec_id = a.vec_id
       |        JOIN v vb ON vb.vec_id = b.vec_id)
       |      SELECT dup_id, min(id_a) AS kept_id, cast(count(*) as bigint) AS n_sim
       |      FROM p WHERE cos >= 0.3 GROUP BY dup_id ORDER BY dup_id""".stripMargin
  }
}
