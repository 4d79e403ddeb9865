package graft.functions

/**
 * Generator for the DuckDB CTEs that reproduce [[HyperplaneSigExpr]]'s
 * bucket assignment BIT-FOR-BIT in SQL (shared by the dedup_embedding and
 * ann_lsh_topk oracles).
 *
 * Every piece is deterministic arithmetic: the plane-matrix entries are
 * rationals `pmod(xxh64, 100003)/100003 − 0.5` (the xxh64 values are
 * computed HERE at generation time and embedded as integer literals), and
 * the plane dot products accumulate left-to-right in double — the SQL's
 * left-associative `+` chains perform the identical IEEE operation
 * sequence as the expression's fused loop. The signature width replicates
 * [[graft.similarity.Ann.sigBits]] with an exact integer CASE ladder (no
 * floating log2 at integer boundaries).
 */
object HyperplaneOracle {

  val Dim = 64
  val MaxPlanes = 30

  private def planeConst(p: Int, j: Int): String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h = XXH64.hashInt(j, XXH64.hashInt(p, 42L))
    val r = h % 100003L
    val m = if (r < 0) r + 100003L else r
    s"($m/100003.0 - 0.5)"
  }

  def elem(tbl: String, j: Int): String = s"cast($tbl.embedding[${j + 1}] as double)"

  /** CTE list `bits, v, s` where `s(vec_id, embedding, nrm, sig)` carries
   *  the signature and the exact squared norm. Paste after `WITH`. */
  lazy val sigCtes: String = {
    val dots = (0 until MaxPlanes).map { p =>
      val terms = (0 until Dim).map(j => s"${elem("embeddings", j)}*${planeConst(p, j)}")
      s"(${terms.mkString(" + ")}) AS d$p"
    }.mkString(",\n             ")
    val nrmTerms = (0 until Dim).map(j => s"${elem("embeddings", j)}*${elem("embeddings", j)}")
    val sigSum = (0 until MaxPlanes)
      .map(p => s"(CASE WHEN $p < b AND d$p > 0 THEN ${1 << p} ELSE 0 END)")
      .mkString(" + ")
    val ladder = (MaxPlanes to 1 by -1)
      .map(k => s"WHEN x >= ${1L << (k - 1)} THEN $k").mkString(" ")
    s"""bits AS (
      |        SELECT least(30, greatest(8, CASE $ladder ELSE 0 END)) AS b
      |        FROM (SELECT greatest(1, count(*) // 64) - 1 AS x FROM embeddings)),
      |      v AS (
      |        SELECT vec_id, embedding,
      |             $dots,
      |             (${nrmTerms.mkString(" + ")}) AS nrm
      |        FROM embeddings),
      |      s AS (SELECT vec_id, embedding, nrm, $sigSum AS sig FROM v, bits)""".stripMargin
  }
}
