package graft.similarity

import graft.Tuning
import graft.Tables
import graft.Tables.QueryDef
import graft.functions.TextFunctions._
import graft.similarity.TopK._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the embedding column (`Array[Float]`, 64-dim).
 *
 * Two paths, mirroring how a 100 TB pipeline would tier them:
 *  - brute-force top-k: the exactness baseline. The QUERY set is broadcast
 *    (it's small by construction); the corpus side streams map-side —
 *    no shuffle of the corpus, one narrow pass.
 *  - IVF-style partitioned search: corpus pre-assigned to its nearest
 *    centroid (a broadcast argmax pass, done once and cheap to persist);
 *    queries probe only their own cell — the classic recall/cost trade.
 *    `ivfTopK` uses deterministic seed vectors (which keeps it
 *    SQL-oracle-able); `kmeansIvfTopK` runs the production path — real
 *    Lloyd training via [[kmeansCentroids]] with order-independent
 *    decimal sums, so the index build is reproducible on any cluster.
 *
 * Top-k everywhere is the bounded [[TopKAgg]] aggregate, NOT a
 * `row_number()` window: a window partitioned by query_id would funnel the
 * whole corpus×queries product into #queries reducer tasks, a single-task
 * bottleneck at scale. The aggregate pre-reduces to O(k) per group per map
 * task and only the tiny buffers shuffle.
 *
 * All vector math runs in the native codegen'd expressions
 * ([[graft.functions.ArrayDot]]/[[graft.functions.ArrayCosine]]) which
 * widen each float element to double before multiply — bit-identical to
 * the DuckDB oracle's CAST(... AS DOUBLE[]) cosine, with no extra
 * array-cast pass per row.
 */
object Ann {

  /** Hyperplane signature width by corpus size: bits ≈ log2(n / target)
   *  keeps the expected bucket population ~`target` as the corpus grows
   *  (2^bits buckets), so the intra-bucket candidate join never goes
   *  quadratic. Floor of 8 bits; cap of 30 (int shift range). */
  def sigBits(corpusSize: Long, targetBucket: Long = 64L): Int = {
    val buckets = math.max(1L, corpusSize / math.max(1L, targetBucket))
    math.min(30, math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)))
  }

  /** Lloyd k-means over the embedding corpus — the real centroid training
   *  the IVF index needs. Seeds are the lowest `k` vec_ids (deterministic);
   *  each round broadcast-assigns every vector to its nearest centroid
   *  (argmin L2 via the expanded form `argmax 2x·c − ‖c‖²`, computed with
   *  the native [[graft.functions.ArrayDot]]) and recomputes means with
   *  EXACT DECIMAL dimension sums — order-independent, so the centroids
   *  are bit-identical on any partitioning, which makes the index build
   *  reproducible. The per-dimension sums run as `dim` SEPARATE decimal
   *  `sum` aggregates over `element_at` in ONE hash-aggregate pass — never
   *  a `posexplode`, whose dim× row Expand would push the whole corpus
   *  through the aggregate dim times per iteration. Only assignments are
   *  distributed; the k×dim centroid table itself stays a broadcast
   *  literal. Empty cells keep their old centroid. */
  /** Lloyd training memoized per (application, dir, k, iters) — the
   *  trained centroid table is a per-corpus INDEX ARTIFACT (k×dim
   *  doubles, driver-side tiny): the IVF search and SemDeDup both
   *  cluster the same corpus with the same parameters, and a production
   *  deployment trains that index once and fans out, exactly like the
   *  dedup module's shingle-index snapshot. */
  private val centroidCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, Int), Array[Array[Double]]]
  def trainedCentroids(spark: SparkSession, dir: String, k: Int, iters: Int): Array[Array[Double]] =
    centroidCache.getOrElseUpdate((spark.sparkContext.applicationId, dir, k, iters),
      kmeansCentroids(Tables.embeddings(spark, dir), k, iters))

  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = emb.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = centroids.head.length
    // element_at(embedding, d+1) cast to decimal — the same cast expression
    // the old exploded form applied per element, so the summed values (and
    // the DuckDB oracle) are unchanged; decimal addition is exact, hence
    // order-independent across partitions
    val dimSums = (0 until dim).map(d =>
      sum(element_at(col("embedding"), d + 1).cast("decimal(27,10)")).as(s"s$d"))
    for (_ <- 1 to iters) {
      val cells = assignCellsScalable(emb, centroids)
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .collect() // k tiny rows (one per non-empty cell) — the only driver-side data
      val next = centroids.map(_.clone())
      cells.foreach { r =>
        val cell = r.getInt(0); val n = r.getLong(1)
        var d = 0
        while (d < dim) {
          // decimal → double via the PLAIN-STRING parse, not doubleValue():
          // parseDouble is correctly rounded and so is a SQL engine's
          // VARCHAR→DOUBLE cast, which lets the DuckDB oracle reproduce the
          // conversion bit-for-bit (a direct DECIMAL→DOUBLE cast is
          // implementation-defined double-rounding territory)
          next(cell)(d) = java.lang.Double.parseDouble(r.getDecimal(2 + d).toPlainString) / n
          d += 1
        }
      }
      centroids = next
    }
    centroids
  }

  /** `2·x·c − ‖c‖²` per centroid — argmax of this equals argmin ‖x−c‖².
   *  Each centroid rides as ONE array literal (`typedLit`), not `dim`
   *  scalar literal nodes: with k=16, dim=64 the per-element form put
   *  1024 literal expressions in the tree and Janino compilation of the
   *  generated class dominated the whole query's first run (10 s vs a
   *  3 s steady state at sf0.1 — and the fresh-JVM driver bench pays the
   *  compile every round). Same doubles, same dot — bit-identical. */
  private def cellScores(centroids: Array[Array[Double]]): Column =
    array(centroids.map { c =>
      val cLit = typedLit(c.toSeq)
      val norm2 = c.map(v => v * v).sum
      lit(2.0) * dot(col("embedding"), cLit) - lit(norm2)
    }: _*)

  /** Nearest-centroid assignment as a single map-side expression:
   *  cell = argmax of [[cellScores]], ties to the lowest cell id
   *  (array_position returns the first maximum). */
  def assignCells(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val scores = cellScores(centroids)
    emb.withColumn("cell",
      (array_position(scores, array_max(scores)) - 1).cast("int"))
  }

  /** JOIN-BASED nearest-centroid assignment — the large-k twin of
   *  [[assignCells]], returning (vec_id, embedding, cell). The literal-
   *  array form generates k fused dot loops in ONE codegen'd expression —
   *  unbeatable at k = 16, but at the √n cell counts the scaled SemDeDup
   *  needs (k ≈ 450 at 200k vectors) the generated class blows past
   *  JVM method limits and compilation cost. Here each centroid is a
   *  broadcast ROW instead: corpus × k scored pairs through one hash
   *  argmax. Bit-identical scores (same 2·x·c − ‖c‖² with the same
   *  driver-computed ‖c‖² and the same [[graft.functions.ArrayDot]]
   *  accumulation) and the same lowest-cell tiebreak
   *  (`max_by(score, −cid)` ≡ first array maximum) — AssignEquivSpec
   *  pins the two paths equal. */
  private[graft] def assignCellsJoin(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = broadcast(centroids.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, c.map(v => v * v).sum) }.toSeq.toDF("cid", "cl", "nrm"))
    emb.select(col("vec_id"), col("embedding")).crossJoin(cents)
      .select(col("vec_id"), col("embedding"), col("cid"),
        (lit(2.0d) * dot(col("embedding"), col("cl")) - col("nrm")).as("score"))
      .groupBy("vec_id")
      .agg(first("embedding").as("embedding"),
        max_by(col("cid"), struct(col("score"), (-col("cid")).as("nid"))).as("cell"))
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** MATRIX-EXPRESSION nearest-centroid assignment — all k centroids ride
   *  in one [[graft.functions.NearestCellExpr]] node (plan data, not
   *  code), so assignment is a pure map-side projection at ANY k: no k×
   *  row expansion, no corpus-wide hash argmax, no Janino blowup. Same
   *  scores, same lowest-cell tiebreak as [[assignCellsJoin]]
   *  (AssignEquivSpec pins the three paths equal); replacing the join
   *  form cut ann_knn_graph's assignment stage from 17 s to map-side
   *  noise at sf10. `l2 = false` scores by plain dot (the kNN-graph /
   *  max-cosine-numerator cell rule) instead of 2·x·c − ‖c‖². */
  private[graft] def assignCellsMatrix(emb: DataFrame, centroids: Array[Array[Double]],
      l2: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val norms = if (l2) Some(centroids.map(_.map(v => v * v).sum)) else None
    val cellCol = ColumnBridge.column(graft.functions.NearestCellExpr(
      ColumnBridge.expression(col("embedding")), centroids, norms))
    emb.select(col("vec_id"), col("embedding"), cellCol.as("cell"))
  }

  /** Pick the assignment implementation by centroid count: the fused
   *  literal expression up to 32 cells (validated codegen path, free
   *  subexpression sharing with other per-row score uses), the matrix
   *  expression beyond. Returns the narrow (vec_id, embedding, cell)
   *  shape all paths provide. */
  private[graft] def assignCellsScalable(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    if (centroids.length <= 32)
      assignCells(emb, centroids).select(col("vec_id"), col("embedding"), col("cell"))
    else assignCellsMatrix(emb, centroids)

  /** Within-cluster sum of squares for a given centroid set — the k-means
   *  objective (‖x−c‖² = x·x − max score), used by the spec to check the
   *  Lloyd iterations improve it. */
  def wcss(emb: DataFrame, centroids: Array[Array[Double]]): Double =
    emb.select((dot(col("embedding"), col("embedding")) - array_max(cellScores(centroids))).as("d2"))
      .agg(sum("d2")).head().getDouble(0)

  /** Exact brute-force top-5 cosine neighbors for query vectors
   *  (vec_id < 8), self excluded; rank ties broken by neighbor id. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = broadcast(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val grouped = emb.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(5)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(grouped, "query_id", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** RADIUS (range) SEARCH — the other retrieval API besides top-k:
   *  ALL vectors within a cosine threshold of each query (here τ = 0.30,
   *  queries vec_id < 8), the shape behind "find every near-duplicate /
   *  every relevant chunk", where k is unknowable in advance. Run in the
   *  int8-QUANTIZED domain ([[quantize]]'s exact formula) so the
   *  threshold test is INTEGER-exact on both engines: cos(a,b) ≥ τ ⟺
   *  dot > 0 ∧ 10⁴·dot² ≥ (100τ)²·‖a‖²·‖b‖² — cross-multiplied squares,
   *  no sqrt, no float compare at the knife edge (a float-cosine
   *  membership test can flip on the 17th digit; an integer one cannot).
   *  Scale shape: the 8-query set broadcasts against one corpus scan
   *  (the [[bruteForceTopK]] baseline discipline; the IVF cell route is
   *  the scale path for big query sets). Headroom: dot ≤ 127²·d ≈ 10⁶ at
   *  d = 64, so 10⁴·dot² ≈ 10¹⁶ < 2⁶³. */
  def rangeSearch(spark: SparkSession, dir: String): DataFrame =
    rangeSearchQuant(rangeQuantSnapshot(spark, dir))

  /** [[rangeSearch]] over an arbitrary (vec_id, embedding) corpus — the
   *  spec feeds constructed corpora through both range paths. */
  def rangeSearchOn(emb: DataFrame): DataFrame =
    rangeSearchQuant(rangeQuantPlan(emb))

  private def rangeSearchQuant(quant: DataFrame): DataFrame = {
    val queries = broadcast(quant.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"), col("n2").as("qn2")))
    rangeMembership(quant.crossJoin(queries))
  }

  /** The native quantization as a Column ([[graft.functions.Int8QuantizeExpr]]). */
  private def quantStruct(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.Int8QuantizeExpr(ColumnBridge.expression(c)))
  }

  /** The one-pass quantization plan for the radius family:
   *  (vec_id, qd: ARRAY<DOUBLE> of int8-scale integers, n2: Σq² BIGINT) —
   *  [[quantize]]'s exact formula fused into one native loop
   *  ([[graft.functions.Int8QuantizeExpr]]). The HOF chain this replaces
   *  was ~6 ms/row after projection collapse inlined the scale expression
   *  per ELEMENT (sf10 profile); the fused loop is ~100 ns and
   *  bit-identical, so the DuckDB oracle is unchanged. */
  private[similarity] def rangeQuantPlan(emb: DataFrame): DataFrame = {
    // SPREAD THE SCAN first: the sf10 embeddings table is a single 50 MB
    // split — without this the whole family runs on 1-2 threads no matter
    // how many cores the session has. A one-off shuffle of the raw float
    // arrays is pennies; on a real cluster (splits ≥ cores) it's a no-op.
    val sc = emb.sparkSession.sparkContext
    val spread =
      if (emb.rdd.getNumPartitions < sc.defaultParallelism)
        emb.repartition(sc.defaultParallelism)
      else emb
    spread.select(col("vec_id"), quantStruct(col("embedding")).as("z"))
      .select(col("vec_id"), col("z.qd").as("qd"), col("z.n2").as("n2"))
  }

  /** Per-(application, dir) SNAPSHOT of the quantized corpus — the
   *  radius family's shared index artifact (the [[graft.dedup.Dedup]]
   *  shingle-index discipline): brute and IVF paths, their query
   *  subsets, and the IVF seed collect all read these materialized rows
   *  instead of re-running the quantization per consumer. */
  private val rangeQuantCache =
    graft.CorpusCaches.register(scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private[similarity] def rangeQuantSnapshot(spark: SparkSession, dir: String): DataFrame =
    rangeQuantCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      import org.apache.spark.sql.graft.DatasetBridge
      DatasetBridge.snapshot(rangeQuantPlan(Tables.embeddings(spark, dir))).df
    })

  /** The exact integer membership test + output shape shared by the brute
   *  and IVF-pruned radius searches: input must carry
   *  (query_id, qqd, qn2) × (vec_id, qd, n2) candidate pairs. */
  private def rangeMembership(cands: DataFrame): DataFrame =
    cands
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        // exact: the double dot of int8-scale vectors is integral < 2⁵³;
        // the cast recovers the long the cross-multiplied test needs
        dot(col("qd"), col("qqd")).cast("long").as("dot"), col("n2"), col("qn2"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >= lit(RangeTauPct * RangeTauPct) * col("n2") * col("qn2"))
      .select(col("query_id"), col("neighbor_id"),
        expr("(2 * dot * dot * 10000 + n2 * qn2) div (2 * n2 * qn2)").as("cos2_bp"))
      .orderBy("query_id", "neighbor_id")

  /** Cosine threshold τ·100 for the radius-search family. */
  private[similarity] val RangeTauPct = 30L

  /** Pruning slack in cosine units: a cell is probed unless its sound
   *  upper bound falls 0.01 BELOW τ. The bound below is exact math on the
   *  same quantized integers the membership test uses; the only error is
   *  a few ulps of double rounding in ÷/√ — 0.01 is ~10¹³ × that, so a
   *  pruned cell provably contains no qualifying vector and the IVF path
   *  returns EXACTLY the brute-force answer (RangeSearchSpec pins
   *  equality). */
  private[similarity] val RangePruneSlack = 0.01d

  /** IVF-PRUNED radius search — the 100 TB serving path for
   *  [[rangeSearch]] (same τ, same queries, same integer membership test,
   *  IDENTICAL results — the oracle is literally the brute-force SQL).
   *
   *  Index build (once per corpus, all map-side over the quant snapshot):
   *   1. assign every non-zero quantized vector to its max-cosine seed
   *      centroid (vec_id < 16, the [[ivfTopK]] discipline) — the seeds
   *      ride as LITERALS, so assignment is one codegen'd argmax
   *      expression: no crossJoin, no groupBy, no corpus shuffle;
   *   2. per cell, keep m = min cosine(member, centroid) — the cosine of
   *      the cell's ANGULAR RADIUS r.
   *
   *  Probe: for query q and cell c with a = cos∠(q,c), the spherical
   *  triangle inequality ∠(q,x) ≥ ∠(q,c) − r for any member x gives the
   *  sound bound cos∠(q,x) ≤ cos(∠(q,c) − r) = a·m + √(1−a²)·√(1−m²)
   *  (or 1 when ∠(q,c) ≤ r). Cells whose bound < τ − [[RangePruneSlack]]
   *  are never scanned; surviving (query, cell) pairs broadcast-join the
   *  cell-partitioned corpus and run the exact test on that slice only.
   *  On clustered corpora (tight cells, the real embedding shape) this
   *  prunes most of the corpus per query; on this synthetic random corpus
   *  cells are near-degenerate (r → 90°+) and the bound keeps everything —
   *  which is the CORRECT answer for an exact radius search, and exactly
   *  why the spec also pins pruning on a constructed clustered corpus. */
  def rangeSearchIvf(spark: SparkSession, dir: String): DataFrame =
    rangeSearchIvfQuant(rangeQuantSnapshot(spark, dir))

  /** [[rangeSearchIvf]] over an arbitrary (vec_id, embedding) corpus. */
  def rangeSearchIvfOn(emb: DataFrame): DataFrame =
    rangeSearchIvfQuant(rangeQuantPlan(emb))

  private def rangeSearchIvfQuant(quant: DataFrame): DataFrame = {
    val idx = rangeIvfIndexQuant(quant)
    rangeMembership(idx.assigned.join(broadcast(rangeIvfProbes(idx)), "cell"))
  }

  /** The per-corpus radius-search index: cell-assigned quantized corpus,
   *  broadcast centroid table, per-cell angular radius. All four frames
   *  are cheap map-side derivations of the quant snapshot. */
  private[similarity] final case class RangeIvfIndex(
      nz: DataFrame, cents: DataFrame, assigned: DataFrame, cellStats: DataFrame)

  /** [[rangeIvfIndexQuant]] from a raw corpus — the spec entry point. */
  private[similarity] def rangeIvfIndex(emb: DataFrame): RangeIvfIndex =
    rangeIvfIndexQuant(rangeQuantPlan(emb))

  private[similarity] def rangeIvfIndexQuant(quant: DataFrame): RangeIvfIndex = {
    val nz = quant.filter(col("n2") > 0) // zero vectors can never pass dot > 0
    // the 16 seed centroids are a tiny driver-side artifact (16×64
    // values); as LITERALS the assignment argmax is one map-side
    // expression over the corpus. Index cosines run in DOUBLE: every
    // per-element product and partial sum over int8-scale values is an
    // integer ≪ 2⁵³, so the doubles are exact. Only the MEMBERSHIP test
    // (cross-multiplied squares up to 10¹⁶ > 2⁵³) needs long arithmetic.
    val centRows: Array[(Int, Seq[Double], Double)] = nz.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("qd"), col("n2")).orderBy("vec_id").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1), r.getLong(2).toDouble))
    // one fused matrix loop per row (struct of winning index + its cosine);
    // the 16-wide array-of-ArrayDot column this replaces was rebuilt 3× by
    // projection collapse (cell, position, score) — 75 s of the sf10 cost
    val cosAssign = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.functions.NearestCellCosExpr(
        ColumnBridge.expression(col("qd")),
        centRows.map(_._2.toArray), centRows.map(_._3)))
    }
    val cellIds = typedLit(centRows.map(_._1).toSeq)
    val assigned = nz
      .select(col("vec_id"), col("qd"), col("n2"), cosAssign.as("z"))
      .select(col("vec_id"), col("qd"), col("n2"),
        // 0-based loop index → seed vec_id (seeds are sorted, so first
        // strict maximum in the loop ⇒ lowest seed id on ties, as before)
        element_at(cellIds, (col("z.cell") + lit(1)).cast("int")).as("cell"),
        col("z.ccos").as("ccos"))
    val cents = broadcast(nz.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("qd").as("cqd"), col("n2").as("cn2")))
    val cellStats = assigned.groupBy("cell").agg(min("ccos").as("m"))
    RangeIvfIndex(nz, cents, assigned, cellStats)
  }

  /** Surviving (cell, query) probe pairs under the sound bound — factored
   *  out so the spec can assert the bound actually prunes on a clustered
   *  corpus. */
  private[similarity] def rangeIvfProbes(idx: RangeIvfIndex): DataFrame = {
    val tau = RangeTauPct.toDouble / 100.0d
    idx.nz.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"), col("n2").as("qn2"))
      .crossJoin(idx.cents)
      .select(col("query_id"), col("qqd"), col("qn2"), col("cid").as("cell"),
        (dot(col("qqd"), col("cqd")) /
          sqrt(col("qn2").cast("double") * col("cn2").cast("double"))).as("a"))
      .join(idx.cellStats, "cell")
      .filter(
        when(col("a") >= col("m"), lit(1.0d))
          .otherwise(col("a") * col("m") +
            sqrt(greatest(lit(0.0d), lit(1.0d) - col("a") * col("a")) *
                 greatest(lit(0.0d), lit(1.0d) - col("m") * col("m"))))
          >= lit(tau - RangePruneSlack))
      .select(col("cell"), col("query_id"), col("qqd"), col("qn2"))
  }

  /** CELL LABEL PURITY — does the vector index's geometry respect the
   *  labels: per IVF cell (the 16 deterministic centroids), the
   *  majority label's share in half-up bp. The clustering-evaluation
   *  twin of [[recallReport]] — low purity predicts bad filtered-search
   *  and bad SemDeDup behavior before anyone ships the index. One
   *  broadcast-argmax assignment pass (no window), one bounded
   *  two-level rollup; the majority election is the packed-argmax
   *  discipline (cnt·2³² + (2³²−1−label)). */
  def cellPurity(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = broadcast(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb")))
    val assigned = emb.crossJoin(centroids)
      .select(col("vec_id"), col("label"), col("centroid_id"),
        dot(col("embedding"), col("c_emb")).as("dot"))
      .groupBy("vec_id")
      .agg(first("label").as("label"),
        max_by(col("centroid_id"), struct(col("dot"), (-col("centroid_id")).as("nid"))).as("cell"))
    assigned.groupBy("cell", "label").agg(count(lit(1)).as("c"))
      .groupBy("cell")
      .agg(sum("c").as("n_vectors"),
        max(expr("c * 4294967296 + (4294967295 - label)")).as("sc"))
      .select(col("cell"), col("n_vectors"),
        expr("4294967295 - (sc % 4294967296)").as("majority_label"),
        expr("sc div 4294967296").as("n_majority"),
        expr("(2 * (sc div 4294967296) * 10000 + n_vectors) div (2 * n_vectors)").as("purity_bp"))
      .orderBy("cell")
  }

  /** HYBRID SEARCH with RECIPROCAL RANK FUSION — the production
   *  retrieval shape: fuse a SEMANTIC ranking (cosine top-20 shortlist
   *  per query) with a RECENCY ranking (global newest-20 shortlist,
   *  vec_id as ingestion order), score = Σ ⌊10⁶/(60+rank)⌋ over the
   *  lists a candidate appears in (RRF, Cormack et al. 2009; k = 60),
   *  emit the fused top-5. Production hybrid search fuses SHORTLISTS —
   *  each ranker contributes its top-K, absent⇒no contribution — so no
   *  ranker ever needs a global window over the corpus: the cosine
   *  shortlist is the bounded [[TopK]] aggregate, the recency shortlist
   *  is a TakeOrdered limit ranked inside its own 20 rows. The floor
   *  division keeps the fused score INTEGER — rank arithmetic that can't
   *  float-drift between engines. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = broadcast(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val cosShort = explodeRanks(
      emb.crossJoin(queries)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("q_emb"), col("embedding")).as("cos"))
        .groupBy("query_id")
        .agg(topK(20)(col("cos"), col("neighbor_id")).as("top")),
      "query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("rank").as("cr"))
    // newest-20 shortlist: bounded limit, ranked within its own 20 rows
    val recency = broadcast(
      emb.select(col("vec_id").as("neighbor_id"))
        .orderBy(col("neighbor_id").desc).limit(20)
        .withColumn("rr", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("neighbor_id").desc))
          .cast("bigint")))
    val recPerQuery = queries.select(col("query_id")).crossJoin(recency)
      .filter(col("neighbor_id") =!= col("query_id"))
    val fused = cosShort.join(recPerQuery, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(expr("1000000 div (60 + cr)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rr)"), lit(0L))).as("rrf_e6"))
    explodeRanks(
      fused.groupBy("query_id")
        .agg(topK(5)(col("rrf_e6").cast("double"), col("neighbor_id")).as("top")),
      "query_id", "neighbor_id")
      .join(fused, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("rrf_e6"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF-style search: 16 deterministic centroids (vec_id < 16), corpus
   *  assigned to nearest centroid by dot product (broadcast argmax — a
   *  partial-aggregated `max_by`, no window), queries (vec_id < 8) search
   *  only their own cell. Emits top-3 in-cell neighbors. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = broadcast(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb")))
    val assigned = emb.crossJoin(centroids)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        dot(col("embedding"), col("c_emb")).as("dot"))
      .groupBy("vec_id")
      .agg(
        first(col("embedding")).as("embedding"),
        // argmax with a deterministic tiebreak: highest dot, then lowest id
        max_by(col("centroid_id"), struct(col("dot"), (-col("centroid_id")).as("nid"))).as("cell"))
      .persist(Tuning.persistLevel) // the cell assignment feeds both the query set and the corpus side
    val queries = broadcast(assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell")))
    val grouped = assigned.join(queries, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(grouped, "query_id", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** IVF with TRAINED centroids: Lloyd iterations ([[kmeansCentroids]])
   *  instead of raw seed vectors, then the same cell-probe search as
   *  [[ivfTopK]] — the production index-build path. Oracle-checked via the
   *  GENERATED full-Lloyd unroll ([[KmeansOracle]]): 3 assignment rounds +
   *  exact-decimal centroid means reproduced in SQL, bit-for-bit. */
  def kmeansIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = trainedCentroids(spark, dir, k = 16, iters = 3)
    val assigned = assignCells(emb, centroids).persist(Tuning.persistLevel)
    val queries = broadcast(assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell")))
    val grouped = assigned.join(queries, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(grouped, "query_id", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** FILTERED vector search — the RAG-retrieval shape: top-3 cosine
   *  neighbors restricted by a metadata predicate (here: the candidate must
   *  share the query's `label`). The predicate participates in the JOIN KEY
   *  (broadcast hash join on label), so filtering happens before any
   *  distance is computed — the corpus rows that fail the filter are
   *  discarded at the probe, never scored. That is the scale-correct order:
   *  post-filtering an unfiltered top-k (the naive composition) both scores
   *  too much and under-fills k. */
  def filteredTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = broadcast(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("label").as("q_label")))
    val grouped = emb.join(queries,
        col("label") === col("q_label") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(grouped, "query_id", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Symmetric INT8 QUANTIZATION of the embedding corpus — the index-
   *  compression pass a 100 TB vector store runs before serving (4× smaller
   *  than float32, SIMD-friendly dot products). Per vector: scale
   *  s = max|v_i|, q_i = round-half-up(127·v_i/s) ∈ [−127, 127]. Output
   *  carries integer witnesses of the quantized values (position-weighted
   *  checksum + L1 norm), so the oracle verifies the quantized BYTES.
   *  Every float op is an explicit left-to-right IEEE double chain the
   *  DuckDB oracle replays exactly (the dedup_embedding convention). Pure
   *  map-side per-row arithmetic — no shuffle. */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    emb
      .select(col("vec_id"), col("embedding"),
        array_max(transform(col("embedding"), x => abs(x.cast("double")))).as("s"))
      .select(col("vec_id"), col("s"),
        transform(col("embedding"), x =>
          when(col("s") === 0.0d, lit(0L))
            .otherwise(floor(lit(127.0d) * x.cast("double") / col("s") + lit(0.5d)))).as("q"))
      .select(
        col("vec_id"),
        size(col("q")).cast("long").as("n_dims"),
        aggregate(
          zip_with(col("q"), sequence(lit(1L), size(col("q")).cast("long")), (x, i) => x * i),
          lit(0L), (acc, x) => acc + x).as("q_checksum"),
        aggregate(transform(col("q"), x => abs(x)), lit(0L), (acc, x) => acc + x).as("q_l1"),
        col("s").as("scale"))
      .orderBy("vec_id")
  }

  /** All `bits`-wide XOR masks with popcount ≤ radius — the multi-probe
   *  neighborhood of an LSH bucket, enumerated combinatorially (never
   *  2^bits). */
  private[similarity] def probeMasks(bits: Int, radius: Int): Seq[Int] =
    (0 to radius).flatMap(k =>
      (0 until bits).combinations(k).map(_.foldLeft(0)((m, b) => m | (1 << b))))

  /** MULTI-PROBE LSH-bucketed ANN: hyperplane signature as the cell key
   *  instead of centroids — zero model state, works on any scale. Each
   *  query probes every bucket within Hamming radius 4 of its own
   *  signature (the standard multi-probe trick: a true neighbor's
   *  signature differs in a few low-margin bits far more often than it
   *  lands in the exact same bucket, so probing the Hamming ball
   *  multiplies recall at a tiny candidate cost — Σ₀⁴C(bits,k) of 2^bits
   *  buckets, 0.01 % at the 24-bit width a 10⁹-vector corpus gets from
   *  [[sigBits]]). The probe set rides the broadcast query side as an
   *  exploded (query, cell) list; the corpus is never re-hashed.
   *  On this corpus (random vectors, weakest-possible LSH structure)
   *  radius 4 at 8 bits measures recall@3 ≈ 0.7 vs exact brute force
   *  (RecallSpec) — the zero-model fallback tier; the trained-IVF tier is
   *  the higher-recall path. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val emb = Tables.embeddings(spark, dir)
    val bits = sigBits(emb.count())
    val sigs = emb
      .select(col("vec_id"), col("embedding"),
        hyperplaneSig(col("embedding"), bits, dim).as("cell"))
      .persist(Tuning.persistLevel) // signature feeds both the query set and the probe join
    val masks = typedlit(probeMasks(bits, radius = 4))
    val queries = broadcast(sigs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(transform(masks, m => col("cell").bitwiseXOR(m))).as("cell")))
    val grouped = sigs.join(queries, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(grouped, "query_id", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** MATRYOSHKA two-stage retrieval — coarse-to-fine, the production
   *  latency/recall trade for progressive embeddings: stage 1 scores the
   *  corpus on the 16-dim PREFIX only (4× less arithmetic per pair and a
   *  4× smaller index in a real deployment) and keeps a top-10 shortlist
   *  per query via the bounded aggregate; stage 2 re-ranks ONLY the
   *  shortlist (a broadcast of #queries × 10 ids) at full dimension. At
   *  100 TB the corpus-wide pass touches prefix bytes only — the full
   *  vectors are fetched for the shortlist alone, which is the whole
   *  point of matryoshka-ordered embeddings. */
  /** Stage 1 of [[matryoshkaTopK]] — the width-10 prefix-cosine shortlist
   *  as `(query_id, neighbor_id)` rows. Exposed so RecallSpec can measure
   *  shortlist coverage of the true top-3 independently of the (exact)
   *  rerank stage. */
  def matryoshkaShortlist(spark: SparkSession, dir: String): DataFrame =
    matryoshkaShortlistOf(Tables.embeddings(spark, dir))

  /** [[matryoshkaShortlist]] over an arbitrary `(vec_id, embedding)` corpus
   *  — lets RecallSpec drive the same stage-1 plan against a
   *  prefix-concentrated variant of the corpus to show the width is an
   *  embedding-structure question, not an operator parameter to inflate. */
  private[similarity] def matryoshkaShortlistOf(emb: DataFrame, width: Int = 10): DataFrame = {
    val pre = 16
    val queries = broadcast(emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val coarse = emb.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(slice(col("q_emb"), 1, pre), slice(col("embedding"), 1, pre)).as("c"))
      .groupBy("query_id")
      .agg(topK(width)(col("c"), col("neighbor_id")).as("top"))
    explodeRanks(coarse, "query_id", "neighbor_id")
      .select("query_id", "neighbor_id")
  }

  def matryoshkaTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = broadcast(emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val shortlist = broadcast(matryoshkaShortlist(spark, dir))
    val rerank = emb.join(shortlist, col("vec_id") === col("neighbor_id"))
      .join(queries, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(rerank, "query_id", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** PRODUCT-QUANTIZED ANN with asymmetric distance computation (Jégou,
   *  Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
   *  Search") — the index-compression tier between [[quantize]]'s flat
   *  INT8 and the IVF cell probes: the 64-dim vector splits into 8
   *  subspaces of 8 dims, each subvector encoded as its nearest of 16
   *  codewords, so a corpus vector is EIGHT BYTES in the index (32×
   *  smaller than float32). A query never decodes the corpus: it builds
   *  one 8×16 distance table against the codebook and scores each corpus
   *  vector as 8 table lookups summed — the ADC scan, which is why PQ is
   *  the 100 TB serving shape (the full vectors are never read again
   *  after encoding).
   *
   *  Everything runs in an INTEGER domain so the DuckDB oracle matches
   *  bit-for-bit: vectors are first quantized on a single GLOBAL scale
   *  (per-vector scales would make distances incomparable), all
   *  distances are exact integer sums of squares (≤ 8·254² per
   *  subspace — far inside BIGINT), and the per-subspace argmin packs
   *  (dist·16 + codeword) into one `array_min` with ties to the lowest
   *  codeword. The codebook is the quantized subvectors of the 16 lowest
   *  vec_ids — the standard sampled init (production would Lloyd-train
   *  per subspace exactly like [[kmeansCentroids]]); it is K×64 longs of
   *  driver-side bookkeeping, never data.
   *
   *  Scale shape: encoding is one map-side narrow pass (no shuffle);
   *  queries broadcast WITH their distance tables precomputed, so the
   *  corpus-side work per row is 8 array lookups + adds; top-3 per query
   *  is the bounded [[TopKAgg]]. Nothing shuffles but O(k) buffers. */
  def pqTopK(spark: SparkSession, dir: String): DataFrame =
    pqTopKOf(Tables.embeddings(spark, dir))

  /** [[pqTopK]] over an arbitrary `(vec_id, embedding)` corpus — lets
   *  PqSpec drive the same plan against a cluster-structured variant to
   *  show recall is an embedding-structure question (random vectors are
   *  the adversarial case for any 8-byte code). */
  private[similarity] def pqTopKOf(emb: DataFrame): DataFrame = {
    val M = 8; val K = 16; val w = 8 // M subspaces × w dims; K codewords each
    // one corpus max-abs scalar — the global quantization scale (bookkeeping)
    val gs = emb.agg(
      max(array_max(transform(col("embedding"), x => abs(x.cast("double")))))).head().getDouble(0)
    require(gs > 0.0, "PQ needs a non-degenerate corpus (all-zero embeddings)")
    // same round-half-up chain as quantize, on the global scale
    val quantized = transform(col("embedding"), x =>
      floor(lit(127.0d) * x.cast("double") / lit(gs) + lit(0.5d)))
    val quant = emb.select(col("vec_id"), quantized.as("q"))
    // codebook = quantized subvectors of the K lowest vec_ids (K×64 longs)
    val cb: Array[Array[Long]] = quant.filter(col("vec_id") < K).orderBy("vec_id")
      .collect().map(_.getSeq[Long](1).toArray) // K tiny rows — the only driver-side data
    require(cb.length == K, s"corpus must contain the $K codebook seed vectors")
    def cwLit(s: Int): Column = array((0 until K).map(c =>
      array((0 until w).map(i => lit(cb(c)(s * w + i))): _*)): _*)
    def subv(s: Int): Column = slice(col("q"), s * w + 1, w)
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
    // each query ships its 8×16 ADC table, built once on the broadcast side
    // (8 rows — the HOF form is fine there; the CORPUS-side encode and the
    // per-(row, query) ADC lookup-sum run as fused native expressions:
    // the HOF encode cost M·K·w ≈ 1000 interpreted lambda steps per row)
    val qtab = array((0 until M).map(s => transform(cwLit(s), cw => sqd(subv(s), cw))): _*)
    import org.apache.spark.sql.graft.ColumnBridge
    val codes = ColumnBridge.column(graft.functions.PqEncodeExpr(
      ColumnBridge.expression(col("embedding")), gs, cb, w))
    val encoded = emb.select(col("vec_id"), codes.as("code"))
    val queries = broadcast(quant.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), qtab.as("qt")))
    val adc = ColumnBridge.column(graft.functions.PqAdcExpr(
      ColumnBridge.expression(col("qt")), ColumnBridge.expression(col("code"))))
    val grouped = encoded.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adc.as("pq_dist"))
      // lower distance wins: negate into the (higher-better) bounded top-k;
      // pq_dist ≤ 8·8·254² ≈ 4.1M, exact in the double score
      .groupBy("query_id")
      .agg(topK(3)((-col("pq_dist")).cast("double"), col("neighbor_id")).as("top"))
    grouped.select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("bigint").as("rank"),
        (-col("col.score")).cast("bigint").as("pq_dist"))
      .orderBy("query_id", "rank")
  }

  /** Per-dimension normalization statistics — the pass every embedding
   *  pipeline runs before scaling/whitening or index building: mean, min
   *  and max of each of the 64 dimensions. ONE hash aggregate computes
   *  all 192 statistics in a single corpus pass (the same
   *  `element_at`-per-dimension discipline as the Lloyd trainer — never a
   *  posexplode, whose 64× Expand would push the corpus through the
   *  aggregate once per dimension); the 1×192 result reshapes to 64 rows
   *  with a driver-side `stack`. Means are exact decimal sums rendered
   *  through the plain-string parse, so the oracle agrees bit-for-bit. */
  def dimStats(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    // mean on the 1e-7-quantized grid: trunc(v·10⁷) is an exact integer
    // (no rounding TIE exists under truncation, unlike any decimal cast),
    // so the sum is order-independent and engine-exact
    val aggs = (0 until dim).flatMap(d => Seq(
      sum(expr(s"cast(cast(element_at(embedding, ${d + 1}) as double) * 1e7 as long)")).as(s"s$d"),
      min(element_at(col("embedding"), d + 1).cast("double")).as(s"mn$d"),
      max(element_at(col("embedding"), d + 1).cast("double")).as(s"mx$d")))
    val row1 = Tables.embeddings(spark, dir)
      .agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = (0 until dim).map(d => s"${d + 1}L, s$d, mn$d, mx$d").mkString(", ")
    row1.selectExpr("n", s"stack($dim, $stackArgs) as (dim, s, vmin, vmax)")
      .select(col("dim"),
        expr("cast(s as double) / n / 1e7").as("mean"),
        col("vmin"), col("vmax"))
      .orderBy("dim")
  }

  /** Per-label centroid vectors — the class prototypes a
   *  nearest-centroid classifier or a per-class drift monitor runs on.
   *  Same single-pass discipline as [[dimStats]]: one hash aggregate
   *  computes all labels × 64 dims (element_at per dimension, never a
   *  posexplode Expand), means on the exact 1e-7 truncation grid so both
   *  engines sum the same integers in any order. Output is labels × 64
   *  rows — bounded by the label vocabulary, not the corpus. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val aggs = (0 until dim).map(d =>
      sum(expr(s"cast(cast(element_at(embedding, ${d + 1}) as double) * 1e7 as long)")).as(s"s$d"))
    val g = Tables.embeddings(spark, dir)
      .groupBy(col("label").cast("bigint").as("label"))
      .agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = (0 until dim).map(d => s"${d + 1}L, s$d").mkString(", ")
    g.selectExpr("label", "n", s"stack($dim, $stackArgs) as (dim, s)")
      .select(col("label"), col("dim"), col("n"),
        expr("cast(s as double) / n / 1e7").as("centroid"))
      .orderBy("label", "dim")
  }

  /** ANN recall evaluation AS A QUERY — the index-quality report a
   *  production retrieval pipeline recomputes after every index rebuild:
   *  the trained-IVF top-3 joined against the exact brute-force top-3
   *  ground truth, hits per query in integer basis points. Composes the
   *  two existing pipelines (the k-means centroids are the memoized
   *  per-corpus artifact, so training is not repeated); the join is
   *  queries×k rows — negligible against either search. RecallSpec's
   *  floors remain the regression guard; this entry makes the metric a
   *  first-class, oracled output. */
  def recallReport(spark: SparkSession, dir: String): DataFrame = {
    val ivf = kmeansIvfTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val bf = bruteForceTopK(spark, dir).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    bf.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        expr("n_hit * 10000 div 3").as("recall_bp"))
      .orderBy("query_id")
  }

  /** One POWER-ITERATION step on the Gram matrix from the all-ones start
   *  — the distributed matrix-vector product (w = XᵀX·1) that seeds a
   *  dominant-direction estimate for PCA/whitening. Exact integers on
   *  the 1e-7 grid end to end: per row the map-side HOF fold computes
   *  sᵢ = Σ_d x_id (one pass over the array), the single hash aggregate
   *  sums x_id·sᵢ per dimension in DECIMAL(38) (sums exceed 2⁶³ long
   *  before they exceed 38 digits by ~10¹⁸×), and only the output column
   *  renders to double. One corpus scan, one 1-row aggregate reshaped to
   *  64 rows — the same shape as [[dimStats]]. */
  def powerIteration(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val xs = (0 until dim).map(d =>
      expr(s"cast(cast(element_at(embedding, ${d + 1}) as double) * 1e7 as long)").as(s"x$d"))
    val base = Tables.embeddings(spark, dir).select(
      (expr("aggregate(embedding, 0L, (a, v) -> a + cast(cast(v as double) * 1e7 as long))").as("s")
        +: xs): _*)
    val aggs = (0 until dim).map(d =>
      sum((col(s"x$d") * col("s")).cast("decimal(38,0)")).as(s"w$d"))
    val row1 = base.agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = (0 until dim).map(d => s"${d + 1}L, w$d").mkString(", ")
    row1.selectExpr("n", s"stack($dim, $stackArgs) as (dim, w)")
      .select(col("dim"), col("n"), col("w").cast("double").as("w"))
      .orderBy("dim")
  }

  /** EMBEDDING OUTLIER detection per label — vectors whose squared
   *  distance to their class centroid exceeds 3× the class RMS distance
   *  (the "mislabeled or corrupted vector" screen an embedding pipeline
   *  runs before training a classifier). The cut is 5% above the class
   *  RMS distance² — in high dimension squared distances CONCENTRATE
   *  (relative spread O(1/√d) ≈ 12% at d=64; the classic 3σ cut flags
   *  nothing), so the threshold is calibrated to the concentration
   *  regime. Float-free by cross-multiplying the centroid away: with
   *  S_d = Σx_d and n per label,
   *  ‖x − S/n‖² > 1.05·mean(‖·‖²)  ⟺  20·n·d2_i > 21·Σd2  where
   *  d2_i = Σ_d (n·x_d − S_d)² — exact DECIMAL(38)/hugeint integers on
   *  the 1e-7 grid end to end (max term ~10²⁷, headroom to 10³⁸), so the
   *  cut decides identically on any partitioning and in both engines.
   *
   *  Scale shape: one stats pass (label × 64 sums, broadcast back), one
   *  distance pass, one rollup — three aggregates, no joins wider than
   *  the label-stats broadcast. */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    def xq(d: Int) =
      expr(s"cast(cast(element_at(embedding, ${d + 1}) as double) * 1e7 as long)")
    val stats = Tables.embeddings(spark, dir)
      .groupBy(col("label").cast("bigint").as("label"))
      .agg(count(lit(1)).as("n"), (0 until dim).map(d => sum(xq(d)).as(s"s$d")): _*)
    val nDec = col("n").cast("decimal(38,0)")
    val d2 = (0 until dim).map { d =>
      val diff = (nDec * xq(d).cast("decimal(38,0)") -
        col(s"s$d").cast("decimal(38,0)")).cast("decimal(38,0)")
      (diff * diff).cast("decimal(38,0)")
    }.reduce((a, b) => (a + b).cast("decimal(38,0)"))
    val perVec = Tables.embeddings(spark, dir)
      .withColumn("label", col("label").cast("bigint"))
      .join(broadcast(stats), "label")
      .select(col("label"), col("n"), d2.as("d2"))
    val rollup = perVec.groupBy("label")
      .agg(sum(col("d2")).cast("decimal(38,0)").as("tot"))
    perVec.join(broadcast(rollup), "label")
      .select(col("label"), col("n"),
        (col("n").cast("decimal(38,0)") * col("d2") * 20 >
          col("tot") * 21).cast("long").as("is_out"))
      .groupBy("label", "n")
      .agg(sum(col("is_out")).as("n_outliers"))
      .select(col("label"), col("n"), col("n_outliers"),
        expr("n_outliers * 10000 div n").as("outlier_bp"))
      .orderBy("label")
  }

  /** SPLIT-HALF EMBEDDING DRIFT — the distribution-shift monitor an
   *  embedding pipeline runs between two cohorts (here the deterministic
   *  vec_id-parity halves standing in for old/new snapshots): the 10
   *  dimensions whose cohort means diverge most. The divergence is
   *  ranked by the CROSS-MULTIPLIED quantized sums
   *  (`se·n_odd − so·n_even` on [[dimStats]]'s exact 1e-7 grid), so the
   *  ordering involves no float subtraction of near-equal means — exact
   *  integers end to end, with the human-readable means reconstructed by
   *  one final division per emitted row.
   *
   *  Shape: ONE hash-aggregate pass computing all 128 per-dimension
   *  conditional sums (no posexplode Expand — the [[dimStats]] / Lloyd
   *  discipline), then a 64-row stack, sort and limit on the driver-side
   *  sized result. */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    def q(d: Int) = expr(s"cast(cast(element_at(embedding, ${d + 1}) as double) * 1e7 as long)")
    val aggs = (0 until dim).flatMap(d => Seq(
      sum(when(col("vec_id") % 2 === 0, q(d))).as(s"se$d"),
      sum(when(col("vec_id") % 2 === 1, q(d))).as(s"so$d")))
    val row1 = Tables.embeddings(spark, dir).agg(
      sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_even"),
      (sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_odd") +: aggs): _*)
    val stackArgs = (0 until dim).map(d => s"${d + 1}L, se$d, so$d").mkString(", ")
    row1.selectExpr("n_even", "n_odd", s"stack($dim, $stackArgs) as (dim, se, so)")
      .select(col("dim"),
        expr("cast(se as double) / n_even / 1e7").as("mean_even"),
        expr("cast(so as double) / n_odd / 1e7").as("mean_odd"),
        expr("se * n_odd - so * n_even").as("drift_cross"))
      .orderBy(abs(col("drift_cross")).desc, col("dim"))
      .limit(10)
  }

  /** IVF INDEX-BALANCE report — the index-health metric an ANN deployment
   *  watches: per-cell population and corpus share for the 16-seed
   *  assignment (the same cells [[ivfTopK]] and [[knnGraph]] probe). A
   *  skewed cell histogram means probe cost is dominated by hot cells
   *  and the index needs re-training or cell splitting; the
   *  `over_2x_mean` flag marks exactly those (population·cells > 2·total,
   *  cross-multiplied — no division). One broadcast-argmax pass + one
   *  16-group aggregate. */
  def ivfBalance(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = broadcast(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb")))
    val cells = emb.crossJoin(centroids)
      .select(col("vec_id"), col("centroid_id"),
        dot(col("embedding"), col("c_emb")).as("dot"))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"), struct(col("dot"), (-col("centroid_id")).as("nid"))).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val total = broadcast(cells.agg(sum("n_vecs").as("total"), count(lit(1)).as("n_cells")))
    cells.crossJoin(total)
      .select(col("cell"), col("n_vecs"),
        expr("n_vecs * 10000 div total").as("share_bp"),
        (col("n_vecs") * col("n_cells") > col("total") * 2).cast("bigint").as("over_2x_mean"))
      .orderBy("cell")
  }

  /** ALL-VECTOR kNN GRAPH — every corpus vector gets its top-3 cosine
   *  neighbors, searched WITHIN its IVF cell (the same deterministic
   *  16-seed assignment as [[ivfTopK]]). This is the batch index-build
   *  behind SemDeDup, embedding clustering, and graph-ANN methods: cell
   *  blocking turns the n² all-pairs search into Σ|cell|² in-cell work,
   *  the same partition-then-pair discipline as the dedup module's LSH
   *  buckets. Each edge also carries a MUTUAL flag (1 iff both endpoints
   *  list each other) — mutual-kNN is the standard robust-edge filter
   *  before clustering on the graph.
   *
   *  Scale shape: one broadcast-argmax assignment pass over the corpus,
   *  one equi-join on the cell id (candidate pairs only — never a
   *  cartesian), per-vector top-3 via the bounded [[TopKAgg]] (no
   *  per-query window funnel), and the mutual flag is a self equi-join
   *  of the O(3n) edge list on the reversed pair.
   *
   *  The cell count GROWS WITH THE CORPUS: k = max(16, ⌈√n⌉), the
   *  all-queries analogue of [[sigBits]]'s population rule. A fixed k
   *  is fine when only a few queries probe ([[ivfTopK]]) but fatal
   *  here — with EVERY vector a query the pair join does Σ|cell|² ≈
   *  k·(n/k)² work, unbounded in n at fixed k (measured: the 16-cell
   *  variant did not finish a 200k-vector sf10 spot-run; √n cells make
   *  it n^1.5 total, balanced n^0.5 assignment vs in-cell work). Both
   *  engines derive k from the same ⌈√count⌉ — IEEE sqrt is correctly
   *  rounded, so the ceil agrees.
   *
   *  And the SKEW is bounded too: with untrained seeds one hot cell can
   *  hold ~14× the mean (measured at sf10), contributing ~196 mean-cells'
   *  worth of quadratic pair work on its own. Cells over 2× the mean are
   *  split into ⌈pop·k/n⌉ Voronoi SUB-cells (seeded by their smallest
   *  member vec_ids — deterministic and SQL-reproducible), with the same
   *  12.5% boundary-replication band inside the split, capping expected
   *  per-key population at the corpus mean regardless of seed skew. At
   *  the oracle scales no cell exceeds 1.47× the mean, so the split is a
   *  structural no-op there (hash-identical results) — it engages exactly
   *  where the skew it bounds exists. See [[buildKnnEdges]]. */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    // the O(3n) edge list feeds BOTH sides of the mutual self-join;
    // without the shared snapshot each branch (and the recall entry)
    // would recompute the full Σ|cell|² pair stage
    val knn = knnEdgesSnapshot(spark, dir)
    val rev = knn.select(col("neighbor_id").as("vec_id"), col("vec_id").as("neighbor_id"))
      .withColumn("m", lit(1))
    knn.join(rev, Seq("vec_id", "neighbor_id"), "left")
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        coalesce(col("m"), lit(0)).cast("bigint").as("mutual"))
      .orderBy("vec_id", "rank")
  }

  /** kNN-GRAPH BOUNDARY RECALL — the quality report for [[knnGraph]]'s
   *  cell blocking: a vector's true nearest neighbors can sit just across
   *  a cell boundary, where the in-cell search cannot see them. This
   *  measures exactly that loss: the graph's top-3 edges for the standard
   *  query set (vec_id < 8) joined against the exact brute-force top-3
   *  ground truth, hits per query in integer basis points — the
   *  [[recallReport]] discipline applied to the graph build, so index
   *  rebuilds surface boundary-recall regressions as a first-class,
   *  oracled output. Reads the shared edge snapshot: the marginal cost
   *  over the graph build is one 8-query brute-force scan. */
  def knnGraphRecall(spark: SparkSession, dir: String): DataFrame = {
    val knn = knnEdgesSnapshot(spark, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val bf = bruteForceTopK(spark, dir).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    bf.join(knn, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        expr("n_hit * 10000 div 3").as("recall_bp"))
      .orderBy("query_id")
  }

  /** Per-(application, dir) SNAPSHOT of the kNN edge list
   *  (vec_id, neighbor_id, rank) — the graph-index artifact shared by
   *  [[knnGraph]] and [[knnGraphRecall]] (the [[rangeQuantSnapshot]]
   *  discipline): the Σ|cell|² in-cell pair stage runs once per corpus,
   *  not once per consumer. */
  private val knnEdgeCache =
    graft.CorpusCaches.register(scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private[similarity] def knnEdgesSnapshot(spark: SparkSession, dir: String): DataFrame =
    knnEdgeCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      import org.apache.spark.sql.graft.DatasetBridge
      // The top-3 aggregate over the Σ|cell|² pair stream is a typed
      // (ObjectHashAggregate) aggregate, and Spark's sort-based fallback
      // triggers on DISTINCT-KEY COUNT (default 128) — not on memory
      // pressure. Every pair-join task sees thousands of distinct query
      // vec_ids, so at default settings the partial aggregate abandons its
      // (tiny: #queries-per-task × k entries) hash map and EXTERNALLY SORTS
      // the whole pair stream instead — at sf100 that materialized the
      // ~3e9-row stream as ~47 GB of sort spill and ENOSPC'd a 60 GB
      // volume, for an aggregation whose live state is a few MB. Raise the
      // threshold while THIS plan builds (scoped: set before planning,
      // restored after the eager materialization below, so the 128-key
      // safety net stays in place for aggregates with genuinely large
      // per-key buffers elsewhere in the suite). CONCURRENCY CAVEAT: the
      // conf is session-global for the build window — any query PLANNED
      // concurrently in the same session would silently inherit the 4M-key
      // threshold. The bench/verify harness is strictly sequential, and
      // parallel test suites use their own sessions; do not run concurrent
      // queries on a session while this snapshot builds cold.
      val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, (1 << 22).toString)
      try {
        // truncateLineage: the O(3n) edge list otherwise pins the Σ|cell|²
        // pair-stage shuffles behind it on disk for the memo's lifetime
        // (released only through CorpusCaches.releaseAll, which drops this
        // memo in the same sweep). Also materializes inside the conf
        // scope — the snapshot is lazy, and the fallback decision is made
        // when the pair stage actually runs.
        DatasetBridge.snapshot(buildKnnEdges(spark, dir), truncateLineage = true).df
      } finally {
        prev match { case Some(v) => spark.conf.set(key, v)
                     case None    => spark.conf.unset(key) }
      }
    })

  /** The level-2 split rule, pure and unit-testable: a cell is HOT iff its
   *  population exceeds 2× the mean (pop·k > 2·n, cross-multiplied), and a
   *  hot cell splits into m = ⌈pop·k/n⌉ sub-cells. Hot ⇒ pop·k/n > 2 ⇒
   *  m ≥ 3, so [[graft.functions.SubCellsExpr]]'s second slot always has a
   *  seed to fill. */
  private[similarity] def splitWidths(pops: Iterator[(Int, Long)],
                                      k: Long, n: Long): Map[Int, Int] =
    pops.collect { case (c, p) if p * k > 2 * n =>
      c -> ((p * k + n - 1) / n).toInt
    }.toMap

  /** L2-normalize one seed row, driver-side (left-to-right double Σv²,
   *  one multiply per element). Zero-norm rows pass through unchanged —
   *  a zero seed scores 0.0 against every vector, same as before the
   *  normalization (no corpus ships zero vectors; checked at all oracle
   *  scales — this is belt-and-braces against a NaN matrix). */
  private[similarity] def normalizeRow(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s == 0.0) v
    else { val inv = 1.0 / math.sqrt(s); v.map(_ * inv) }
  }

  private def buildKnnEdges(spark: SparkSession, dir: String): DataFrame = {
    val (salted, candidates) = knnIndexSides(spark, dir)
    val grouped = salted
      .join(candidates, Seq("cell", "sub", "salt"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosine(col("embedding"), col("n_emb")).as("cos"))
      .groupBy("vec_id")
      .agg(topK(3)(col("cos"), col("neighbor_id")).as("top"))
    explodeRanks(grouped, "vec_id", "neighbor_id")
  }

  /** The two sides of the in-(sub)cell pair join, exposed separately so
   *  [[graft.KnnCensus]] can measure the EXACT pair cardinality without
   *  running the join (group each side by the join key and multiply the
   *  per-key counts) — the diagnostic for "where does the build's time
   *  go" at scales the oracle sweep never reaches. */
  private[graft] def knnIndexSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val k = math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)
    // seed matrix: k×dim doubles, a driver-side index artifact (the same
    // collect the Lloyd trainer does); assignment is then one map-side
    // [[graft.functions.NearestCellExpr]] projection — the join form it
    // replaces pushed a k× row expansion through a corpus-wide hash
    // argmax (17 s of the 45 s sf10 total).
    // COSINE assignment: every seed row is L2-NORMALIZED here, once,
    // driver-side — dot(x, ĉ) = ‖x‖·cos θ, and the ‖x‖ factor is constant
    // within one vector's argmax and cancels out of the 8·d2 > 7·d1 band
    // ratio, so the assignment below is purely DIRECTIONAL. The r10
    // census proved the unnormalized argmax is norm-biased at scale: the
    // longest seed is a "norm magnet" that re-absorbs its cell after any
    // population split — 1.23e12 exact pairs at sf100 (434× the balanced
    // n²/k model), one sub-cell holding 1.17M of 2M vectors, a 53-minute
    // CPU-bound build. The DuckDB twin makes the identical move by
    // ranking on list_cosine_similarity (= the same order: it divides the
    // dot by the two constant-per-row norms).
    // Seed choice stays FIRST-k (measured, r11): a stride-sampled level-1
    // seed set was tried and reverted — on id-correlated corpora it does
    // balance level-1 cells, but it collapsed boundary recall at the
    // oracle scales (17/24 ground-truth edges lost at sf0.01: on weakly
    // clustered random vectors an IVF's single-probe queries depend on
    // the query-side geometry the first-k rule gives this suite's pinned
    // query set). Level-1 imbalance on id-correlated corpora is instead
    // the LEVEL-2 split's job, whose stride-sampled sub-seeds (below) cut
    // the sf100 pair census 40× without touching any level-1 boundary.
    val seedMatrix: Array[Array[Double]] = emb.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").collect()
      .map(r => normalizeRow(r.getSeq[Float](0).map(_.toDouble).toArray))
    // TOP-2 soft assignment for the boundary-replication multiprobe: a
    // vector's true nearest neighbor can sit just across the Voronoi
    // boundary where the in-cell search never sees it. Measured at
    // sf0.01/sf0.1: every missed edge was a vector whose SECOND cell was
    // the query's cell at d2/d1 ≈ 0.885–0.92 — so candidates whose
    // runner-up dot is within 12.5% of the winner (8·d2 > 7·d1,
    // integer-×-double, deterministic on both engines) are indexed into
    // BOTH cells. Queries still search ONE cell. The band was widened
    // from 10% after measuring the r9 residual misses (candidate margins
    // 0.8851 at sf0.01, 0.8904 at sf0.1 — just OUTSIDE the 0.9 band;
    // query-side probing could not see either, since the query sat far
    // from its own boundary): at 7/8 recall is 24/24 at both scales and
    // the pair-work census grows only 4.6%/5.6% over the 9/10 rule
    // (15 476 vs 14 789 pairs at sf0.01; 130 417 vs 123 490 at sf0.1) —
    // well inside the 1.2× budget.
    val withT2 = {
      import org.apache.spark.sql.graft.ColumnBridge
      val t2 = ColumnBridge.column(graft.functions.Top2CellsExpr(
        ColumnBridge.expression(col("embedding")), seedMatrix))
      emb.select(col("vec_id"), col("embedding"), t2.as("t2"))
        .select(col("vec_id"), col("embedding"),
          col("t2.cell1").as("cell1"), col("t2.cell2").as("cell2"),
          (col("t2.d2") * 8 > col("t2.d1") * 7).as("band"))
    }.persist(Tuning.persistLevel) // both sides of the in-cell pair join read the assignment
    // SINGLETON-CELL DISSOLUTION: under the directional (cosine) argmax a
    // seed whose direction attracts no second vector leaves its lone
    // member (usually the seed itself, self-cosine 1) alone in the cell —
    // zero candidates, zero edges, and nobody else can find it. Any cell
    // with population 1 is dissolved: its member joins its runner-up cell
    // on BOTH the query and the candidate side (the band replica is
    // suppressed for it — the primary now IS cell2, and a (query,
    // candidate) pair must not repeat). Mean population is n/k = ⌈√n⌉, so
    // at corpus scale singletons are vanishingly rare and this is a
    // small-n completeness guard, not a scale mechanism; pops0 is a
    // bounded ≤ k-row driver artifact the level-2 split collects anyway.
    val pops0 = withT2.groupBy("cell1").agg(count(lit(1)).as("pn")).collect()
    val singles: Set[Int] =
      pops0.iterator.filter(_.getLong(1) == 1L).map(_.getInt(0)).toSet
    def isSingle(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (singles.isEmpty) lit(false) else c.isInCollection(singles)
    val assigned = withT2.select(col("vec_id"), col("embedding"),
      when(isSingle(col("cell1")), col("cell2")).otherwise(col("cell1")).as("cell"),
      when(col("band") && !isSingle(col("cell1")), col("cell2")).as("cell_alt"))
    // LEVEL-2 SPLIT of oversized cells — the bound on Σ|cell|². The seed
    // cells are untrained, so one dense cell can hold ~14× the mean
    // population (measured 6 373 vs 446 at sf10); since in-cell pair work
    // is quadratic, that ONE cell contributes (14·mean)² ≈ 196 mean-cells'
    // worth — roughly half the suite's pair work at sf10 — and the skew is
    // unbounded in n. Any cell whose population exceeds 2× the mean
    // (pop·k > 2·n, cross-multiplied — no division) is split into
    // m = ⌈pop·k/n⌉ Voronoi sub-cells, STRIDE-SAMPLED from the cell's
    // members (deterministic, SQL-reproducible — see the sub-seed block
    // below), capping expected sub-cell population at the corpus mean.
    // Queries search ONE (cell, sub) key;
    // candidates near a sub-boundary replicate into their runner-up
    // sub-cell under the SAME 12.5% band rule as level 1, so the recall
    // mechanism is identical at both levels. Measured at the oracle scales
    // (sf0.001/0.01/0.1): max/mean ≤ 1.47 ⇒ NO hot cells ⇒ the split is a
    // structural no-op there — hash-identical results — and engages only
    // where the skew it bounds actually exists.
    val popRows = assigned.groupBy("cell").agg(count(lit(1)).as("pn")).collect()
    // bounded driver artifact: ≤ k = ⌈√n⌉ rows of (cell, count)
    val hotM: Map[Int, Int] =
      splitWidths(popRows.iterator.map(r => r.getInt(0) -> r.getLong(1)), k, n)
    val subMats: Map[Int, Array[Array[Double]]] =
      if (hotM.isEmpty) Map.empty
      else {
        val hotCells = hotM.keys.toSeq
        val popMap: Map[Int, Long] =
          popRows.iterator.map(r => r.getInt(0) -> r.getLong(1)).toMap
        // STRIDE-SAMPLED sub-seeds (r11): the FIRST member of each of m
        // equal-width rank buckets over the cell's members in vec_id
        // order (rank r selected iff r = 1 or ⌊(r−1)·m/pn⌋ > ⌊(r−2)·m/pn⌋
        // — exactly m rows, pure integer arithmetic, floor-division-safe
        // on both engines since every operand is nonnegative for r ≥ 2).
        // The previous rule — the m SMALLEST member vec_ids — sampled the
        // cell's ids, not its density: on any corpus where vec_id
        // correlates with content (ScaleGen's copies; real corpora with
        // time-ordered ids) all m seeds came from one content region, and
        // the sf100 census showed ONE sub-seed absorbing 865k of a 1M-
        // member cell (1.06e12 pairs, 374× the balanced model) because no
        // seed pointed into the corpus's dense direction cone.
        // Stride-by-rank is a density-proportional sample: a region with
        // x% of the cell's members contributes ~x% of the sub-seeds, so
        // expected sub populations are ~pn/m ≈ the corpus mean. The
        // window sort touches only hot-cell members — exactly the skew
        // mass the split exists to cut, ≪ one corpus shuffle.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cell").orderBy("vec_id")
        val hotMeta = {
          import spark.implicits._
          hotCells.map(c => (c, hotM(c).toLong, popMap(c))).toDF("cell", "m", "pn")
        }
        val selRows = assigned.filter(col("cell").isin(hotCells: _*))
          .select(col("cell"), col("vec_id"), col("embedding"))
          .withColumn("rs", row_number().over(w))
          .join(broadcast(hotMeta), "cell")
          .filter(col("rs") === 1 ||
            expr("((rs - 1) * m) div pn") > expr("((rs - 2) * m) div pn"))
          .select("cell", "vec_id", "embedding").collect()
        // bounded: Σm ≤ 2k rows (every cell hot ⇒ Σ⌈pop·k/n⌉ < k + #cells)
        // rows ordered by ascending member vec_id, MINUS exact-duplicate
        // vectors (raw float equality, first id kept — mirrored in the
        // twin's `PARTITION BY cell, embedding` dedup): the first-max
        // assignment can never pick a later duplicate, and a duplicate
        // would tie d1 = d2 and band-replicate EVERY candidate into a
        // query-less sub-cell. Sub index j is then the SQL `row_number()
        // OVER (PARTITION BY cell ORDER BY vec_id) - 1` over the deduped
        // selection; each row normalized like level 1 (if dedup leaves
        // < 2 seeds the cell's members are near-copies — SubCellsExpr
        // returns null ⇒ the cell stays unsplit, which emits the same
        // pair set the degenerate all-tied split would)
        selRows.iterator
          .map(r => (r.getInt(0), r.getLong(1),
            r.getSeq[Float](2).map(_.toDouble).toArray))
          .toArray.groupBy(_._1)
          .map { case (c, rows) =>
            val ordered = rows.sortBy(_._2).map(_._3)
            val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
            c -> ordered.filter(v => seen.add(v.toSeq)).map(normalizeRow)
          }
      }
    def subCells(cellCol: org.apache.spark.sql.Column,
                 embCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.functions.SubCellsExpr(
        ColumnBridge.expression(cellCol), ColumnBridge.expression(embCol), subMats))
    }
    // SALTED in-(sub)cell pair join: even inside one (cell, sub) key the
    // pair generation for a populous key would land in ONE task — a 13 s
    // straggler in a stage whose other tasks finish in ~2 s. Query side
    // gets salt = vec_id mod S, candidate side is replicated S× (about
    // S·n small rows — pennies), so every key's pair work splits across
    // S tasks while producing the IDENTICAL pair set. The classic
    // skew-salt; deterministic, so the DuckDB twin is unchanged. */
    val S = 8
    // SUB-SINGLETON dissolution — the level-2 mirror of the level-1 rule:
    // a population-1 sub-cell is a sliver whose lone member has zero
    // candidates and is findable by nobody; redirect it to its runner-up
    // sub on BOTH sides (band replica suppressed when redirected — the
    // primary now IS sub2). Query-member pops per (cell, sub1) are a
    // bounded ≤ Σm ≤ 2k-row driver artifact, one cheap aggregate over the
    // cached assignment; at corpus scale sub pops average ~n/k = √n, so
    // like level 1 this is a small-n completeness guard.
    val subSingles: Set[Long] =
      if (subMats.isEmpty) Set.empty
      else assigned
        .select(col("cell"),
          subCells(col("cell"), col("embedding")).getField("sub1").as("sub1"))
        .filter(col("sub1").isNotNull)
        .groupBy("cell", "sub1").agg(count(lit(1)).as("pn")).collect()
        .iterator.filter(_.getLong(2) == 1L)
        .map(r => r.getInt(0).toLong * SubKeyBase + r.getInt(1)).toSet
    def isSubSingle(cellCol: org.apache.spark.sql.Column,
                    subCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (subSingles.isEmpty) lit(false)
      else (cellCol.cast("long") * SubKeyBase + subCol).isInCollection(subSingles)
    // query side: ONE (cell, sub) key per vector; sub = -1 outside hot cells
    val salted = assigned
      .select(col("cell"), col("vec_id"), col("embedding"),
        subCells(col("cell"), col("embedding")).as("s"))
      .select(col("cell"),
        when(col("s").isNull, lit(-1))
          .when(isSubSingle(col("cell"), col("s.sub1")), col("s.sub2"))
          .otherwise(col("s.sub1")).as("sub"),
        pmod(col("vec_id"), lit(S.toLong)).as("salt"),
        col("vec_id"), col("embedding"))
    // candidate side: primary cell always, runner-up cell only for the
    // near-boundary rows (cell_alt non-null) — array+explode emits 1 or 2
    // cell memberships per vector (a (query, candidate) pair can never
    // repeat because cell1 ≠ cell2, and a dissolved row's replica slot is
    // suppressed); each hot-cell membership then fans into 1 or 2
    // sub-cells under the same band rule (≤ 4 memberships total, and
    // exactly 1 for the common far-from-every-boundary row)
    val candidates = assigned.select(
        explode(array_compact(array(col("cell"), col("cell_alt")))).as("cell"),
        col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
      .select(col("cell"), col("neighbor_id"), col("n_emb"),
        subCells(col("cell"), col("n_emb")).as("s"))
      .select(col("cell"), col("neighbor_id"), col("n_emb"),
        explode(when(col("s").isNull, array(lit(-1)))
          .otherwise(array_compact(array(
            when(isSubSingle(col("cell"), col("s.sub1")), col("s.sub2"))
              .otherwise(col("s.sub1")),
            when((col("s.d2") * 8 > col("s.d1") * 7) &&
                 !isSubSingle(col("cell"), col("s.sub1")), col("s.sub2")))))).as("sub"))
      .select(col("cell"), col("sub"),
        explode(array((0 until S).map(s => lit(s.toLong)): _*)).as("salt"),
        col("neighbor_id"), col("n_emb"))
    (salted, candidates)
  }

  /** Pair-encoding base for the (cell, sub) singleton set: sub indices are
   *  bounded by m ≤ k+1 ≪ 1e6, so cell·1e6 + sub is collision-free. */
  private val SubKeyBase = 1000000L

  /** Brute-force radius-search oracle, shared by ann_range_search and
   *  ann_range_ivf (the sound prune changes the plan, never the answer). */
  private val RangeOracle: String = """
      WITH q0 AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(cast(x as double)))) AS s,
               embedding
        FROM embeddings),
      qz AS (
        SELECT vec_id,
               list_transform(range(1, len(embedding) + 1),
                 i -> CASE WHEN s = 0 THEN 0
                      ELSE cast(floor(127.0 * cast(embedding[i] as double) / s + 0.5) as bigint) END) AS q
        FROM q0),
      n AS (
        SELECT vec_id, q,
               cast(list_sum(list_transform(q, x -> x * x)) as bigint) AS n2
        FROM qz),
      p AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               cast(list_sum(list_transform(range(1, len(a.q) + 1),
                 i -> a.q[i] * b.q[i])) as bigint) AS dot,
               a.n2 AS qn2, b.n2 AS n2
        FROM n a JOIN n b ON a.vec_id < 8 AND b.vec_id <> a.vec_id)
      SELECT query_id, neighbor_id,
             cast((2 * dot * dot * 10000 + n2 * qn2) // (2 * n2 * qn2) as bigint) AS cos2_bp
      FROM p
      WHERE dot > 0 AND dot * dot * 10000 >= 900 * n2 * qn2
      ORDER BY query_id, neighbor_id"""

  val defs: Vector[QueryDef] = Vector(
    // exact twin: same 1e-7 trunc grid as embed_dim_stats, the drift
    // ranked on the integer cross product — no near-equal float subtract
    QueryDef("embed_drift", embedDrift, Some("""
      WITH x AS (
        SELECT vec_id % 2 AS half, i AS dim,
               cast(trunc(cast(embedding[i] as double) * 1e7) as bigint) AS q
        FROM embeddings, unnest(range(1, 65)) u(i)),
      s AS (
        SELECT dim,
               sum(CASE WHEN half = 0 THEN q END) AS se,
               sum(CASE WHEN half = 1 THEN q END) AS so,
               sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ne,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS nodd
        FROM x GROUP BY 1)
      SELECT cast(dim as bigint) AS dim,
             cast(se as double) / ne / 1e7 AS mean_even,
             cast(so as double) / nodd / 1e7 AS mean_odd,
             cast(se * nodd - so * ne as bigint) AS drift_cross
      FROM s
      ORDER BY abs(se * nodd - so * ne) DESC, dim LIMIT 10""")),
    // exact twin: the shared 16-seed assignment, integer shares, the 2x
    // flag cross-multiplied
    QueryDef("embed_ivf_balance", ivfBalance, Some("""
      WITH assigned AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.vec_id AS cell,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                            c.vec_id) AS rn
          FROM embeddings e JOIN embeddings c ON c.vec_id < 16) t
        WHERE rn = 1),
      cells AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY 1),
      tot AS (SELECT sum(n_vecs) AS total, count(*) AS n_cells FROM cells)
      SELECT cell, cast(n_vecs as bigint) AS n_vecs,
             cast(n_vecs * 10000 // total as bigint) AS share_bp,
             cast(CASE WHEN n_vecs * n_cells > total * 2 THEN 1 ELSE 0 END as bigint) AS over_2x_mean
      FROM cells, tot ORDER BY cell""")),
    // exact twin: same 16-seed assignment and in-cell ranking as the
    // ann_ivf_topk oracle, run for EVERY vector, mutual via reversed-pair
    // self join
    QueryDef("ann_knn_graph", knnGraph, Some("""
      WITH kk AS (
        SELECT greatest(16, cast(ceil(sqrt(cast(count(*) as double))) as bigint)) AS k,
               count(*) AS n
        FROM embeddings),
      -- COSINE assignment (r11): rank on list_cosine_similarity, the same
      -- directional order as the engine's normalized-seed dot (cosine
      -- divides the dot by the two per-row-constant norms, so the argmax
      -- and the 8*d2 > 7*d1 band ratio are unchanged by either norm)
      scored AS (
        SELECT e.vec_id, e.embedding, c.vec_id AS cell,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS d,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id) AS rn
        FROM embeddings e JOIN embeddings c ON c.vec_id < (SELECT k FROM kk)),
      -- singleton-cell dissolution (r11): a population-1 cell's lone
      -- member joins its runner-up cell on BOTH the query and candidate
      -- side; its band replica is suppressed (the primary now IS cell2)
      pop1 AS (
        SELECT cell FROM scored WHERE rn = 1
        GROUP BY cell HAVING count(*) = 1),
      assigned AS (
        SELECT s1.vec_id, s1.embedding,
               CASE WHEN s1.cell IN (SELECT cell FROM pop1)
                    THEN s2.cell ELSE s1.cell END AS cell
        FROM scored s1 JOIN scored s2
          ON s2.vec_id = s1.vec_id AND s2.rn = 2
        WHERE s1.rn = 1),
      -- boundary-replication multiprobe: candidates whose runner-up cell
      -- scores within 12.5% of the winner are indexed into BOTH cells
      cand1 AS (
        SELECT vec_id, embedding, cell FROM assigned
        UNION ALL
        SELECT s2.vec_id, s2.embedding, s2.cell
        FROM scored s2 JOIN scored s1 ON s1.vec_id = s2.vec_id AND s1.rn = 1
        WHERE s2.rn = 2 AND s2.d * 8 > s1.d * 7
          AND s1.cell NOT IN (SELECT cell FROM pop1)),
      -- level-2 split: any cell over 2x the mean population splits into
      -- m = ceil(pop*k/n) Voronoi sub-cells seeded by its m smallest
      -- member vec_ids; same 12.5% band rule for sub-boundary replication
      hot AS (
        SELECT cell, pn,
               cast(((pn * (SELECT k FROM kk) + (SELECT n FROM kk) - 1)
                 // (SELECT n FROM kk)) as bigint) AS m
        FROM (SELECT cell, count(*) AS pn FROM assigned GROUP BY cell) p
        WHERE pn * (SELECT k FROM kk) > 2 * (SELECT n FROM kk)),
      -- sub-seeds: STRIDE-SAMPLED — the first member of each of m
      -- equal-width rank buckets over the cell's members in vec_id order
      -- (density-proportional; the m-smallest-ids rule sampled one
      -- content region on id-correlated corpora), minus EXACT-duplicate
      -- vectors (raw embedding equality, first id kept) — a duplicate
      -- would tie d1 = d2 and band-replicate every candidate into a
      -- sub-cell no query searches; mirrors the engine's selection
      subseed AS (
        SELECT cell, vec_id, embedding,
               row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS sub
        FROM (
          SELECT cell, vec_id, embedding,
                 row_number() OVER (PARTITION BY cell, embedding ORDER BY vec_id) AS rd
          FROM (
            SELECT a.cell, a.vec_id, a.embedding, h.m, h.pn,
                   row_number() OVER (PARTITION BY a.cell ORDER BY a.vec_id) AS rs
            FROM assigned a JOIN hot h ON h.cell = a.cell) t
          WHERE rs = 1 OR ((rs - 1) * m) // pn > ((rs - 2) * m) // pn) d
        WHERE rd = 1),
      qsub0 AS (
        SELECT vec_id, cell, sub, rn2 FROM (
          SELECT a.vec_id, a.cell, s.sub,
                 row_number() OVER (PARTITION BY a.vec_id, a.cell
                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) DESC,
                            s.sub) AS rn2
          FROM assigned a JOIN subseed s ON s.cell = a.cell) t
        WHERE rn2 <= 2),
      -- sub-singleton dissolution, the level-2 mirror of pop1: a
      -- population-1 sub-cell's lone member joins its runner-up sub
      spop1 AS (
        SELECT cell, sub FROM qsub0 WHERE rn2 = 1
        GROUP BY cell, sub HAVING count(*) = 1),
      qsub AS (
        SELECT q1.vec_id, q1.cell,
               CASE WHEN sp.cell IS NOT NULL AND q2.sub IS NOT NULL
                    THEN q2.sub ELSE q1.sub END AS sub
        FROM qsub0 q1
        LEFT JOIN spop1 sp ON sp.cell = q1.cell AND sp.sub = q1.sub
        LEFT JOIN qsub0 q2 ON q2.vec_id = q1.vec_id AND q2.cell = q1.cell AND q2.rn2 = 2
        WHERE q1.rn2 = 1),
      queries AS (
        SELECT a.vec_id, a.embedding, a.cell, coalesce(q.sub, -1) AS sub
        FROM assigned a LEFT JOIN qsub q ON q.vec_id = a.vec_id AND q.cell = a.cell),
      csub AS (
        SELECT c.vec_id, c.cell, c.embedding, s.sub,
               list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) AS d,
               row_number() OVER (PARTITION BY c.vec_id, c.cell
                 ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) DESC,
                          s.sub) AS rn2
        FROM cand1 c JOIN subseed s ON s.cell = c.cell),
      candidates AS (
        SELECT c.vec_id, c.embedding, c.cell, -1 AS sub
        FROM cand1 c WHERE c.cell NOT IN (SELECT cell FROM hot)
        UNION ALL
        SELECT c1.vec_id, c1.embedding, c1.cell,
               CASE WHEN sp.cell IS NOT NULL AND c2.sub IS NOT NULL
                    THEN c2.sub ELSE c1.sub END AS sub
        FROM csub c1
        LEFT JOIN spop1 sp ON sp.cell = c1.cell AND sp.sub = c1.sub
        LEFT JOIN csub c2 ON c2.vec_id = c1.vec_id AND c2.cell = c1.cell AND c2.rn2 = 2
        WHERE c1.rn2 = 1
        UNION ALL
        SELECT s2.vec_id, s2.embedding, s2.cell, s2.sub
        FROM csub s2
        JOIN csub s1
          ON s1.vec_id = s2.vec_id AND s1.cell = s2.cell AND s1.rn2 = 1
        LEFT JOIN spop1 sp ON sp.cell = s1.cell AND sp.sub = s1.sub
        WHERE s2.rn2 = 2 AND s2.d * 8 > s1.d * 7 AND sp.cell IS NULL),
      knn AS (
        SELECT vec_id, neighbor_id, rank FROM (
          SELECT l.vec_id, r.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY l.vec_id
                   ORDER BY list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) DESC,
                            r.vec_id) AS rank
          FROM queries l JOIN candidates r
            ON l.cell = r.cell AND l.sub = r.sub AND l.vec_id <> r.vec_id) t
        WHERE rank <= 3)
      SELECT k.vec_id, k.neighbor_id, k.rank,
             cast(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END as bigint) AS mutual
      FROM knn k LEFT JOIN knn m
        ON m.vec_id = k.neighbor_id AND m.neighbor_id = k.vec_id
      ORDER BY k.vec_id, k.rank""")),
    QueryDef("ann_knn_graph_recall", knnGraphRecall, Some("""
      WITH kk AS (
        SELECT greatest(16, cast(ceil(sqrt(cast(count(*) as double))) as bigint)) AS k,
               count(*) AS n
        FROM embeddings),
      -- COSINE assignment (r11): rank on list_cosine_similarity, the same
      -- directional order as the engine's normalized-seed dot (cosine
      -- divides the dot by the two per-row-constant norms, so the argmax
      -- and the 8*d2 > 7*d1 band ratio are unchanged by either norm)
      scored AS (
        SELECT e.vec_id, e.embedding, c.vec_id AS cell,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS d,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id) AS rn
        FROM embeddings e JOIN embeddings c ON c.vec_id < (SELECT k FROM kk)),
      -- singleton-cell dissolution (r11): a population-1 cell's lone
      -- member joins its runner-up cell on BOTH the query and candidate
      -- side; its band replica is suppressed (the primary now IS cell2)
      pop1 AS (
        SELECT cell FROM scored WHERE rn = 1
        GROUP BY cell HAVING count(*) = 1),
      assigned AS (
        SELECT s1.vec_id, s1.embedding,
               CASE WHEN s1.cell IN (SELECT cell FROM pop1)
                    THEN s2.cell ELSE s1.cell END AS cell
        FROM scored s1 JOIN scored s2
          ON s2.vec_id = s1.vec_id AND s2.rn = 2
        WHERE s1.rn = 1),
      cand1 AS (
        SELECT vec_id, embedding, cell FROM assigned
        UNION ALL
        SELECT s2.vec_id, s2.embedding, s2.cell
        FROM scored s2 JOIN scored s1 ON s1.vec_id = s2.vec_id AND s1.rn = 1
        WHERE s2.rn = 2 AND s2.d * 8 > s1.d * 7
          AND s1.cell NOT IN (SELECT cell FROM pop1)),
      hot AS (
        SELECT cell, pn,
               cast(((pn * (SELECT k FROM kk) + (SELECT n FROM kk) - 1)
                 // (SELECT n FROM kk)) as bigint) AS m
        FROM (SELECT cell, count(*) AS pn FROM assigned GROUP BY cell) p
        WHERE pn * (SELECT k FROM kk) > 2 * (SELECT n FROM kk)),
      -- sub-seeds: STRIDE-SAMPLED — the first member of each of m
      -- equal-width rank buckets over the cell's members in vec_id order
      -- (density-proportional; the m-smallest-ids rule sampled one
      -- content region on id-correlated corpora), minus EXACT-duplicate
      -- vectors (raw embedding equality, first id kept) — a duplicate
      -- would tie d1 = d2 and band-replicate every candidate into a
      -- sub-cell no query searches; mirrors the engine's selection
      subseed AS (
        SELECT cell, vec_id, embedding,
               row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS sub
        FROM (
          SELECT cell, vec_id, embedding,
                 row_number() OVER (PARTITION BY cell, embedding ORDER BY vec_id) AS rd
          FROM (
            SELECT a.cell, a.vec_id, a.embedding, h.m, h.pn,
                   row_number() OVER (PARTITION BY a.cell ORDER BY a.vec_id) AS rs
            FROM assigned a JOIN hot h ON h.cell = a.cell) t
          WHERE rs = 1 OR ((rs - 1) * m) // pn > ((rs - 2) * m) // pn) d
        WHERE rd = 1),
      qsub0 AS (
        SELECT vec_id, cell, sub, rn2 FROM (
          SELECT a.vec_id, a.cell, s.sub,
                 row_number() OVER (PARTITION BY a.vec_id, a.cell
                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) DESC,
                            s.sub) AS rn2
          FROM assigned a JOIN subseed s ON s.cell = a.cell) t
        WHERE rn2 <= 2),
      -- sub-singleton dissolution, the level-2 mirror of pop1: a
      -- population-1 sub-cell's lone member joins its runner-up sub
      spop1 AS (
        SELECT cell, sub FROM qsub0 WHERE rn2 = 1
        GROUP BY cell, sub HAVING count(*) = 1),
      qsub AS (
        SELECT q1.vec_id, q1.cell,
               CASE WHEN sp.cell IS NOT NULL AND q2.sub IS NOT NULL
                    THEN q2.sub ELSE q1.sub END AS sub
        FROM qsub0 q1
        LEFT JOIN spop1 sp ON sp.cell = q1.cell AND sp.sub = q1.sub
        LEFT JOIN qsub0 q2 ON q2.vec_id = q1.vec_id AND q2.cell = q1.cell AND q2.rn2 = 2
        WHERE q1.rn2 = 1),
      queries AS (
        SELECT a.vec_id, a.embedding, a.cell, coalesce(q.sub, -1) AS sub
        FROM assigned a LEFT JOIN qsub q ON q.vec_id = a.vec_id AND q.cell = a.cell),
      csub AS (
        SELECT c.vec_id, c.cell, c.embedding, s.sub,
               list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) AS d,
               row_number() OVER (PARTITION BY c.vec_id, c.cell
                 ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])) DESC,
                          s.sub) AS rn2
        FROM cand1 c JOIN subseed s ON s.cell = c.cell),
      candidates AS (
        SELECT c.vec_id, c.embedding, c.cell, -1 AS sub
        FROM cand1 c WHERE c.cell NOT IN (SELECT cell FROM hot)
        UNION ALL
        SELECT c1.vec_id, c1.embedding, c1.cell,
               CASE WHEN sp.cell IS NOT NULL AND c2.sub IS NOT NULL
                    THEN c2.sub ELSE c1.sub END AS sub
        FROM csub c1
        LEFT JOIN spop1 sp ON sp.cell = c1.cell AND sp.sub = c1.sub
        LEFT JOIN csub c2 ON c2.vec_id = c1.vec_id AND c2.cell = c1.cell AND c2.rn2 = 2
        WHERE c1.rn2 = 1
        UNION ALL
        SELECT s2.vec_id, s2.embedding, s2.cell, s2.sub
        FROM csub s2
        JOIN csub s1
          ON s1.vec_id = s2.vec_id AND s1.cell = s2.cell AND s1.rn2 = 1
        LEFT JOIN spop1 sp ON sp.cell = s1.cell AND sp.sub = s1.sub
        WHERE s2.rn2 = 2 AND s2.d * 8 > s1.d * 7 AND sp.cell IS NULL),
      knn AS (
        SELECT vec_id, neighbor_id FROM (
          SELECT l.vec_id, r.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY l.vec_id
                   ORDER BY list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) DESC,
                            r.vec_id) AS rank
          FROM queries l JOIN candidates r
            ON l.cell = r.cell AND l.sub = r.sub AND l.vec_id <> r.vec_id
          WHERE l.vec_id < 8) t
        WHERE rank <= 3),
      bf AS (
        SELECT query_id, neighbor_id FROM (
          SELECT qq.vec_id AS query_id, e.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY qq.vec_id
                   ORDER BY list_cosine_similarity(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                            e.vec_id) AS rank
          FROM embeddings qq JOIN embeddings e ON e.vec_id <> qq.vec_id
          WHERE qq.vec_id < 8) t
        WHERE rank <= 3)
      SELECT b.query_id,
             cast(count(k.neighbor_id) as bigint) AS n_hit,
             cast(count(k.neighbor_id) * 10000 // 3 as bigint) AS recall_bp
      FROM bf b LEFT JOIN knn k
        ON k.vec_id = b.query_id AND k.neighbor_id = b.neighbor_id
      GROUP BY b.query_id ORDER BY b.query_id""")),
    QueryDef("embed_outliers", embedOutliers, Some("""
      WITH x AS (
        SELECT vec_id, label, i,
               cast(trunc(cast(embedding[i] as double) * 1e7) as hugeint) AS v
        FROM embeddings, unnest(range(1, 65)) u(i)),
      st AS (SELECT label, i, sum(v) AS s, count(*) AS n FROM x GROUP BY label, i),
      d AS (
        SELECT x.vec_id, x.label,
               sum((st.n * x.v - st.s) * (st.n * x.v - st.s)) AS d2
        FROM x JOIN st ON st.label = x.label AND st.i = x.i
        GROUP BY 1, 2),
      r AS (SELECT label, sum(d2) AS tot, count(*) AS n FROM d GROUP BY label)
      SELECT cast(d.label as bigint) AS label,
             cast(r.n as bigint) AS n,
             cast(sum(CASE WHEN 20 * r.n * d.d2 > 21 * r.tot THEN 1 ELSE 0 END) as bigint)
               AS n_outliers,
             cast(sum(CASE WHEN 20 * r.n * d.d2 > 21 * r.tot THEN 1 ELSE 0 END) * 10000
                  // r.n as bigint) AS outlier_bp
      FROM d JOIN r ON r.label = d.label
      GROUP BY d.label, r.n ORDER BY label""")),
    QueryDef("ann_recall_report", recallReport, Some(KmeansOracle.recallSql)),
    QueryDef("embed_power_iteration", powerIteration, Some("""
      WITH g AS (
        SELECT embedding,
               list_sum(list_transform(embedding,
                 v -> cast(trunc(cast(v as double) * 1e7) as bigint))) AS s
        FROM embeddings),
      n AS (SELECT count(*) AS n FROM g)
      SELECT i AS dim, n.n,
             cast(sum(cast(trunc(cast(embedding[i] as double) * 1e7) as hugeint) * s) as double) AS w
      FROM g, unnest(range(1, 65)) u(i), n
      GROUP BY i, n.n ORDER BY dim""")),
    QueryDef("embed_label_centroids", labelCentroids, Some("""
      SELECT cast(label as bigint) AS label, i AS dim, count(*) AS n,
             cast(sum(cast(trunc(cast(embedding[i] as double) * 1e7) as bigint)) as double)
               / count(*) / 1e7 AS centroid
      FROM embeddings, unnest(range(1, 65)) u(i)
      GROUP BY label, i ORDER BY label, dim""")),
    // trunc (not cast) on the DuckDB side: duckdb's double->bigint cast
    // ROUNDS where spark's truncates
    QueryDef("embed_dim_stats", dimStats, Some("""
      SELECT i AS dim,
             cast(sum(cast(trunc(cast(embedding[i] as double) * 1e7) as bigint)) as double)
               / count(*) / 1e7 AS mean,
             min(cast(embedding[i] as double)) AS vmin,
             max(cast(embedding[i] as double)) AS vmax
      FROM embeddings, unnest(range(1, 65)) u(i)
      GROUP BY i ORDER BY i""")),
    QueryDef("ann_matryoshka", matryoshkaTopK, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 8),
      coarse AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(CAST(q.q_emb[1:16] AS DOUBLE[]),
                                                   CAST(e.embedding[1:16] AS DOUBLE[])) DESC,
                            e.vec_id) AS rn
          FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        WHERE rn <= 10)
      SELECT query_id, neighbor_id, rank FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                                 CAST(e.embedding AS DOUBLE[])) DESC,
                          c.neighbor_id) AS rank
        FROM coarse c
        JOIN q ON q.query_id = c.query_id
        JOIN embeddings e ON e.vec_id = c.neighbor_id) t
      WHERE rank <= 3
      ORDER BY query_id, rank""")),
    // exact twin of the integer PQ pipeline: same global scale, same
    // round-half-up quantization, same packed argmin encoding (min of
    // dist·16+c), same ADC sum — the query-side distance table is just the
    // dists rows of the query vectors, so the join on (s, code) IS the
    // table lookup
    QueryDef("ann_pq", pqTopK, Some("""
      WITH gs AS (SELECT max(abs(cast(x as double))) AS g
                  FROM embeddings, unnest(embedding) u(x)),
      qv AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                 x -> cast(floor(127.0 * cast(x as double) / gs.g + 0.5) as bigint)) AS q
        FROM embeddings, gs),
      cb AS MATERIALIZED (
        SELECT t.s, qv.vec_id AS c, qv.q[t.s*8+1 : t.s*8+8] AS cw
        FROM qv, unnest(range(0, 8)) t(s)
        WHERE qv.vec_id < 16),
      dists AS MATERIALIZED (
        SELECT qv.vec_id, cb.s, cb.c,
               cast(list_sum(list_transform(range(1, 9),
                 i -> (qv.q[cb.s*8+i] - cb.cw[i]) * (qv.q[cb.s*8+i] - cb.cw[i]))) as bigint) AS d
        FROM qv, cb),
      codes AS MATERIALIZED (
        SELECT vec_id, s, cast(min(d * 16 + c) % 16 as bigint) AS code
        FROM dists GROUP BY vec_id, s),
      adc AS (
        SELECT d.vec_id AS query_id, c.vec_id AS neighbor_id,
               cast(sum(d.d) as bigint) AS pq_dist
        FROM codes c
        JOIN dists d ON d.vec_id < 8 AND d.s = c.s AND d.c = c.code
        WHERE c.vec_id <> d.vec_id
        GROUP BY 1, 2)
      SELECT query_id, neighbor_id, rank, pq_dist FROM (
        SELECT query_id, neighbor_id, pq_dist,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY pq_dist, neighbor_id) AS rank
        FROM adc) t
      WHERE rank <= 3 ORDER BY query_id, rank""")),
    // exact twin: the ann_ivf_topk assignment CTE (same argmax tiebreak),
    // the same packed-argmax majority election and half-up purity
    QueryDef("embed_cell_purity", cellPurity, Some("""
      WITH a AS (
        SELECT vec_id, label, cell FROM (
          SELECT e.vec_id, e.label, c.vec_id AS cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])) DESC,
                            c.vec_id) AS rn
          FROM embeddings e JOIN embeddings c ON c.vec_id < 16) t
        WHERE rn = 1),
      g AS (SELECT cell, label, cast(count(*) as bigint) AS c FROM a GROUP BY 1, 2),
      p AS (SELECT cell, sum(c) AS n_vectors,
                   max(c * 4294967296 + (4294967295 - label)) AS sc
            FROM g GROUP BY 1)
      SELECT cell, cast(n_vectors as bigint) AS n_vectors,
             cast(4294967295 - (sc % 4294967296) as bigint) AS majority_label,
             cast(sc // 4294967296 as bigint) AS n_majority,
             cast((2 * (sc // 4294967296) * 10000 + n_vectors)
                    // (2 * n_vectors) as bigint) AS purity_bp
      FROM p ORDER BY cell""")),
    // exact twin: same 20-deep shortlists (cosine rank ties by id, the
    // TopKAgg order), same floor-division RRF arithmetic
    QueryDef("ann_hybrid_rrf", hybridRrf, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 8),
      cosr AS (
        SELECT query_id, neighbor_id, rank AS cr FROM (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])) DESC,
                            e.vec_id) AS rank
          FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        WHERE rank <= 20),
      rec AS (
        SELECT vec_id AS neighbor_id,
               row_number() OVER (ORDER BY vec_id DESC) AS rr
        FROM embeddings ORDER BY vec_id DESC LIMIT 20),
      recq AS (SELECT q.query_id, rec.neighbor_id, rec.rr
               FROM q, rec WHERE rec.neighbor_id <> q.query_id),
      fused AS (
        SELECT coalesce(c.query_id, r.query_id) AS query_id,
               coalesce(c.neighbor_id, r.neighbor_id) AS neighbor_id,
               coalesce(1000000 // (60 + c.cr), 0)
                 + coalesce(1000000 // (60 + r.rr), 0) AS rrf_e6
        FROM cosr c FULL OUTER JOIN recq r
          ON c.query_id = r.query_id AND c.neighbor_id = r.neighbor_id),
      top AS (
        SELECT query_id, neighbor_id, rrf_e6,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_e6 DESC, neighbor_id) AS rank
        FROM fused)
      SELECT query_id, neighbor_id, cast(rrf_e6 as bigint) AS rrf_e6, rank
      FROM top WHERE rank <= 5
      ORDER BY query_id, rank""")),
    // exact twin: same int8 quantization CTE as embed_quantize, same
    // cross-multiplied integer threshold — membership cannot float-flip
    QueryDef("ann_range_search", rangeSearch, Some(RangeOracle)),
    // SAME oracle on purpose: the IVF prune is provably sound (see
    // [[rangeSearchIvfOn]]), so the pruned path must reproduce the
    // brute-force answer bit-for-bit — the strongest check an
    // approximate-index serving path can carry
    QueryDef("ann_range_ivf", rangeSearchIvf, Some(RangeOracle)),
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
    QueryDef("ann_ivf_topk", ivfTopK, Some("""
      WITH assigned AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, c.vec_id AS cell,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                            c.vec_id) AS rn
          FROM embeddings e JOIN embeddings c ON c.vec_id < 16) t
        WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, embedding AS q_emb, cell
            FROM assigned WHERE vec_id < 8)
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) DESC,
                          a.vec_id) AS rank
        FROM assigned a JOIN q ON a.cell = q.cell
        WHERE a.vec_id <> q.query_id) t
      WHERE rank <= 3
      ORDER BY query_id, rank""")),
    // GENERATED oracle: the signature CTEs reproduce HyperplaneSigExpr
    // bit-for-bit (graft.functions.HyperplaneOracle); the radius-4
    // multi-probe set is equivalently `bit_count(xor(sig_q, sig_c)) <= 4`
    // (probing cell = q_sig XOR m over all popcount<=4 masks m reaches
    // exactly the signatures within Hamming distance 4). Rank-only output,
    // so list_cosine_similarity ordering suffices (as in ann_bruteforce).
    QueryDef("ann_lsh_topk", lshTopK, Some(s"""
      WITH ${graft.functions.HyperplaneOracle.sigCtes},
      q AS (SELECT vec_id AS query_id, embedding AS q_emb, sig AS q_sig
            FROM s WHERE vec_id < 8)
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                                 CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id) AS rank
        FROM q JOIN s c
          ON bit_count(xor(q.q_sig, c.sig)) <= 4 AND c.vec_id <> q.query_id) t
      WHERE rank <= 3
      ORDER BY query_id, rank""")),
    QueryDef("ann_kmeans_ivf", kmeansIvfTopK, Some(KmeansOracle.sql)),
    QueryDef("embed_quantize", quantize, Some("""
      WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(cast(x as double)))) AS s,
               embedding
        FROM embeddings),
      e AS (
        SELECT vec_id, s, i,
               CASE WHEN s = 0 THEN 0
                    ELSE cast(floor(127.0 * cast(embedding[i] as double) / s + 0.5) as bigint) END AS qv
        FROM q, unnest(range(1, len(embedding) + 1)) u(i))
      SELECT vec_id,
             cast(count(*) as bigint) AS n_dims,
             cast(sum(qv * i) as bigint) AS q_checksum,
             cast(sum(abs(qv)) as bigint) AS q_l1,
             max(s) AS scale
      FROM e GROUP BY vec_id ORDER BY vec_id""")),
    QueryDef("ann_filtered_topk", filteredTopK, Some("""
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                          e.vec_id) AS rank
        FROM embeddings q
        JOIN embeddings e ON e.label = q.label AND e.vec_id <> q.vec_id
        WHERE q.vec_id < 8) t
      WHERE rank <= 3
      ORDER BY query_id, rank"""))
  )
}
