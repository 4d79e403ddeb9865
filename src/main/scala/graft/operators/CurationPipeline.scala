package graft.operators

import graft.Tables
import graft.Tables.QueryDef
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The end-to-end corpus-curation chain a training-data run actually
 * executes, composed from the engine's own operators: language ID →
 * quality gate → exact dedup → retention stats.
 *
 * Scale shape: language/quality are map-side native expressions over the
 * scan (no shuffle); the dedup is ONE hash shuffle on the content hash
 * with `min_by` carrying the kept doc's attributes (no self-join, no
 * window); the final per-source rollup is a partial-aggregated groupBy on
 * a low-cardinality key. Two shuffles total for the whole pipeline,
 * regardless of corpus size.
 */
object CurationPipeline {

  /** Keep English docs with quality ≥ 0.5, drop exact duplicates (lowest
   *  doc_id wins), report per-source retention. */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("source"), col("text"),
        tokenCount(col("text")).cast("long").as("ntok"),
        langId(col("text")).as("pred_lang"),
        qualityBp(col("text")).as("qbp"))
    val kept = scored.filter(col("pred_lang") === "en" && col("qbp") >= 5000L)
    val deduped = kept
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min_by(struct(col("source"), col("qbp"), col("ntok")), col("doc_id")).as("doc"))
      .select(col("doc.source").as("source"), col("doc.qbp").as("qbp"), col("doc.ntok").as("ntok"))
    deduped
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        round(sum(col("qbp")).cast("double") / (count(lit(1)) * lit(10000.0d)), 3).as("avg_quality"),
        sum(col("ntok")).as("kept_tokens"))
      .orderBy("source")
  }

  /** Benchmark decontamination — the OTHER overlap problem dedup doesn't
   *  cover: training docs that leak evaluation content must be dropped
   *  even when they aren't duplicates of each other. Docs whose id ≡ 0
   *  (mod 97) stand in for the held-out benchmark; any other doc sharing
   *  ≥ 5 distinct word-3-grams with ANY benchmark doc is flagged.
   *
   *  Scale shape: shingles key on their 64-bit hash; the benchmark
   *  shingle set is reached by an inverted-index equi-join (it is O(eval
   *  corpus) — too big to broadcast at 100 TB), and the flag is one
   *  groupBy per contaminated doc. No cross join, no per-doc set
   *  materialization. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // shared corpus-level shingle snapshot — feeds the benchmark index
    // and the probe side here, and every other 3-gram consumer
    val docShingles = graft.dedup.Dedup.shingleIndex(spark, dir)
    val isBench = col("doc_id") % 97 === 0
    val benchShingles = docShingles.filter(isBench).select("sh").distinct()
    val flagged = docShingles.filter(!isBench)
      .join(benchShingles, "sh")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
    flagged.groupBy("source")
      .agg(count(lit(1)).as("n_flagged"), sum("n_shared").as("total_shared"))
      .orderBy("source")
  }

  /** Bloom-prefiltered decontamination — the runtime-filter variant of
   *  [[decontaminate]]. A Bloom filter of the benchmark shingle set (docs
   *  with id ≡ 0 mod 89 here) is built with Spark's native
   *  `BloomFilterAggregate`, collected (it is O(bits) — ~1 MB at 3% FP for
   *  a million-shingle eval set, broadcastable at any corpus size, unlike
   *  the exact shingle set), and applied map-side with `might_contain`
   *  BEFORE the shuffle: ~97% of non-matching corpus shingles never leave
   *  their scan task. The exact equi-join then runs on the surviving sliver
   *  only, so Bloom false positives cannot reach the output — the result
   *  is bit-identical to the no-bloom plan and the oracle is plain SQL. */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    val docShingles = graft.dedup.Dedup.shingleIndex(spark, dir)
    val isBench = col("doc_id") % 89 === 0
    val benchShingles = docShingles.filter(isBench).select("sh").distinct()
    val bloomBin = benchShingles
      .select(ColumnBridge.column(
        new BloomFilterAggregate(ColumnBridge.expression(col("sh")), 1L << 20)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBin, BinaryType), ColumnBridge.expression(col("sh"))))
    val flagged = docShingles.filter(!isBench)
      .filter(mightContain) // map-side prefilter, no shuffle yet
      .join(benchShingles, "sh") // exact confirm on the sliver
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
    flagged.groupBy("source")
      .agg(count(lit(1)).as("n_flagged"), sum("n_shared").as("total_shared"))
      .orderBy("source")
  }

  /** Deterministic STRATIFIED sampling: exactly 20 docs per source, chosen
   *  by smallest md5(text) (a content-keyed pseudo-random order both
   *  engines can reproduce), ties to the lowest doc_id — the "same sample
   *  on every run/cluster" property a curation pipeline needs for
   *  ablations.
   *
   *  Scale shape: per-stratum bottom-k via the bounded
   *  [[graft.similarity.TopKMinStrAgg]] aggregate — each map task keeps an
   *  O(k) buffer per stratum and only buffers shuffle. A
   *  `row_number() OVER (PARTITION BY source)` would funnel the whole
   *  corpus into #sources reducer tasks; this never does. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.similarity.TopK._
    val grouped = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), md5(col("text")).as("h"))
      .groupBy("source")
      .agg(topKMinStr(20)(col("h"), col("doc_id")).as("top"))
    explodeRanks(grouped, "source", "doc_id")
      .orderBy("source", "rank")
  }

  /** Exact integer CASE ladder for the power-of-2 length bucket — shared
   *  verbatim by the Spark expression and the DuckDB oracle so neither
   *  engine touches floating log2 at integer boundaries. */
  private val bucketLadder: String = {
    val cases = (20 to 0 by -1).map(k => s"WHEN ntok >= ${1L << k} THEN ${1L << k}").mkString(" ")
    s"CASE $cases ELSE 0 END"
  }

  /** Sequence-length bucketing — the batch-shaping pass before training:
   *  docs grouped into power-of-2 token-count buckets, with the packed
   *  2048-token sequence estimate per bucket (`ceil(Σtok / 2048)` in exact
   *  integer arithmetic). Map-side arithmetic + one ~21-row aggregate. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(tokenCount(col("text")).cast("long").as("ntok"))
      .withColumn("bucket_lo", expr(bucketLadder).cast("long"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("sum_tokens"))
      .withColumn("packed_seqs", expr("(sum_tokens + 2047) div 2048"))
      .orderBy("bucket_lo")

  /** Chunk geometry: window of 32 tokens, stride 24 (8-token overlap). */
  private val ChunkW = 32
  private val ChunkStride = 24

  /** Document CHUNKING — the sequence-shaping pass that turns documents
   *  into overlapping fixed-width token windows for training/embedding.
   *  Each doc expands to `1 + ceil(max(0, ntok − W) / stride)` chunks; the
   *  final chunk may be short (never re-padded here). Output carries the
   *  md5 of every chunk's text, so the oracle verifies the chunk BYTES,
   *  not just the geometry.
   *
   *  Scale shape: tokenize → per-row `sequence()` explode → map-side
   *  `slice`/`concat_ws`/`md5` — pure narrow operations over the scan, no
   *  shuffle at all until whatever consumes the chunks. The expansion
   *  factor is bounded by W/stride (≈1.33 here), so output size stays
   *  O(corpus). */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("ntok", size(col("toks")))
      .filter(col("ntok") > 0)
      .withColumn("nchunks",
        expr(s"cast(1 + (greatest(0, ntok - $ChunkW) + ${ChunkStride - 1}) div $ChunkStride as int)"))
      .select(col("doc_id"), col("toks"), col("ntok"),
        explode(sequence(lit(0), col("nchunks") - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(ChunkW), col("ntok") - col("chunk_idx") * ChunkStride).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("chunk_idx") * ChunkStride + 1, lit(ChunkW)))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  // oracle: the same chain in DuckDB — tokenization, marker argmax with
  // first-max tiebreak, integer quality arithmetic, md5 dedup keeping the
  // lowest doc_id (arg-min via row_number, fine at oracle scale)
  /** SEQUENCE PACKING — the batch-construction step before pretraining:
   *  assign documents to fixed-token-budget packs by cumulative offset
   *  (doc d goes to pack ⌊prefix_tokens(d)/budget⌋), emitting per-pack
   *  occupancy. Deterministic and ORDER-DEFINED (by doc_id within
   *  source), unlike greedy first-fit whose output depends on scan order —
   *  determinism is what makes a 100 TB packing run reproducible and
   *  resumable. The prefix sum is [[ScalableRank.withGroupedPrefixSum]]:
   *  range-partition by (source, doc_id), window-sum locally per slice,
   *  broadcast boundary carry-ins — `source` is low-cardinality, so a
   *  window partitioned by it alone would funnel each source's whole
   *  corpus through ONE task at scale. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 512L
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokenCount(col("text")).cast("long").as("ntok"))
      // pre-rank persist: map-only token scoring would otherwise run
      // twice (range sampler + shuffle write) over the full text corpus
      .persist(graft.Tuning.persistLevel)
    ScalableRank.withGroupedPrefixSum(base, Seq("source"), Seq("doc_id"), "ntok", "off")
      .groupBy(col("source"), floor(col("off") / lit(budget)).as("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("source", "pack_id")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   *  Language Models via Importance Resampling"): score documents by how
   *  target-like their hashed n-gram feature counts are. Features are
   *  unigram token XXH64 hashes folded into 64 buckets (`pmod` of the
   *  signed hash = unsigned low bits, so the DuckDB twin agrees); the
   *  per-bucket likelihood ratio is the +1-smoothed target/raw count
   *  ratio in integer BASIS POINTS — `(t_b+1)*10000 div (r_b+1)`. The
   *  global T/R normalizer is a constant factor that cannot change the
   *  ranking, and dropping it keeps every intermediate inside BIGINT even
   *  at 100 TB (t_b*10^4 < 2^63 up to ~10^14 target tokens; the paper's
   *  log-ratio form is a monotone variant of the same per-bucket table).
   *  A document's weight is the count-weighted sum of its buckets'
   *  ratios, rolled up per source.
   *
   *  Scale shape: one explode over the native token-hash expression into
   *  a per-(doc, bucket) partial-aggregated count; the 64-row ratio table
   *  derives from THAT (no second corpus pass) and broadcasts back; the
   *  final rollups key on doc then source. No self-join, no window.
   *  Target distribution here: the curated fifth of the corpus
   *  (src0..src3); everything else is the raw pool being scored. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val target = Seq("src0", "src1", "src2", "src3")
    val docBucket = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(wordShingleHashes(col("text"), 1)).as("h"))
      .groupBy(col("doc_id"), col("source"), pmod(col("h"), lit(64)).as("b"))
      .agg(count(lit(1)).as("c"))
    val lr = broadcast(
      docBucket.groupBy("b").agg(
          sum(when(col("source").isin(target: _*), col("c")).otherwise(0L)).as("t_b"),
          sum(when(col("source").isin(target: _*), 0L).otherwise(col("c"))).as("r_b"))
        .select(col("b"), expr("(t_b + 1) * 10000 div (r_b + 1)").as("lr_bp")))
    docBucket.join(lr, "b")
      .groupBy("doc_id", "source").agg(sum(col("c") * col("lr_bp")).as("w"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"), sum("w").as("sum_w"))
      .orderBy("source")
  }

  /** Per-source SURVIVAL FUNNEL through the corpus-hygiene tiers — the
   *  report a curation run publishes: of each source's documents, how many
   *  survive exact dedup (min doc_id per content hash), then near-dup
   *  clustering (non-minimal members of an n-gram-Jaccard component drop),
   *  then benchmark decontamination (≥5 shared 3-grams with the held-out
   *  decile), and how many tokens remain.
   *
   *  Composition, not recomputation: tier 2 reads the SHARED cluster-label
   *  snapshot ([[graft.dedup.Dedup.ngramClusterLabels]]) and tier 3 the
   *  shared shingle index — the same artifacts their standalone queries
   *  consume. The funnel itself is three id-only drop/keep sets joined
   *  back to the corpus and ONE aggregate pass: flag columns, no
   *  per-tier rescans of the text. */
  def survivalFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(col("text")).as("h"), tokenCount(col("text")).cast("long").as("ntok"))
    val k1 = docs.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("s1"))
    val drop2 = graft.dedup.Dedup.ngramClusterLabels(spark, dir)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"), lit(1L).as("d2"))
    val docShingles = graft.dedup.Dedup.shingleIndex(spark, dir)
    // the mod-89 / >=3 parameters of [[bloomDecontaminate]] — the pair
    // that actually flags overlap on this corpus
    val isBench = col("doc_id") % 89 === 0
    val benchShingles = docShingles.filter(isBench).select("sh").distinct()
    val drop3 = docShingles.filter(!isBench)
      .join(benchShingles, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .select(col("doc_id"), lit(1L).as("d3"))
    docs
      .join(k1, Seq("doc_id"), "left")
      .join(drop2, Seq("doc_id"), "left")
      .join(drop3, Seq("doc_id"), "left")
      .withColumn("s1", coalesce(col("s1"), lit(0L)))
      .withColumn("s2", col("s1") * (lit(1L) - coalesce(col("d2"), lit(0L))))
      .withColumn("s3", col("s2") * (lit(1L) - coalesce(col("d3"), lit(0L))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum("s1").as("n_after_exact"),
        sum("s2").as("n_after_neardup"),
        sum("s3").as("n_clean"),
        sum(col("s3") * col("ntok")).as("tokens_clean"))
      .orderBy("source")
  }

  /** Deterministic epoch shuffle + shard assignment — the step between a
   *  curated corpus and a training run: every document gets a global
   *  position under a keyed pseudo-random permutation (`md5("shuf:" ∥
   *  doc_id)` as sort key — change the salt, get the next epoch's order)
   *  and a shard `(pos − 1) mod 8`. A seeded permutation beats
   *  `rand()`-ordering because it is REPRODUCIBLE: re-running the job —
   *  or re-materializing one lost shard — yields byte-identical output.
   *
   *  Scale shape: the global position is [[ScalableRank.withGlobalRowNumber]]
   *  (range-partition by the hash key, rank locally, broadcast offsets) —
   *  never a single-task global window; the md5 key is computed map-side.
   *  The hash key also IS the range-partitioner key, so shard files come
   *  out hash-ordered — exactly what a streaming data loader wants. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("k"))
    val (ranked, _) = ScalableRank.withGlobalRowNumber(keyed, Seq(col("k"), col("doc_id")), "pos")
    ranked.select(col("doc_id"), col("pos"),
        expr("(pos - 1) % 8").as("shard_id"))
      .orderBy("pos")
  }

  /** Domain-mix planning — the sampling-rate table a data-mixing run
   *  derives before drawing a training set: given per-source token counts
   *  and an equal-share target, the acceptance rate that downsamples every
   *  source to the smallest one's token mass. All rates are exact integer
   *  basis points (half-up `(2·minT·10⁴ + T) div 2T`), so the plan is
   *  reproducible and auditable — the actual draw is then
   *  [[stratifiedSample]]'s hash-mod discipline with these rates.
   *  One aggregate over the corpus + one broadcast scalar; no shuffle
   *  beyond the per-source groupBy. */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), tokenCount(col("text")).cast("long").as("ntok"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
    val totals = perSource.agg(min(col("tokens")).as("min_t"), sum(col("tokens")).as("tot_t"))
    perSource.crossJoin(broadcast(totals)) // 1-row broadcast: no real cross
      .select(col("source"), col("n_docs"), col("tokens"),
        expr("(2 * tokens * 10000 + tot_t) div (2 * tot_t)").as("share_bp"),
        expr("(2 * min_t * 10000 + tokens) div (2 * tokens)").as("accept_bp"))
      .withColumn("tokens_after", expr("tokens * accept_bp div 10000"))
      .orderBy("source")
  }

  /** Token-budget selection — the capped form of quality filtering: each
   *  source contributes its best documents (quality desc, doc_id
   *  tiebreak) until a fixed per-source token budget is exhausted; the
   *  first document that crosses the line is cut. This is how a mixture
   *  spec ("at most B tokens from domain X") is actually materialized.
   *
   *  Scale shape: quality and token counts are map-side expressions; the
   *  only shuffle is the per-source window (sources are the natural
   *  parallel unit — thousands of domains at 100 TB, each sorted
   *  independently; no global sort). Output is one row per source. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 600L
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("ntok"),
        qualityBp(col("text")).as("qbp"))
    val w = Window.partitionBy("source")
      .orderBy(col("qbp").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("cum_tok", sum(col("ntok")).over(w))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("cum_tok") <= budget, 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("cum_tok") <= budget, col("ntok")).otherwise(0L)).as("tokens_selected"),
        min(when(col("cum_tok") <= budget, col("qbp"))).as("cutoff_qbp"))
      .orderBy("source")
  }

  /** Repetition-aware upsampling plan — the other half of domain mixing:
   *  small domains are repeated (bounded at 4 epochs, the standard
   *  "don't repeat data past ~4 passes" rule) toward a target of 2× the
   *  largest domain's tokens. Emits one row per (source, epoch) so the
   *  plan IS the training-order manifest.
   *
   *  Scale shape: one partial-aggregated rollup to per-source totals, a
   *  1-row broadcast of the global max, and a sequence-explode bounded at
   *  4 rows per source — no data-plane rows are duplicated here; the
   *  epoch manifest is what a downstream reader fans out from. */
  def upsamplePlan(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast("long")).as("tok"))
    val target = perSource.agg(max(col("tok")).as("max_t"))
    perSource.crossJoin(broadcast(target)) // 1-row broadcast: no real cross
      .select(col("source"), col("n_docs"), col("tok"),
        least(lit(4L), expr("(2 * max_t + tok - 1) div tok")).as("repeat_n"))
      .select(col("source"), col("n_docs"), col("tok"), col("repeat_n"),
        explode(sequence(lit(1L), col("repeat_n"))).as("epoch"))
      .withColumn("cum_tokens", col("tok") * col("epoch"))
      .orderBy("source", "epoch")
  }

  /** Deterministic TRAIN/VAL/TEST split — assignment by content hash
   *  (md5 of the doc id, two hex chars = 256 buckets: <0xcc train ~80%,
   *  <0xe6 val ~10%, rest test), the reproducible form of dataset
   *  splitting: no RNG state, no seed drift, stable under any
   *  partitioning, re-running on a grown corpus never reassigns an
   *  existing document. Reports the per-(source, split) document and
   *  token counts a mixture spec is validated against.
   *
   *  Scale shape: the split is a map-side expression over the scan; the
   *  only shuffle is the final small rollup. */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        tokenCount(col("text")).cast("long").as("ntok"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("h"))
      .withColumn("split",
        when(col("h") < "cc", "train").when(col("h") < "e6", "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
      .orderBy("source", "split")

  /** QUALITY × DUPLICATION calibration — the cross-signal report that
   *  decides whether the quality score can substitute for (or must
   *  compose with) dedup: per 1000-bp quality band, what fraction of
   *  documents are exact duplicates. One content-hash aggregate feeds a
   *  copies-count join back onto the scored docs; the rollup key is the
   *  bounded band, so output is ≤ 10 rows at any corpus size. */
  def qualityVsDup(spark: SparkSession, dir: String): DataFrame =
    // exact duplicates share the text, hence the score, hence the band —
    // so no join back onto the docs is needed: one shuffle on the content
    // hash (quality riding along via min, identical within the group),
    // then the bounded band rollup. Single corpus scan.
    Tables.documents(spark, dir)
      .select(md5(col("text")).as("h"), qualityBp(col("text")).as("qbp"))
      .groupBy("h")
      .agg(count(lit(1)).as("copies"), min(col("qbp")).as("qbp"))
      .select(least(lit(9L), expr("qbp div 1000")).as("qband"), col("copies"))
      .groupBy("qband")
      .agg(sum(col("copies")).as("n_docs"),
        sum(when(col("copies") > 1, col("copies")).otherwise(0L)).as("n_dups"))
      .withColumn("dup_bp", expr("n_dups * 10000 div n_docs"))
      .orderBy("qband")

  /** CURRICULUM STAGING — split the corpus into 4 equal-population stages
   *  by quality (stage 1 = best quarter), the ordering curriculum
   *  learning consumes (clean data first, tail later) and the mixture
   *  planner's per-stage token ledger. The global quality ranking runs
   *  through [[ScalableRank.withNtile]] (range-partitioned rank + tiny
   *  offset table), because `ntile() OVER (ORDER BY …)` — a
   *  no-partition window — would pull the whole corpus through ONE task;
   *  the SQL-standard remainder distribution matches the oracle's ntile
   *  exactly. Per-stage ledger: docs, tokens, quality span. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        qualityBp(col("text")).as("qbp"),
        tokenCount(col("text")).cast("long").as("ntok"))
      // pre-rank persist (the q74/q89 lesson): the rank's range SAMPLER
      // replays its input subplan as a separate job, and this input is
      // map-only — no exchange to reuse — so without the barrier the
      // quality+token scoring runs over the full text corpus TWICE
      // (sf100: 162 s steady for a 3-column 5M-row frame)
      .persist(graft.Tuning.persistLevel)
    ScalableRank.withNtile(docs, Seq(col("qbp").desc, col("doc_id")), 4, "stage")
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
        min("qbp").as("min_qbp"), max("qbp").as("max_qbp"))
      .orderBy("stage")
  }

  /** DATASET CARD — the one-row release summary every training-data drop
   *  publishes: corpus size, token count, language/source breadth, the
   *  near-dup exposure (share of docs sitting in some near-dup cluster)
   *  and mean quality — composed entirely from artifacts the engine
   *  already maintains (the shared cluster-label snapshot; map-side
   *  token/quality expressions). One corpus scan + one O(cluster-nodes)
   *  count; every figure integer-exact. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(qualityBp(col("text"))).as("sq"))
    val clustered = graft.dedup.Dedup.ngramClusterLabels(spark, dir)
      .agg(count(lit(1)).as("n_in_clusters"))
    base.crossJoin(clustered)
      .select(col("n_docs"), col("n_tokens"), col("n_langs"), col("n_sources"),
        expr("n_in_clusters * 10000 div n_docs").as("dup_doc_bp"),
        expr("sq div n_docs").as("mean_quality_bp"))
  }

  /** K-ANONYMITY AUDIT — the privacy gate a dataset release runs before
   *  shipping: group the corpus by its quasi-identifier tuple (language,
   *  source, length decile bucket) and report the release's k-anonymity
   *  (the SMALLEST group size — any group below k=5 makes its members
   *  re-identifiable), plus how many groups and rows sit below the bar.
   *  One groupBy on the QI tuple + one summary aggregate; the QI space
   *  is bounded (langs × sources × 10), so the second aggregate is
   *  driver-trivial at any corpus size. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        expr("least(9, n_chars div 60)").cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("sz"))
      .agg(
        min("sz").as("k_anonymity"),
        count(lit(1)).as("n_groups"),
        sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("rows_at_risk"),
        expr("sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 10000 div sum(sz)").as("at_risk_bp"))

  /** L-DIVERSITY AUDIT — [[kAnonymity]]'s sibling: k-anonymity alone
   *  still leaks when a small group is homogeneous in the SENSITIVE
   *  attribute (everyone in the group shares it, so membership reveals
   *  it). Here language is the sensitive attribute and (source, length
   *  bucket) the quasi-identifiers: report the release's l-diversity
   *  (minimum distinct sensitive values per group) and the exposure
   *  below l=3. Same bounded-QI shape as the k-audit. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"), expr("least(9, n_chars div 60)").cast("long").as("len_bucket"))
      .agg(countDistinct(col("lang")).as("l"), count(lit(1)).as("sz"))
      .agg(
        min("l").as("l_diversity"),
        count(lit(1)).as("n_groups"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_low_groups"),
        sum(when(col("l") < 3, col("sz")).otherwise(0L)).as("rows_at_risk"))

  /** EFFECTIVE TOKENS after exact dedup — the budget number a training
   *  plan actually gets per source: raw doc/token counts vs what
   *  survives md5-exact dedup with global first-owner keeps (a duplicate
   *  whose keeper lives in ANOTHER source counts for the keeper — the
   *  cross-source attribution that per-source distinct counts get
   *  wrong), plus the savings in half-up bp. One shuffle on the text
   *  hash to elect keepers, one co-partitioned self-join back, one
   *  per-source rollup; token counts are the oracle-exact length
   *  arithmetic, never a tokenizer pass. */
  def effectiveTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("ntok"),
        md5(col("text")).as("h"))
    val keepers = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    docs.join(keepers, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("raw_docs"), sum("ntok").as("raw_tokens"),
        sum(when(col("doc_id") === col("keep_id"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("doc_id") === col("keep_id"), col("ntok")).otherwise(0L)).as("kept_tokens"))
      .withColumn("savings_bp",
        expr("(2 * (raw_tokens - kept_tokens) * 10000 + raw_tokens) div (2 * raw_tokens)"))
      .orderBy("source")
  }

  /** CURATION WATERFALL — the attrition report every pipeline review
   *  starts from: how many docs enter and survive each stage
   *  (language-ID → quality ≥ 0.5 → exact dedup), with half-up keep
   *  rates. Stages COMPOSE: each stage's population is the previous
   *  stage's survivors, and the dedup keeper is elected among stage-2
   *  SURVIVORS (min doc_id), not the raw corpus — the number a real
   *  pipeline ships. One flag pass + one keeper groupBy; the 3-row
   *  waterfall pivots out of a single aggregate via `stack`. */
  def waterfall(spark: SparkSession, dir: String): DataFrame = {
    // Two deliberate text scans, NOT a persisted single pass: the keeper
    // election only needs md5 over SURVIVING docs, so fusing the hash into
    // a persisted all-docs frame was measured SLOWER (sf10 6.6 → 9.0 s,
    // sf100 unchanged) — hashing every doc costs more than re-running the
    // filter flags on the second scan. The expressions are native
    // single-pass already; the remaining cost is inherent text CPU.
    val flagged = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        (langId(col("text")) === col("lang")).as("lang_ok"),
        (qualityBp(col("text")) >= 5000L).as("q_ok"))
    val survivors2 = flagged.filter(col("lang_ok") && col("q_ok"))
    val keepers = survivors2
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keep_id"))
    val counts = flagged.agg(
        count(lit(1)).as("n0"),
        sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("lang_ok") && col("q_ok"), 1L).otherwise(0L)).as("n2"))
      .crossJoin(broadcast(keepers.agg(count(lit(1)).as("n3"))))
    counts.selectExpr(
        """stack(3,
           1L, 'lang_id', n0, n1,
           2L, 'quality', n1, n2,
           3L, 'exact_dedup', n2, n3) as (stage, stage_name, n_in, n_kept)""")
      // n_in = 0 (a stage that filtered everything, or an empty corpus)
      // guards to NULL: Spark's div would yield NULL silently but DuckDB's
      // // raises, so the guard keeps the two engines in agreement.
      .withColumn("kept_bp", expr(
        "CASE WHEN n_in = 0 THEN NULL ELSE (2 * n_kept * 10000 + n_in) div (2 * n_in) END"))
      .orderBy("stage")
  }

  val defs: Vector[QueryDef] = Vector(
    // exact twin: same composed stage populations (keeper elected among
    // stage-2 survivors), same half-up keep rates
    QueryDef("pipeline_waterfall", waterfall, Some(s"""
      WITH d AS (
        SELECT doc_id, text, lang,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
               ${Tables.QbpParts.replace("ntok", "(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END)")}
        FROM documents),
      c AS (
        SELECT doc_id, text, lang,
          len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','for'], x))) AS c_en,
          len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','los','por'], x))) AS c_es,
          len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS c_de,
          len(list_filter(toks, x -> list_contains(['le','la','les','des','est','dans','pour','une'], x))) AS c_fr,
          len(list_filter(toks, x -> list_contains(['il','di','che','la','per','con','del','una'], x))) AS c_it,
          (CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END) AS ntok,
          len1, m, punct, alpha
        FROM d),
      f AS (
        SELECT doc_id, text,
          (CASE WHEN greatest(c_en,c_es,c_de,c_fr,c_it) = 0 THEN 'und'
                WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_it THEN 'en'
                WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_it THEN 'es'
                WHEN c_de >= c_fr AND c_de >= c_it THEN 'de'
                WHEN c_fr >= c_it THEN 'fr'
                ELSE 'it' END = lang) AS lang_ok,
          (${Tables.QbpExpr} >= 5000) AS q_ok
        FROM c),
      s2 AS (SELECT doc_id, text FROM f WHERE lang_ok AND q_ok),
      k AS (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM s2 GROUP BY 1),
      m AS (
        SELECT (SELECT count(*) FROM f) AS n0,
               (SELECT count(*) FROM f WHERE lang_ok) AS n1,
               (SELECT count(*) FROM s2) AS n2,
               (SELECT count(*) FROM k) AS n3)
      SELECT stage, stage_name, n_in, n_kept,
             CASE WHEN n_in = 0 THEN NULL
                  ELSE (2 * n_kept * 10000 + n_in) // (2 * n_in) END AS kept_bp
      FROM (
        SELECT 1::BIGINT AS stage, 'lang_id' AS stage_name, n0 AS n_in, n1 AS n_kept FROM m
        UNION ALL SELECT 2, 'quality', n1, n2 FROM m
        UNION ALL SELECT 3, 'exact_dedup', n2, n3 FROM m)
      ORDER BY stage""")),
    // exact twin: same md5 keeper election, same global-first-owner
    // attribution and half-up savings
    QueryDef("pipeline_effective_tokens", effectiveTokens, Some("""
      WITH d AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
               END AS ntok,
               md5(text) AS h
        FROM documents),
      k AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY 1)
      SELECT source,
             count(*) AS raw_docs, cast(sum(ntok) as bigint) AS raw_tokens,
             cast(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) as bigint) AS kept_docs,
             cast(sum(CASE WHEN doc_id = keep_id THEN ntok ELSE 0 END) as bigint) AS kept_tokens,
             cast((2 * (sum(ntok) - sum(CASE WHEN doc_id = keep_id THEN ntok ELSE 0 END)) * 10000
                    + sum(ntok)) // (2 * sum(ntok)) as bigint) AS savings_bp
      FROM d JOIN k USING (h)
      GROUP BY source ORDER BY source""")),
    // exact twin: same QI bucketing, same l=3 bar
    QueryDef("pipeline_l_diversity", lDiversity, Some("""
      WITH g AS (
        SELECT source, least(9, n_chars // 60) AS len_bucket,
               count(DISTINCT lang) AS l, count(*) AS sz
        FROM documents GROUP BY 1, 2)
      SELECT cast(min(l) as bigint) AS l_diversity,
             count(*) AS n_groups,
             cast(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) as bigint) AS n_low_groups,
             cast(sum(CASE WHEN l < 3 THEN sz ELSE 0 END) as bigint) AS rows_at_risk
      FROM g""")),
    // exact twin: same QI bucketing (integer division), same k=5 bar
    QueryDef("pipeline_k_anonymity", kAnonymity, Some("""
      WITH g AS (
        SELECT lang, source, least(9, n_chars // 60) AS len_bucket,
               count(*) AS sz
        FROM documents GROUP BY 1, 2, 3)
      SELECT cast(min(sz) as bigint) AS k_anonymity,
             count(*) AS n_groups,
             cast(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) as bigint) AS n_small_groups,
             cast(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) as bigint) AS rows_at_risk,
             cast(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 10000 // sum(sz) as bigint) AS at_risk_bp
      FROM g""")),
    // exact twin: the shared cluster closure for the dup share, the
    // quality chain for the mean — all-floor integer arithmetic
    QueryDef("pipeline_dataset_card", datasetCard, Some(s"""
      WITH RECURSIVE ${graft.dedup.Dedup.ClusterCtes},
      t AS (
        SELECT doc_id, lang, source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents),
      f AS (
        SELECT doc_id, lang, source, ntok,
               ${graft.Tables.QbpParts}
        FROM t),
      s AS (
        SELECT doc_id, lang, source, ntok, ${graft.Tables.QbpExpr} AS qbp
        FROM f),
      b AS (
        SELECT count(*) AS n_docs, sum(ntok) AS n_tokens,
               count(DISTINCT lang) AS n_langs, count(DISTINCT source) AS n_sources,
               sum(qbp) AS sq
        FROM s),
      c AS (SELECT count(*) AS n_in FROM labels)
      SELECT cast(n_docs as bigint) AS n_docs, cast(n_tokens as bigint) AS n_tokens,
             cast(n_langs as bigint) AS n_langs, cast(n_sources as bigint) AS n_sources,
             cast(n_in * 10000 // n_docs as bigint) AS dup_doc_bp,
             cast(sq // n_docs as bigint) AS mean_quality_bp
      FROM b, c""")),
    QueryDef("pipeline_curriculum", curriculum, Some(s"""
      WITH t AS (
        SELECT doc_id, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents),
      f AS (
        SELECT doc_id, ntok,
               ${graft.Tables.QbpParts}
        FROM t),
      s AS (
        SELECT doc_id, ntok, ${graft.Tables.QbpExpr} AS qbp
        FROM f),
      st AS (
        SELECT ntok, qbp,
               ntile(4) OVER (ORDER BY qbp DESC, doc_id) AS stage
        FROM s)
      SELECT cast(stage as bigint) AS stage, count(*) AS n_docs,
             cast(sum(ntok) as bigint) AS n_tokens,
             cast(min(qbp) as bigint) AS min_qbp,
             cast(max(qbp) as bigint) AS max_qbp
      FROM st GROUP BY 1 ORDER BY 1""")),
    QueryDef("pipeline_quality_vs_dup", qualityVsDup, Some(s"""
      WITH t AS (
        SELECT doc_id, text, md5(text) AS h,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents),
      f AS (
        SELECT doc_id, h, ntok,
               ${graft.Tables.QbpParts}
        FROM t),
      s AS (SELECT doc_id, h, ${graft.Tables.QbpExpr} AS qbp FROM f),
      c AS (SELECT h, count(*) AS copies FROM s GROUP BY h),
      j AS (
        SELECT least(9, s.qbp // 1000) AS qband, c.copies > 1 AS is_dup
        FROM s JOIN c ON s.h = c.h)
      SELECT cast(qband as bigint) AS qband,
             count(*) AS n_docs,
             cast(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) as bigint) AS n_dups,
             cast(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 10000 // count(*) as bigint) AS dup_bp
      FROM j GROUP BY qband ORDER BY qband""")),
    QueryDef("pipeline_split", trainValTestSplit, Some("""
      WITH t AS (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok,
               substr(md5(cast(doc_id as varchar)), 1, 2) AS h
        FROM documents)
      SELECT source,
             CASE WHEN h < 'cc' THEN 'train' WHEN h < 'e6' THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs,
             cast(sum(ntok) as bigint) AS tokens
      FROM t GROUP BY 1, 2 ORDER BY source, split""")),
    QueryDef("pipeline_token_budget", tokenBudget, Some(s"""
      WITH t AS (
        SELECT doc_id, source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents),
      f AS (
        SELECT doc_id, source, ntok,
               ${graft.Tables.QbpParts}
        FROM t),
      s AS (
        SELECT doc_id, source, ntok, ${graft.Tables.QbpExpr} AS qbp
        FROM f),
      c AS (
        SELECT source, ntok, qbp,
               sum(ntok) OVER (PARTITION BY source ORDER BY qbp DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM s)
      SELECT source,
             count(*) AS n_total,
             cast(sum(CASE WHEN cum_tok <= 600 THEN 1 ELSE 0 END) as bigint) AS n_selected,
             cast(sum(CASE WHEN cum_tok <= 600 THEN ntok ELSE 0 END) as bigint) AS tokens_selected,
             cast(min(CASE WHEN cum_tok <= 600 THEN qbp END) as bigint) AS cutoff_qbp
      FROM c GROUP BY source ORDER BY source""")),
    QueryDef("pipeline_upsample", upsamplePlan, Some("""
      WITH p AS (
        SELECT source, count(*) AS n_docs,
               sum(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END)
                 AS tok
        FROM documents GROUP BY source),
      m AS (SELECT max(tok) AS max_t FROM p),
      r AS (
        SELECT source, n_docs, tok,
               cast(least(4, (2 * max_t + tok - 1) // tok) as bigint) AS repeat_n
        FROM p, m),
      e AS (
        SELECT source, n_docs, tok, repeat_n,
               unnest(generate_series(1, repeat_n)) AS epoch
        FROM r)
      SELECT source, n_docs, cast(tok as bigint) AS tok,
             cast(repeat_n as bigint) AS repeat_n,
             cast(epoch as bigint) AS epoch,
             cast(tok * epoch as bigint) AS cum_tokens
      FROM e ORDER BY source, epoch""")),
    // the funnel oracle composes the dedup_clusters CC chain (hot-capped
    // shingles for the pair graph), the UNcapped shingle set for the
    // contamination tier, and the md5 exact tier — same formulas, one WITH
    QueryDef("pipeline_survival", survivalFunnel, Some("""
      WITH RECURSIVE toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      hot AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 100),
      cold AS (SELECT doc_id, sh FROM sh ANTI JOIN hot USING (sh)),
      pc AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
        FROM cold x JOIN cold y USING (sh)
        WHERE x.doc_id < y.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM pc
        JOIN counts a ON a.doc_id = id_a
        JOIN counts b ON b.doc_id = id_b
        WHERE cast(inter as double) / cast(a.n_sh + b.n_sh - inter as double) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a, b FROM (SELECT a, b FROM und UNION SELECT a, a FROM und)
        UNION
        SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
      labels AS (SELECT a AS node, min(b) AS label FROM reach GROUP BY a),
      k1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      drop2 AS (SELECT node AS doc_id FROM labels WHERE node <> label),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 89 = 0),
      drop3 AS (
        SELECT doc_id FROM sh JOIN bench USING (sh)
        WHERE doc_id % 89 <> 0
        GROUP BY doc_id HAVING count(*) >= 3),
      t AS (
        SELECT d.source,
               CASE WHEN length(trim(d.text)) = 0 THEN 0
                    ELSE length(trim(d.text)) - length(replace(trim(d.text), ' ', '')) + 1
                    END AS ntok,
               CASE WHEN k1.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s1,
               CASE WHEN k1.doc_id IS NOT NULL AND d2.doc_id IS NULL THEN 1 ELSE 0 END AS s2,
               CASE WHEN k1.doc_id IS NOT NULL AND d2.doc_id IS NULL
                         AND d3.doc_id IS NULL THEN 1 ELSE 0 END AS s3
        FROM documents d
        LEFT JOIN k1 ON k1.doc_id = d.doc_id
        LEFT JOIN drop2 d2 ON d2.doc_id = d.doc_id
        LEFT JOIN drop3 d3 ON d3.doc_id = d.doc_id)
      SELECT source, count(*) AS n_raw,
             cast(sum(s1) as bigint) AS n_after_exact,
             cast(sum(s2) as bigint) AS n_after_neardup,
             cast(sum(s3) as bigint) AS n_clean,
             cast(sum(s3 * ntok) as bigint) AS tokens_clean
      FROM t GROUP BY source ORDER BY source""")),
    QueryDef("pipeline_shuffle", epochShuffle, Some("""
      SELECT doc_id,
             row_number() OVER (ORDER BY md5('shuf:' || cast(doc_id as varchar)), doc_id) AS pos,
             (row_number() OVER (ORDER BY md5('shuf:' || cast(doc_id as varchar)), doc_id) - 1) % 8
               AS shard_id
      FROM documents ORDER BY pos""")),
    QueryDef("pipeline_domain_mix", domainMix, Some("""
      WITH t AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents),
      s AS (SELECT source, count(*) AS n_docs, cast(sum(ntok) as bigint) AS tokens
            FROM t GROUP BY 1),
      g AS (SELECT min(tokens) AS min_t, cast(sum(tokens) as bigint) AS tot_t FROM s)
      SELECT source, n_docs, tokens,
             (2 * tokens * 10000 + tot_t) // (2 * tot_t) AS share_bp,
             (2 * min_t * 10000 + tokens) // (2 * tokens) AS accept_bp,
             tokens * ((2 * min_t * 10000 + tokens) // (2 * tokens)) // 10000 AS tokens_after
      FROM s CROSS JOIN g ORDER BY source""")),
    QueryDef("pipeline_dsir_weights", dsirWeights,
      Some(graft.dedup.XxhashOracle.dsirSql)),
    QueryDef("pipeline_pack", packSequences, Some("""
      WITH t AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents),
      p AS (
        SELECT doc_id, source, ntok,
               sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS off
        FROM t)
      SELECT source, cast(floor(off / 512.0) as bigint) AS pack_id,
             count(*) AS n_docs, cast(sum(ntok) as bigint) AS total_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM p GROUP BY 1, 2 ORDER BY source, pack_id""")),
    QueryDef("pipeline_chunks", chunkDocs, Some(s"""
      WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents),
      g AS (
        SELECT doc_id, toks, len(toks) AS ntok,
               1 + (greatest(0, len(toks) - $ChunkW) + ${ChunkStride - 1}) // $ChunkStride AS nchunks
        FROM t WHERE len(toks) > 0),
      c AS (
        SELECT doc_id, toks, ntok, unnest(generate_series(0, nchunks - 1)) AS chunk_idx
        FROM g)
      SELECT doc_id,
             cast(chunk_idx as bigint) AS chunk_idx,
             cast(least($ChunkW, ntok - chunk_idx * $ChunkStride) as bigint) AS n_tokens,
             md5(array_to_string(toks[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkW], ' ')) AS chunk_md5
      FROM c
      ORDER BY doc_id, chunk_idx""")),
    QueryDef("pipeline_clean_corpus", cleanCorpus, Some(s"""
      WITH t AS (
        SELECT doc_id, source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents),
      f AS (
        SELECT doc_id, source, text, ntok, toks,
               ${graft.Tables.QbpParts}
        FROM t),
      s AS (
        SELECT doc_id, source, text, ntok,
          ${graft.Tables.QbpExpr} AS qbp,
          len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','for'], x))) AS c_en,
          len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','los','por'], x))) AS c_es,
          len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS c_de,
          len(list_filter(toks, x -> list_contains(['le','la','les','des','est','dans','pour','une'], x))) AS c_fr,
          len(list_filter(toks, x -> list_contains(['il','di','che','la','per','con','del','una'], x))) AS c_it
        FROM f),
      kept AS (
        SELECT doc_id, source, text, ntok, qbp FROM s
        WHERE qbp >= 5000
          AND greatest(c_en, c_es, c_de, c_fr, c_it) > 0
          AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_it),
      deduped AS (
        SELECT source, qbp, ntok FROM (
          SELECT source, qbp, ntok,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM kept) WHERE rn = 1)
      SELECT source, count(*) AS n_kept,
             round(cast(sum(qbp) as double) / (count(*) * 10000.0), 3) AS avg_quality,
             cast(sum(ntok) as bigint) AS kept_tokens
      FROM deduped GROUP BY source ORDER BY source""")),
    QueryDef("pipeline_decontaminate", decontaminate, Some("""
      WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      flagged AS (
        SELECT doc_id, source, count(*) AS n_shared
        FROM sh JOIN bench USING (sh)
        WHERE doc_id % 97 <> 0
        GROUP BY doc_id, source
        HAVING count(*) >= 5)
      SELECT source, count(*) AS n_flagged, cast(sum(n_shared) as bigint) AS total_shared
      FROM flagged GROUP BY source ORDER BY source""")),
    QueryDef("pipeline_length_buckets", lengthBuckets, Some(s"""
      WITH t AS (
        SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok
        FROM documents)
      SELECT bucket_lo, count(*) AS n_docs,
             cast(sum(ntok) as bigint) AS sum_tokens,
             (cast(sum(ntok) as bigint) + 2047) // 2048 AS packed_seqs
      FROM (SELECT ntok, cast($bucketLadder as bigint) AS bucket_lo FROM t) b
      GROUP BY bucket_lo ORDER BY bucket_lo""")),
    QueryDef("pipeline_bloom_decontaminate", bloomDecontaminate, Some("""
      WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 89 = 0),
      flagged AS (
        SELECT doc_id, source, count(*) AS n_shared
        FROM sh JOIN bench USING (sh)
        WHERE doc_id % 89 <> 0
        GROUP BY doc_id, source
        HAVING count(*) >= 3)
      SELECT source, count(*) AS n_flagged, cast(sum(n_shared) as bigint) AS total_shared
      FROM flagged GROUP BY source ORDER BY source""")),
    // md5 hex ordering is plain ASCII-lexicographic in both engines
    QueryDef("pipeline_stratified_sample", stratifiedSample, Some("""
      SELECT source, doc_id, rank FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rank
        FROM documents) t
      WHERE rank <= 20
      ORDER BY source, rank"""))
  )
}
