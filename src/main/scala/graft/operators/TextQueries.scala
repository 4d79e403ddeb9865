package graft.operators

import graft.Tuning
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

  /** Heuristic quality score + language ID per doc, aggregated per source.
   *  The mean is computed from an EXACT integer sum (per-doc score in
   *  basis points, summed as long, divided once) rather than avg(double) —
   *  a float avg's partial sums are partitioning-order-dependent, which
   *  would make the result non-reproducible and un-oracle-able. */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        qualityBp(col("text")).as("qbp"),
        langId(col("text")).as("pred_lang"))
      .groupBy("source")
      .agg(
        round(sum(col("qbp")).cast("double") / (count(lit(1)) * lit(10000.0d)), 3).as("avg_quality"),
        count(when(col("pred_lang") === "en", 1)).as("n_pred_en"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Language-ID confusion: predicted vs labeled language counts. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  /** COHEN'S KAPPA between the declared language label and the n-gram
   *  language-ID — chance-corrected agreement, the eval statistic behind
   *  "is this classifier better than the label marginals": κ = (N·D −
   *  Σᵢrᵢcᵢ)/(N² − Σᵢrᵢcᵢ) with D the diagonal and rᵢ/cᵢ the confusion
   *  marginals. Every moment is an exact integer from bounded (|labels|²)
   *  aggregates over one corpus scan; the coefficient itself is ONE
   *  float division at the output boundary (κ may be negative, and
   *  Spark's `div` truncates where DuckDB's `//` floors — so a bp
   *  integerization of a signed ratio would diverge; the double is the
   *  engine-safe form). */
  def langKappa(spark: SparkSession, dir: String): DataFrame = {
    val conf = Tables.documents(spark, dir)
      .groupBy(col("lang"), langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = conf.agg(sum("n").as("nn"),
      coalesce(sum(when(col("lang") === col("pred_lang"), col("n"))), lit(0L)).as("diag"))
    val pe = conf.groupBy("lang").agg(sum("n").as("rn"))
      .join(conf.groupBy(col("pred_lang").as("lang")).agg(sum("n").as("cn")), "lang")
      .agg(coalesce(sum(col("rn") * col("cn")), lit(0L)).as("src"))
    tot.crossJoin(broadcast(pe))
      .select(col("nn").as("n_docs"), col("diag").as("n_agree"),
        expr("(2 * diag * 10000 + nn) div (2 * nn)").as("po_bp"),
        expr("cast(nn * diag - src as double) / cast(nn * nn - src as double)").as("kappa"))
  }

  /** Intra-document repetition — the quality signal that catches boilerplate
   *  and spam the inter-document dedups can't see: repeated tokens and
   *  repeated word-2-grams WITHIN one doc. Ratios are exact integer
   *  basis points (no float drift), aggregated per source with integer
   *  sums so the result is partitioning-independent and oracle-able. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val n1 = size(toks)
    val d1 = size(array_distinct(toks))
    val g2 = shingles(col("text"), 2)
    val n2 = size(g2)
    val d2 = size(array_distinct(g2))
    // Column./ on longs is TRUE division (doubles); basis points must be
    // the integer quotient to match the oracle's `//`
    val dupTokBp = when(n1 > 0,
      floor((n1 - d1).cast("long") * 10000L / n1.cast("long")).cast("long")).otherwise(0L)
    val dup2Bp = when(n2 > 0,
      floor((n2 - d2).cast("long") * 10000L / n2.cast("long")).cast("long")).otherwise(0L)
    Tables.documents(spark, dir)
      .select(col("source"), dupTokBp.as("dup_tok_bp"), dup2Bp.as("dup_2gram_bp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("dup_tok_bp").as("sum_dup_tok_bp"),
        sum("dup_2gram_bp").as("sum_dup_2gram_bp"),
        count(when(col("dup_tok_bp") >= 5000L, 1)).as("n_heavy_repeat"))
      .orderBy("source")
  }

  /** CROSS-document boilerplate: the fraction of each doc's distinct
   *  word-3-grams that are corpus-common (shared by > 100 docs) — headers,
   *  footers, license blurbs. Complements [[repetitionStats]] (intra-doc)
   *  and the pair dedups (whole-doc): boilerplate-heavy docs aren't
   *  duplicates of anything in particular, they're stitched from common
   *  fragments.
   *
   *  Scale shape: the shingle index keys on 64-bit hashes
   *  (map-side native expression), one groupBy finds the common set —
   *  which is SMALL by construction (shingles in >100 docs) so the
   *  per-doc membership probe is a broadcast semi-join, not a shuffle of
   *  the corpus. Ratios are exact integer basis points over integer sums,
   *  so the per-source rollup is partitioning-independent and oracled. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    // the corpus-level shingle index snapshot (same (doc_id, source, sh)
    // frame this query previously rebuilt and persisted privately) —
    // shared with every other 3-gram consumer, tokenized once per corpus
    val docSh = graft.dedup.Dedup.shingleIndex(spark, dir)
    val common = docSh.groupBy("sh").count().filter(col("count") > 100).select("sh")
    val hotPerDoc = docSh.join(broadcast(common), Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    val perDoc = docSh.groupBy("doc_id", "source").agg(count(lit(1)).as("n_sh"))
    perDoc.join(hotPerDoc, Seq("doc_id"), "left")
      .select(col("source"), col("n_sh"), coalesce(col("n_hot"), lit(0L)).as("n_hot"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs_with_shingles"),
        sum("n_hot").as("sum_hot"),
        sum("n_sh").as("sum_sh"))
      // `div` = exact long integer division, matching the oracle's `//` at
      // any scale — floor(a/b) on longs goes through double and can land
      // on the wrong side of an integer boundary once sums exceed ~2^52
      .withColumn("boilerplate_bp", expr("sum_hot * 10000 div sum_sh"))
      .orderBy("source")
  }

  /** Document fingerprints for the lowest doc_ids — the per-doc form of
   *  dedup_fingerprint, now via the TRUE Karp-Rabin rolling hash
   *  ([[graft.functions.TextFunctions.rollingFingerprint]]): order-
   *  sensitive, whitespace-insensitive, and bit-reproducible cross-engine,
   *  so the query carries a full DuckDB oracle. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), rollingFingerprint(col("text")).as("fp"),
        subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id")

  /** FUZZY canonical match — edit distance to a per-group representative:
   *  every part name scored by levenshtein against its type's
   *  lexicographically-first name. The fuzzy-dedup shape for short
   *  strings (exact-threshold variant of what MinHash does for
   *  documents): one small groupBy for the representatives (one row per
   *  type), broadcast back, distance computed map-side over the scan,
   *  one final rollup — never an all-pairs product. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
    val reps = broadcast(
      parts.groupBy(col("p_type").as("t")).agg(min("p_name").as("rep_name")))
    parts.join(reps, col("p_type") === col("t"))
      .select(col("p_type"),
        levenshtein(col("p_name"), col("rep_name")).cast("long").as("d"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n"),
        sum("d").as("sum_dist"),
        max("d").as("max_dist"),
        count(when(col("d") <= 3 && col("d") > 0, 1)).as("n_near"))
      .orderBy("p_type")
  }

  /** Q-GRAM-BLOCKED FUZZY JOIN — ALL name pairs within edit distance 2,
   *  as a real join (not the per-group representative shape of
   *  [[fuzzyMatch]]). The scale design, layer by layer:
   *   1. DEDUPE BEFORE JOINING: the join runs on the distinct-name
   *      vocabulary with multiplicities (64 names here; |vocab| ≪ |rows|
   *      for any real catalog), never on the row table;
   *   2. LOSSLESS BLOCKING: names are padded (`##name$$`) and exploded to
   *      positional 3-grams; an edit touches ≤ 3 padded grams, so any
   *      pair with ed ≤ 2 and length ≥ 5 shares ≥ len_max−4 ≥ 1 grams —
   *      the gram equi-join provably generates every qualifying pair
   *      (same candidate-generation shape as [[graft.dedup.Dedup]]'s
   *      shingle index; a web-scale vocabulary would add the >1% stop-gram
   *      cap before the self-join). The bound needs max(len) ≥ 5, so
   *      pairs where BOTH names are shorter than 5 get an exhaustive
   *      union pass — that set is alphabet-bounded (≪ any real
   *      vocabulary), broadcast, never a cartesian over the corpus;
   *   3. VERIFY: exact `levenshtein` only on blocked candidates, a
   *      vanishing fraction of the |vocab|² product.
   *  Output carries `n_part_pairs` = the row-level pair multiplicity, so
   *  the vocabulary-level result still answers the row-level question. */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy("p_name").agg(count(lit(1)).as("n_parts"))
    val padded = concat(lit("##"), col("p_name"), lit("$$"))
    val grams = names.select(col("p_name"), col("n_parts"),
      explode(array_distinct(transform(sequence(lit(1), length(padded) - 2),
        i => padded.substr(i, lit(3))))).as("g"))
    val a = grams.select(col("g"), col("p_name").as("name_a"), col("n_parts").as("na"))
    val b = grams.select(col("g"), col("p_name").as("name_b"), col("n_parts").as("nb"))
    // two edits can wipe every shared padded gram of a name shorter than
    // 5 chars, so both-short pairs bypass the blocking exhaustively
    val short = names.filter(length(col("p_name")) < 5)
    val shortPairs = short.select(col("p_name").as("name_a"), col("n_parts").as("na"))
      .join(broadcast(short.select(col("p_name").as("name_b"), col("n_parts").as("nb"))),
        col("name_a") < col("name_b"))
    a.join(b, "g")
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      .select("name_a", "name_b", "na", "nb")
      .unionByName(shortPairs.select("name_a", "name_b", "na", "nb"))
      .distinct()
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("edit_dist"),
        (col("na") * col("nb")).as("n_part_pairs"))
      .filter(col("edit_dist") <= 2)
      .orderBy("name_a", "name_b")
  }

  /** Higher-order-function suite — the array-lambda surface exercised as
   *  one oracled query: per source, token arrays pushed through
   *  `filter` (long tokens), `transform`+`aggregate` (character mass),
   *  `zip_with` (adjacent-pair equality = immediate repetitions) and
   *  `exists`. Every lambda is a codegen'd column expression evaluated
   *  map-side over the scan — the declarative alternative to a UDF, and
   *  the reason none of this leaves whole-stage codegen. */
  def hofSuite(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("source"),
        size(filter(toks, t => length(t) > 4)).cast("long").as("n_long"),
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x).as("char_mass"),
        aggregate(
          zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
            (a, b) => when(a === b, 1L).otherwise(0L)),
          lit(0L), (a, x) => a + x).as("n_immediate_reps"),
        exists(toks, t => t === "spark").cast("int").as("has_spark"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_long").as("sum_long_tokens"),
        sum("char_mass").as("sum_char_mass"),
        sum("n_immediate_reps").as("sum_reps"),
        sum("has_spark").cast("bigint").as("n_with_spark"))
      .orderBy("source")
  }

  /** MEAN-TOKEN-RANK fluency score — the integer-exact stand-in for the
   *  LM-perplexity quality filter of CCNet (Wenzek et al. 2020): rank the
   *  curated-source vocabulary by frequency (rank 1 = most frequent), score
   *  each document as the mean rank of its tokens (out-of-vocabulary →
   *  V+1), roll up per source. A document of common, target-like tokens
   *  scores low; OOV-heavy or junk-token text scores high — the same
   *  ordering a unigram-LM cross-entropy produces (rank is a monotone
   *  transform of frequency), with no float log in sight. Distinct from
   *  [[CurationPipeline.dsirWeights]] (hashed-BUCKET target/raw ratios —
   *  domain match) and text_oov_rate (binary top-100 membership): this is
   *  a per-document fluency ordering over the FULL vocabulary.
   *
   *  Scale shape: the vocabulary rank is [[ScalableRank.withGlobalRowNumber]]
   *  (range-partition by (count desc, token), rank locally, broadcast
   *  offsets) — never a global one-task window; the token→rank lookup is a
   *  plain shuffle equi-join on the token (at 100 TB the vocab outgrows a
   *  broadcast; hot-token skew is AQE skew-split territory, asserted
   *  engaged elsewhere); per-doc then per-source rollups are ordinary
   *  partial-aggregated shuffles. Zero-token documents carry no tokens and
   *  drop from the scoring, as a length filter would have removed them
   *  upstream anyway. */
  def rankQuality(spark: SparkSession, dir: String): DataFrame = {
    val target = Seq("src0", "src1", "src2", "src3")
    val docToks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = docToks.filter(col("source").isin(target: _*))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val (ranked, vocabSize) =
      ScalableRank.withGlobalRowNumber(vocab, Seq(col("cnt").desc, col("tok")), "rank")
    val perDoc = docToks
      .join(ranked.select(col("tok"), col("rank")), Seq("tok"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("rank"), lit(vocabSize + 1)).as("r"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("ntok"), sum("r").as("sum_rank"))
      .select(col("doc_id"), col("source"),
        expr("sum_rank * 10000 div ntok").as("mean_rank_bp"))
    perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        expr("sum(mean_rank_bp) div count(1)").as("avg_doc_rank_bp"),
        min("mean_rank_bp").as("best_doc_bp"),
        max("mean_rank_bp").as("worst_doc_bp"))
      .orderBy("source")
  }

  /** HASHED LINEAR QUALITY CLASSIFIER — the fasttext-style filter shape
   *  every production corpus pipeline runs before training: token →
   *  hashed feature bucket (4096, the hashing trick), bucket → frozen
   *  weight, document score = Σ weights, keep = score > 0. The weight
   *  table is DERIVED (weight(b) = pmod(xxh64(b), 2048) − 1024) rather
   *  than trained, which keeps the entry fully deterministic and lets
   *  the DuckDB oracle reproduce every weight bit-for-bit through the
   *  xxh64-in-SQL machinery; swapping in real trained weights is a
   *  broadcast-join of a 4096-row table, same plan shape.
   *
   *  Scale shape: the whole classifier is MAP-SIDE (hash → hash →
   *  subtract per token, no weight-table join at all), then one partial
   *  agg per doc and one per source — the same two-shuffle profile as
   *  the other text rollups. Both moduli are powers of two, so unsigned
   *  and signed pmod agree and the oracle can mod the unsigned hash. */
  def classifierScore(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("source"),
        (pmod(xxhash64(pmod(xxhash64(col("t")), lit(4096L))), lit(2048L)) - 1024L).as("w"))
      .groupBy("doc_id", "source")
      .agg(sum("w").as("score"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum(col("score")).as("sum_score"))
      .orderBy("source")
  }

  /** Hapax-legomena rate per source — the vocabulary-tail statistic
   *  (share of a domain's token mass that is corpus-unique) that flags
   *  both high-novelty and high-noise domains. A corpus-hapax token has
   *  exactly one occurrence, so it belongs to exactly one source:
   *  `max(source)` on the count=1 group IS that source — no join back to
   *  the token stream.
   *
   *  Scale shape: word-count — explode, partial-aggregated groupBy on the
   *  token (map-side combine collapses repeats before the shuffle), then
   *  a per-source rollup. Two shuffles over the token stream, both on
   *  high-cardinality keys. */
  def hapaxRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val perSourceTok = toks.groupBy("source").agg(count(lit(1)).as("n_tok"))
    val hapax = toks.groupBy("tok")
      .agg(count(lit(1)).as("cnt"), max(col("source")).as("src1"))
      .filter(col("cnt") === 1L)
      .groupBy(col("src1").as("source")).agg(count(lit(1)).as("n_hapax"))
    perSourceTok.join(hapax, Seq("source"), "left")
      .select(col("source"), col("n_tok"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .withColumn("hapax_bp", expr("n_hapax * 10000 div n_tok"))
      .orderBy("source")
  }

  /** SIMPSON DIVERSITY per source — the collision-probability diversity
   *  index over the token distribution: D = Σ nᵢ(nᵢ−1) / (N(N−1)), the
   *  chance two tokens drawn without replacement are the SAME type. The
   *  exact-arithmetic complement of Shannon entropy (which needs logs):
   *  repetitive SEO spam scores high D, diverse prose low — reported as
   *  half-up bp alongside its Gini–Simpson complement. Same two-shuffle
   *  word-count shape as [[hapaxRate]]; moments in decimal(38) because
   *  Σnᵢ² crosses 2⁶³ long before a 100 TB source does. */
  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
        sum(expr("cast(c as decimal(38,0)) * (c - 1)")).as("coll"))
      .select(col("source"), col("n_tok"), col("n_types"),
        // a source of exactly one token makes N(N-1) = 0: guard to NULL
        // (Spark div would NULL silently, DuckDB // would abort the sweep)
        expr("""CASE WHEN n_tok <= 1 THEN NULL ELSE
                cast((2 * coll * 10000 + cast(n_tok as decimal(38,0)) * (n_tok - 1))
                 div (2 * cast(n_tok as decimal(38,0)) * (n_tok - 1)) as bigint) END""").as("simpson_bp"))
      .withColumn("gini_simpson_bp", lit(10000L) - col("simpson_bp"))
      .orderBy("source")

  /** SPEARMAN RANK CORRELATION between doc length and quality score —
   *  the monotone-association screen ("does longer mean better") that
   *  Pearson gets wrong on heavy-tailed lengths. Both rank passes are
   *  [[ScalableRank.withGlobalRowNumber]] under tie-broken total orders
   *  (value, doc_id) — ranks form exact permutations, so
   *  ρ = 1 − 6Σd²/(n(n²−1)) is integer until ONE float division (the
   *  kappa convention; ρ is signed). Σd² in decimal(38): it reaches n³. */
  def lenQualitySpearman(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("ntok"),
        qualityBp(col("text")).as("qbp"))
      .persist(Tuning.persistLevel) // BOTH rank passes read the scored frame: without the
                 // barrier each pass re-runs the tokenize+quality
                 // expressions over the full corpus (the minhash lesson)
    // CHAINED rank passes (the q81 discipline): the second pass ranks the
    // first pass's output — each rank depends only on its own sort key,
    // so chaining is exact and the old rank-frame join on doc_id (one
    // more full shuffle of both n-row rank frames) disappears.
    val (ra, n) = ScalableRank.withGlobalRowNumber(
      d, Seq(col("ntok"), col("doc_id")), "ra")
    val rb = ScalableRank.withGlobalRowNumber(
      ra, Seq(col("qbp"), col("doc_id")), "rb")._1
    rb.agg(sum(expr("cast((ra - rb) as decimal(38,0)) * (ra - rb)")).as("sd2"))
      .select(lit(n).as("n_docs"), col("sd2").cast("string").as("sum_d2"),
        expr(s"""1.0 - 6.0 * cast(sd2 as double)
               / (cast($n as double) * (cast($n as double) * $n - 1))""").as("spearman_rho"))
  }

  /** VOCABULARY COVERAGE CURVE — the tokenizer-design question "how many
   *  types cover X% of the token mass": the count of most-frequent token
   *  types needed to reach 50 / 90 / 99% corpus coverage. The running
   *  mass in frequency-rank order is a GLOBAL prefix sum over the type
   *  table — [[ScalableRank.withGroupedPrefixSum]] on the negated-count
   *  key (the q74 discipline), never a single-task window over millions
   *  of types. The smallest k with cum_k ≥ p·T equals the COUNT of rows
   *  whose exclusive prefix is still below p·T — so each threshold is
   *  one cross-multiplied conditional count, no rank column needed. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("nc", -col("c"))
      .withColumn("g", lit(1))
    val total = broadcast(counts.agg(sum("c").as("t")))
    ScalableRank
      .withGroupedPrefixSum(counts, Seq("g"), Seq("nc", "tok"), "c", "prev")
      .crossJoin(total)
      .agg(count(lit(1)).as("n_types"), max("t").as("total_tokens"),
        sum(when(col("prev") * 100 < col("t") * 50, 1L).otherwise(0L)).as("types_p50"),
        sum(when(col("prev") * 100 < col("t") * 90, 1L).otherwise(0L)).as("types_p90"),
        sum(when(col("prev") * 100 < col("t") * 99, 1L).otherwise(0L)).as("types_p99"))
  }

  /** CONTENT NOVELTY per source — what fraction of a domain's 3-gram
   *  mass is FIRST SEEN there (ingestion order = doc_id): the
   *  data-valuation signal that separates sources adding new content
   *  from sources re-serving what the corpus already has. A shingle's
   *  first owner is one `min` over the shared shingle index; novelty is
   *  the share of a doc's shingles it owns, rolled up per source in
   *  exact basis points.
   *
   *  Scale shape: two aggregates over the per-corpus shingle snapshot
   *  (groupBy shingle for first-owner, groupBy doc for the roll-up) and
   *  a broadcast-size source join — no new corpus scan, no new index. */
  def noveltyBySource(spark: SparkSession, dir: String): DataFrame = {
    // a doc's novel count = #shingles whose index-wide min owner is the
    // doc — countable per first-owner straight off the first-owner
    // aggregate, so the old index⋈first-owner join (a full re-shuffle of
    // the exploded shingle stream, the query's dominant exchange) is
    // gone; per-doc totals are a map-side size() over the PACKED
    // snapshot (shingles are array_distinct'd per doc, so size = the old
    // per-doc row count, and docs with zero shingles were absent from
    // the exploded form — filtered to match).
    val novelPerDoc = graft.dedup.Dedup.shingleIndex(spark, dir)
      .groupBy("sh").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    graft.dedup.Dedup.packedShingles(spark, dir)
      .select(col("doc_id"), col("source"), size(col("shs")).cast("long").as("n_sh"))
      .filter(col("n_sh") > 0)
      .join(novelPerDoc, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("shingles"),
        sum(coalesce(col("n_novel"), lit(0L))).as("novel"))
      .withColumn("novel_bp", expr("novel * 10000 div shingles"))
      .orderBy("source")
  }

  /** SOURCE-OVERLAP MATRIX — pairwise content overlap between sources as
   *  Jaccard over each source's DISTINCT 3-gram shingle set, off the
   *  shared [[graft.dedup.Dedup.shingleIndex]] snapshot (no re-shingling).
   *  The crawl-curation report behind "which feeds duplicate each other":
   *  a high cell means one source is largely a re-crawl of the other and
   *  the mixture planner should discount it. Only overlapping pairs
   *  appear (inner join on the shingle).
   *
   *  Shape: one distinct to the (source, shingle) level — rows bounded by
   *  |sources|·|shingle vocab| — then a self equi-join ON THE SHINGLE
   *  (per-shingle fanout ≤ sources², never docs²) into a pair count; the
   *  20-row size table joins broadcast. At very large source counts the
   *  hot-shingle cap of the pair index applies the same way. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // ONE exchange instead of distinct + self-join: group the index by
    // shingle collecting the (≤ |sources|, bounded) owner set —
    // collect_set dedupes map-side exactly like the old distinct — then
    // emit each set's sorted pairs MAP-SIDE with higher-order array
    // expressions (array_sort uses the same binary string order as the
    // old src_a < src_b filter). The pair counts partial-aggregate to
    // ≤ |sources|² rows per task; sizes fall out of the same grouped
    // frame, which the two consumers read through one persist.
    val ownerSets = graft.dedup.Dedup.shingleIndex(spark, dir)
      .groupBy("sh").agg(array_sort(collect_set(col("source"))).as("srcs"))
      .persist(Tuning.persistLevel) // two consumers: pair counts and sizes
    val sizes = ownerSets.select(explode(col("srcs")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n"))
    ownerSets
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
             transform(slice(srcs, i + 2, size(srcs) - i - 1), b -> struct(a, b))))"""))
        .as("p"))
      .select(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("inter"),
        expr("(2 * inter * 10000 + (na + nb - inter)) div (2 * (na + nb - inter))").as("jaccard_bp"))
      .orderBy("src_a", "src_b")
  }

  /** SOURCE-DISTRIBUTION DIVERGENCE — pairwise L1 distance between the
   *  token FREQUENCY distributions of each source pair, in half-up basis
   *  points of the maximum (2). The distributional complement of
   *  [[sourceOverlap]]'s set-based Jaccard: two sources can share most
   *  of a vocabulary yet use it at very different rates — this is what a
   *  mixture planner reads to know whether two feeds are interchangeable.
   *  Exact integers throughout: Σ|pₐ−p_b| cross-multiplies to
   *  Σ|cₐ·T_b − c_b·Tₐ|, and the tokens present in only one source
   *  contribute (Tₐ−Σshared cₐ)·T_b + (T_b−Σshared c_b)·Tₐ — recovered
   *  from the shared-token join alone, so ONE equi-join on the token
   *  (per-token fanout ≤ sources², the sourceOverlap discipline) covers
   *  the whole sum with no full-outer expansion. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .persist(Tuning.persistLevel) // three consumers: totals and both join sides
    val t = c.groupBy("source").agg(sum("cnt").as("tt"))
    c.select(col("source").as("src_a"), col("token"), col("cnt").as("ca"))
      .join(c.select(col("source").as("src_b"), col("token"), col("cnt").as("cb")), "token")
      .filter(col("src_a") < col("src_b"))
      .join(t.select(col("source").as("src_a"), col("tt").as("ta")), "src_a")
      .join(t.select(col("source").as("src_b"), col("tt").as("tb")), "src_b")
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"),
        // per-row |ca·tb − cb·ta| fits a long (≤ ~1e13 at sf10) but the
        // SUM over a big shared vocabulary does not — accumulate decimal
        sum(abs(col("ca") * col("tb") - col("cb") * col("ta")).cast("decimal(38,0)")).as("s_abs"),
        sum("ca").as("sca"), sum("cb").as("scb"),
        first("ta").as("ta"), first("tb").as("tb"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        expr("""cast((2 * (s_abs + (ta - sca) * cast(tb as decimal(38,0))
                           + (tb - scb) * cast(ta as decimal(38,0))) * 10000
               + 2 * cast(ta as decimal(38,0)) * tb)
               div (2 * 2 * cast(ta as decimal(38,0)) * tb) as bigint)""").as("l1_bp"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB twin of [[graft.functions.TextFunctions.langId]]: tokenize,
   *  count stopword hits per language, argmax with the same ≥ tiebreak
   *  order. Shared by the confusion and kappa oracles (one source of
   *  truth — drift between the two would silently break kappa). */
  private val LangPredCte: String = """
      WITH t AS (
        SELECT lang,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      c AS (
        SELECT lang,
          len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','for'], x))) AS c_en,
          len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','los','por'], x))) AS c_es,
          len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS c_de,
          len(list_filter(toks, x -> list_contains(['le','la','les','des','est','dans','pour','une'], x))) AS c_fr,
          len(list_filter(toks, x -> list_contains(['il','di','che','la','per','con','del','una'], x))) AS c_it
        FROM t),
      p AS (
        SELECT lang,
          CASE WHEN greatest(c_en,c_es,c_de,c_fr,c_it) = 0 THEN 'und'
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_it THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_it THEN 'es'
               WHEN c_de >= c_fr AND c_de >= c_it THEN 'de'
               WHEN c_fr >= c_it THEN 'fr'
               ELSE 'it' END AS pred_lang
        FROM c)""".stripLeading


  /** GOPHER-RULE QUALITY SCREEN per source (Rae et al. 2021, "Scaling
   *  Language Models: Methods, Analysis & Insights from Training Gopher",
   *  App. A1.1 — the canonical pre-training quality filter, adapted to the
   *  single-line synthetic corpus: the line-based rules are degenerate
   *  here, the five below are the live ones):
   *   - word count outside [50, 100 000]
   *   - mean word length (×100, integer) outside [300, 1000]
   *   - fewer than 2 distinct stop-markers present (Gopher requires 2 of
   *    its 8 function words; this corpus's only function words are
   *    {the, a}, so the rule keeps its ≥2-distinct form over that set)
   *   - top bigram > 18 % of all bigrams (repetition)
   *   - duplicate trigram mass > 30 % (repetition)
   *  Every fraction tests cross-multiplied INTEGERS (top·100 > n·18), so
   *  no flag can float-flip; pass_bp is the half-up share of docs clearing
   *  all five.
   *
   *  Scale shape: one narrow scan computes the scalar features map-side;
   *  the two repetition rules share ONE shuffle — bigrams and trigrams are
   *  tagged (n=2/3) into the same (doc, n, gram) count aggregate (map-side
   *  combine), rolled up per doc, then per source. No windows, no
   *  collects; at 100 TB this is the same two-level word-count discipline
   *  as [[hapaxRate]] with an n-gram key. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stopMarkers = Seq("the", "a")
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), tokens(col("text")).as("t"),
        tokenCount(col("text")).cast("long").as("ntok"))
      .select(col("doc_id"), col("source"), col("t"), col("ntok"),
        when(col("ntok") === 0L, lit(0L))
          .otherwise(expr("(length(translate(trim(text), ' ', '')) * 100) div ntok")).as("mwl100"),
        stopMarkers.map(w => when(array_contains(col("t"), w), 1L).otherwise(0L))
          .reduce(_ + _).as("stop_hits"))
    val bg = base.select(col("doc_id"), lit(2L).as("n"),
      explode(expr("CASE WHEN size(t) >= 2 THEN " +
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), (a, b) -> concat(a, ' ', b)) " +
        "ELSE array() END")).as("gram"))
    val tg = base.select(col("doc_id"), lit(3L).as("n"),
      explode(expr("CASE WHEN size(t) >= 3 THEN " +
        "zip_with(zip_with(slice(t, 1, size(t) - 2), slice(t, 2, size(t) - 2), (a, b) -> concat(a, ' ', b)), " +
        "slice(t, 3, size(t) - 2), (ab, c) -> concat(ab, ' ', c)) " +
        "ELSE array() END")).as("gram"))
    val gstats = bg.unionAll(tg)
      .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(when(col("n") === 2L, col("c")).otherwise(0L)).as("n_bg"),
        max(when(col("n") === 2L, col("c")).otherwise(0L)).as("top_bg"),
        sum(when(col("n") === 3L, col("c")).otherwise(0L)).as("n_tg"),
        sum(when(col("n") === 3L, col("c") - 1L).otherwise(0L)).as("dup_tg"))
    base.join(gstats, Seq("doc_id"), "left")
      .select(col("source"),
        (col("ntok") < 50L || col("ntok") > 100000L).as("f_wc"),
        (col("mwl100") < 300L || col("mwl100") > 1000L).as("f_mwl"),
        (col("stop_hits") < 2L).as("f_stop"),
        (coalesce(col("top_bg"), lit(0L)) * 100L > coalesce(col("n_bg"), lit(0L)) * 18L).as("f_rep2"),
        (coalesce(col("dup_tg"), lit(0L)) * 100L > coalesce(col("n_tg"), lit(0L)) * 30L).as("f_rep3"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("f_wc"), 1L).otherwise(0L)).as("n_wc"),
        sum(when(col("f_mwl"), 1L).otherwise(0L)).as("n_mwl"),
        sum(when(col("f_stop"), 1L).otherwise(0L)).as("n_stop"),
        sum(when(col("f_rep2"), 1L).otherwise(0L)).as("n_rep2"),
        sum(when(col("f_rep3"), 1L).otherwise(0L)).as("n_rep3"),
        sum(when(!col("f_wc") && !col("f_mwl") && !col("f_stop") && !col("f_rep2") && !col("f_rep3"),
          1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_bp", expr("(2 * n_pass * 10000 + n_docs) div (2 * n_docs)"))
      .orderBy("source")
  }

  val defs: Vector[QueryDef] = Vector(
    // exact twin: row_number ranks under the same tie-broken total
    // orders, hugeint Σd², one float division
    QueryDef("text_len_quality_spearman", lenQualitySpearman, Some(s"""
      WITH d AS (
        SELECT doc_id,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
                END) AS ntok0,
               text
        FROM documents),
      q AS (
        SELECT doc_id, ntok0 AS ntok, len1, m, punct, alpha FROM (
          SELECT doc_id, ntok0,
                 ${Tables.QbpParts.replace("ntok", "ntok0")}
          FROM d) t),
      s AS (
        SELECT doc_id, ${Tables.QbpExpr} AS qbp, ntok FROM q),
      r AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY ntok, doc_id) AS ra,
               row_number() OVER (ORDER BY qbp, doc_id) AS rb
        FROM s),
      m AS (
        SELECT count(*) AS n, sum(cast(ra - rb as hugeint) * (ra - rb)) AS sd2
        FROM r)
      SELECT cast(n as bigint) AS n_docs, cast(sd2 as varchar) AS sum_d2,
             1.0 - 6.0 * cast(sd2 as double)
               / (cast(n as double) * (cast(n as double) * n - 1)) AS spearman_rho
      FROM m""")),
    // exact twin: the same exclusive prefix sum as a window over the
    // identical (count desc, token) total order, same cross-multiplied
    // threshold counts
    QueryDef("text_vocab_coverage", vocabCoverage, Some("""
      WITH dt AS (
        SELECT unnest(
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      vc AS (SELECT tok, count(*) AS c FROM dt GROUP BY 1),
      t AS (SELECT sum(c) AS t FROM vc),
      r AS (
        SELECT c, coalesce(sum(c) OVER (ORDER BY c DESC, tok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        FROM vc)
      SELECT count(*) AS n_types, cast(max(t.t) as bigint) AS total_tokens,
             cast(sum(CASE WHEN prev * 100 < t.t * 50 THEN 1 ELSE 0 END) as bigint) AS types_p50,
             cast(sum(CASE WHEN prev * 100 < t.t * 90 THEN 1 ELSE 0 END) as bigint) AS types_p90,
             cast(sum(CASE WHEN prev * 100 < t.t * 99 THEN 1 ELSE 0 END) as bigint) AS types_p99
      FROM r, t""")),
    // exact twin: same tokenization CTE as the other text oracles,
    // hugeint moments, the same single half-up division
    QueryDef("text_simpson", simpsonDiversity, Some("""
      WITH dt AS (
        SELECT source, unnest(
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      tc AS (SELECT source, tok, count(*) AS c FROM dt GROUP BY 1, 2),
      m AS (
        SELECT source, sum(c) AS n_tok, count(*) AS n_types,
               sum(cast(c as hugeint) * (c - 1)) AS coll
        FROM tc GROUP BY 1)
      SELECT source, cast(n_tok as bigint) AS n_tok,
             cast(n_types as bigint) AS n_types,
             CASE WHEN n_tok <= 1 THEN NULL ELSE
               cast((2 * coll * 10000 + cast(n_tok as hugeint) * (n_tok - 1))
                    // (2 * cast(n_tok as hugeint) * (n_tok - 1)) as bigint) END AS simpson_bp,
             CASE WHEN n_tok <= 1 THEN NULL ELSE
               10000 - cast((2 * coll * 10000 + cast(n_tok as hugeint) * (n_tok - 1))
                    // (2 * cast(n_tok as hugeint) * (n_tok - 1)) as bigint) END AS gini_simpson_bp
      FROM m ORDER BY source""")),
    // exact twin: one shared-token join, the one-sided mass recovered
    // from the totals, identical half-up integer normalization
    QueryDef("text_source_divergence", sourceDivergence, Some("""
      WITH dt AS (
        SELECT source, unnest(
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS token
        FROM documents),
      c AS (SELECT source, token, count(*) AS cnt FROM dt GROUP BY 1, 2),
      t AS (SELECT source, sum(cnt) AS tt FROM c GROUP BY 1),
      sh AS (
        SELECT a.source AS src_a, b.source AS src_b,
               count(*) AS n_shared,
               sum(abs(a.cnt * tb.tt - b.cnt * ta.tt)) AS s_abs,
               sum(a.cnt) AS sca, sum(b.cnt) AS scb
        FROM c a JOIN c b ON a.token = b.token AND a.source < b.source
        JOIN t ta ON ta.source = a.source
        JOIN t tb ON tb.source = b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, cast(n_shared as bigint) AS n_shared,
             cast((2 * (s_abs + (ta.tt - sca) * tb.tt + (tb.tt - scb) * ta.tt) * 10000
                   + 2 * ta.tt * tb.tt) // (2 * 2 * ta.tt * tb.tt) as bigint) AS l1_bp
      FROM sh
      JOIN t ta ON ta.source = sh.src_a
      JOIN t tb ON tb.source = sh.src_b
      ORDER BY src_a, src_b""")),
    // exact twin: string shingles stand in for the 64-bit hashes (the
    // text_novelty equivalence — set operations are collision-free at
    // oracle scale), same half-up integer Jaccard
    QueryDef("text_source_overlap", sourceOverlap, Some("""
      WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3),
      sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
      pr AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, cast(inter as bigint) AS inter,
             (2 * inter * 10000 + (za.n + zb.n - inter)) // (2 * (za.n + zb.n - inter)) AS jaccard_bp
      FROM pr JOIN sz za ON za.source = pr.src_a JOIN sz zb ON zb.source = pr.src_b
      ORDER BY src_a, src_b""")),
    QueryDef("text_novelty", noveltyBySource, Some("""
      WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3),
      f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh),
      pd AS (
        SELECT sh.doc_id, count(*) AS n_sh,
               sum(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END) AS n_novel
        FROM sh JOIN f USING (sh) GROUP BY 1)
      SELECT d.source, count(*) AS n_docs,
             cast(sum(pd.n_sh) as bigint) AS shingles,
             cast(sum(pd.n_novel) as bigint) AS novel,
             cast(sum(pd.n_novel) * 10000 // sum(pd.n_sh) as bigint) AS novel_bp
      FROM pd JOIN documents d ON d.doc_id = pd.doc_id
      GROUP BY d.source ORDER BY d.source""")),
    QueryDef("text_hapax_rate", hapaxRate, Some("""
      WITH dt AS (
        SELECT source, unnest(
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      st AS (SELECT source, count(*) AS n_tok FROM dt GROUP BY source),
      h AS (
        SELECT max(source) AS source, count(*) AS cnt FROM dt GROUP BY tok),
      hs AS (SELECT source, count(*) AS n_hapax FROM h WHERE cnt = 1 GROUP BY source)
      SELECT st.source, st.n_tok,
             cast(coalesce(hs.n_hapax, 0) as bigint) AS n_hapax,
             cast(coalesce(hs.n_hapax, 0) * 10000 // st.n_tok as bigint) AS hapax_bp
      FROM st LEFT JOIN hs ON st.source = hs.source
      ORDER BY st.source""")),
    // weights reproduced through the xxh64-in-SQL machinery: per-token
    // string hash → bucket (power-of-two mod), per-bucket long hash →
    // weight; all integer, so the comparison is hash-exact
    QueryDef("text_classifier_score", classifierScore,
      Some(graft.dedup.XxhashOracle.classifierSql)),
    // same tokenization CTE as the other text oracles; the rank is the
    // same (cnt desc, tok) total order, OOV = V+1, all divisions integer
    QueryDef("text_rank_quality", rankQuality, Some("""
      WITH dt AS MATERIALIZED (
        SELECT doc_id, source, unnest(
          CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      vc AS (SELECT tok, count(*) AS cnt FROM dt
             WHERE source IN ('src0','src1','src2','src3') GROUP BY tok),
      rk AS MATERIALIZED (
        SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM vc),
      sc AS (
        SELECT dt.doc_id, dt.source, count(*) AS ntok,
               sum(coalesce(rk.rank, (SELECT count(*) + 1 FROM vc))) AS sum_rank
        FROM dt LEFT JOIN rk USING (tok)
        GROUP BY 1, 2),
      d AS (SELECT doc_id, source,
                   cast(sum_rank * 10000 // ntok as bigint) AS mean_rank_bp
            FROM sc)
      SELECT source, cast(count(*) as bigint) AS n_docs,
             cast(sum(mean_rank_bp) // count(*) as bigint) AS avg_doc_rank_bp,
             cast(min(mean_rank_bp) as bigint) AS best_doc_bp,
             cast(max(mean_rank_bp) as bigint) AS worst_doc_bp
      FROM d GROUP BY source ORDER BY source""")),
    QueryDef("q48_hof_suite", hofSuite, Some("""
      WITH t AS (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      m AS (
        SELECT source,
               len(list_filter(toks, x -> length(x) > 4)) AS n_long,
               coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS char_mass,
               coalesce(list_sum(list_transform(range(1, len(toks)),
                 i -> CASE WHEN toks[i] = toks[i+1] THEN 1 ELSE 0 END)), 0) AS n_immediate_reps,
               CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS has_spark
        FROM t)
      SELECT source, count(*) AS n_docs,
             cast(sum(n_long) as bigint) AS sum_long_tokens,
             cast(sum(char_mass) as bigint) AS sum_char_mass,
             cast(sum(n_immediate_reps) as bigint) AS sum_reps,
             cast(sum(has_spark) as bigint) AS n_with_spark
      FROM m GROUP BY source ORDER BY source""")),
    // oracle = unblocked all-pairs over the distinct vocabulary (ground
    // truth; the Spark side's gram blocking is lossless by the padded
    // q-gram bound, so the sets must be identical)
    QueryDef("text_fuzzy_join", fuzzyJoin, Some("""
      WITH n AS (SELECT p_name, count(*) AS np FROM part GROUP BY 1)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             cast(levenshtein(a.p_name, b.p_name) as bigint) AS edit_dist,
             a.np * b.np AS n_part_pairs
      FROM n a JOIN n b ON a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY name_a, name_b""")),
    QueryDef("text_fuzzy_match", fuzzyMatch, Some("""
      WITH reps AS (SELECT p_type AS t, min(p_name) AS rep_name FROM part GROUP BY 1)
      SELECT p_type, count(*) AS n,
             cast(sum(levenshtein(p_name, rep_name)) as bigint) AS sum_dist,
             cast(max(levenshtein(p_name, rep_name)) as bigint) AS max_dist,
             count(CASE WHEN levenshtein(p_name, rep_name) BETWEEN 1 AND 3 THEN 1 END) AS n_near
      FROM part JOIN reps ON p_type = t
      GROUP BY p_type ORDER BY p_type""")),
    QueryDef("text_token_stats", tokenStats, Some("""
      SELECT lang,
             cast(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END) as bigint) AS total_tokens,
             cast(max(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END) as bigint) AS max_tokens,
             cast(sum(n_chars) as bigint) AS total_chars,
             count(*) AS n_docs
      FROM documents GROUP BY lang ORDER BY lang""")),
    QueryDef("text_repetition_stats", repetitionStats, Some("""
      WITH t AS (
        SELECT source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      g AS (
        SELECT source, toks,
               CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                    ELSE [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))] END AS g2
        FROM t),
      b AS (
        SELECT source,
          CASE WHEN len(toks) > 0
               THEN ((len(toks) - len(list_distinct(toks))) * 10000) // len(toks)
               ELSE 0 END AS dup_tok_bp,
          CASE WHEN len(g2) > 0
               THEN ((len(g2) - len(list_distinct(g2))) * 10000) // len(g2)
               ELSE 0 END AS dup_2gram_bp
        FROM g)
      SELECT source, count(*) AS n_docs,
             cast(sum(dup_tok_bp) as bigint) AS sum_dup_tok_bp,
             cast(sum(dup_2gram_bp) as bigint) AS sum_dup_2gram_bp,
             count(CASE WHEN dup_tok_bp >= 5000 THEN 1 END) AS n_heavy_repeat
      FROM b GROUP BY source ORDER BY source""")),
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
    // langId / qualityScore replicated in DuckDB: same tokenization
    // (regexp split on \s+), same marker sets, same first-max tiebreak
    // (en>=all, then es>=rest, ...), same integer arithmetic (// for the
    // long division in meanTokenLenX100), 'g' flag on regexp_replace to
    // match Spark's replace-all.
    QueryDef("text_quality_by_source", qualityBySource, Some(s"""
      WITH t AS (
        SELECT source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents),
      f AS (
        SELECT source, toks, ntok,
               ${graft.Tables.QbpParts}
        FROM t),
      s AS (
        SELECT source, toks,
          ${graft.Tables.QbpExpr} AS qbp,
          len(list_filter(toks, x -> list_contains(['the','and','of','to','in','is','that','for'], x))) AS c_en,
          len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','los','por'], x))) AS c_es,
          len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS c_de,
          len(list_filter(toks, x -> list_contains(['le','la','les','des','est','dans','pour','une'], x))) AS c_fr,
          len(list_filter(toks, x -> list_contains(['il','di','che','la','per','con','del','una'], x))) AS c_it
        FROM f),
      p AS (
        SELECT source, qbp,
          CASE WHEN greatest(c_en,c_es,c_de,c_fr,c_it) = 0 THEN 'und'
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_it THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_it THEN 'es'
               WHEN c_de >= c_fr AND c_de >= c_it THEN 'de'
               WHEN c_fr >= c_it THEN 'fr'
               ELSE 'it' END AS pred_lang
        FROM s)
      SELECT source,
             round(cast(sum(qbp) as double) / (count(*) * 10000.0), 3) AS avg_quality,
             count(CASE WHEN pred_lang = 'en' THEN 1 END) AS n_pred_en,
             count(*) AS n_docs
      FROM p GROUP BY source ORDER BY source""")),
    QueryDef("text_lang_confusion", langConfusion, Some(s"""
      $LangPredCte
      SELECT lang, pred_lang, count(*) AS n
      FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")),
    // exact twin: same prediction CTE; all agreement moments are integer,
    // one float division for the coefficient (the q57/q73 convention)
    QueryDef("text_lang_kappa", langKappa, Some(s"""
      $LangPredCte,
      conf AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
      tot AS (SELECT cast(sum(n) as bigint) AS nn,
                     cast(coalesce(sum(CASE WHEN lang = pred_lang THEN n END), 0) as bigint) AS diag
              FROM conf),
      rm AS (SELECT lang, sum(n) AS rn FROM conf GROUP BY 1),
      cm AS (SELECT pred_lang AS lang, sum(n) AS cn FROM conf GROUP BY 1),
      pe AS (SELECT cast(coalesce(sum(rm.rn * cm.cn), 0) as bigint) AS src
             FROM rm JOIN cm USING (lang))
      SELECT nn AS n_docs, diag AS n_agree,
             (2 * diag * 10000 + nn) // (2 * nn) AS po_bp,
             cast(nn * diag - src as double) / cast(nn * nn - src as double) AS kappa
      FROM tot, pe""")),
    // same tokenize + trigram construction as the dedup oracles; the
    // common set is counted over DISTINCT per-doc shingles in both engines
    QueryDef("text_boilerplate", boilerplate, Some("""
      WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3),
      hot AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 100),
      perdoc AS (
        SELECT doc_id, source, count(*) AS n_sh,
               count(CASE WHEN sh IN (SELECT sh FROM hot) THEN 1 END) AS n_hot
        FROM sh GROUP BY doc_id, source)
      SELECT source, count(*) AS n_docs_with_shingles,
             cast(sum(n_hot) as bigint) AS sum_hot,
             cast(sum(n_sh) as bigint) AS sum_sh,
             (cast(sum(n_hot) as bigint) * 10000) // cast(sum(n_sh) as bigint) AS boilerplate_bp
      FROM perdoc GROUP BY source ORDER BY source""")),
    // exact twin: same adapted Gopher rules, same tagged one-pass n-gram
    // counts, every threshold a cross-multiplied integer compare
    QueryDef("text_gopher_rules", gopherRules, Some("""
      WITH d0 AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS t,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS ntok,
               text
        FROM documents),
      d AS (
        SELECT doc_id, source, t, ntok,
               CASE WHEN ntok = 0 THEN 0
                    ELSE (length(replace(trim(text), ' ', '')) * 100) // ntok END AS mwl100,
               (CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(t, 'a') THEN 1 ELSE 0 END) AS stop_hits
        FROM d0),
      g2 AS (
        SELECT doc_id, 2 AS n, t[i] || ' ' || t[i + 1] AS gram
        FROM d, unnest(range(1, len(t))) u(i)),
      g3 AS (
        SELECT doc_id, 3 AS n, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
        FROM d, unnest(range(1, len(t) - 1)) u(i)),
      gc AS (
        SELECT doc_id, n, gram, count(*) AS c
        FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3) g GROUP BY 1, 2, 3),
      gs AS (
        SELECT doc_id,
               sum(CASE WHEN n = 2 THEN c ELSE 0 END) AS n_bg,
               max(CASE WHEN n = 2 THEN c ELSE 0 END) AS top_bg,
               sum(CASE WHEN n = 3 THEN c ELSE 0 END) AS n_tg,
               sum(CASE WHEN n = 3 THEN c - 1 ELSE 0 END) AS dup_tg
        FROM gc GROUP BY 1),
      f AS (
        SELECT source,
               (ntok < 50 OR ntok > 100000) AS f_wc,
               (mwl100 < 300 OR mwl100 > 1000) AS f_mwl,
               (stop_hits < 2) AS f_stop,
               coalesce(top_bg, 0) * 100 > coalesce(n_bg, 0) * 18 AS f_rep2,
               coalesce(dup_tg, 0) * 100 > coalesce(n_tg, 0) * 30 AS f_rep3
        FROM d LEFT JOIN gs USING (doc_id))
      SELECT source, count(*) AS n_docs,
             sum(CASE WHEN f_wc THEN 1 ELSE 0 END)::bigint AS n_wc,
             sum(CASE WHEN f_mwl THEN 1 ELSE 0 END)::bigint AS n_mwl,
             sum(CASE WHEN f_stop THEN 1 ELSE 0 END)::bigint AS n_stop,
             sum(CASE WHEN f_rep2 THEN 1 ELSE 0 END)::bigint AS n_rep2,
             sum(CASE WHEN f_rep3 THEN 1 ELSE 0 END)::bigint AS n_rep3,
             sum(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_stop AND NOT f_rep2 AND NOT f_rep3
                 THEN 1 ELSE 0 END)::bigint AS n_pass,
             cast((2 * sum(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_stop AND NOT f_rep2 AND NOT f_rep3
                 THEN 1 ELSE 0 END) * 10000 + count(*)) // (2 * count(*)) as bigint) AS pass_bp
      FROM f GROUP BY source ORDER BY source""")),
    QueryDef("text_fingerprints", fingerprints, Some("""
      WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents WHERE doc_id < 100)
      SELECT doc_id,
             cast(list_reduce(
               list_prepend(0::hugeint,
                 list_transform(toks, tok -> cast(cast(('0x' || substring(md5(tok), 1, 15)) as bigint) as hugeint))),
               (a, b) -> (a * 1000003 + b) % 2305843009213693951) as bigint) AS fp,
             cast(coalesce(list_sum(list_transform(toks, tok -> (length(tok) + 3) // 4)), 0) as bigint) AS n_subwords
      FROM t ORDER BY doc_id"""))
  )
}
