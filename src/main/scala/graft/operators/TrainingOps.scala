package graft.operators

import graft.Tuning
import graft.Tables
import graft.Tables.QueryDef
import graft.functions.{CharDistinctExpr, CharSumSqExpr}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Training-data curation operators beyond dedup: PII redaction, URL
 * normalization, vocabulary statistics, character-diversity scoring, and
 * SCD-2 history construction. Everything is map-side column expressions plus
 * one small aggregation — no self-joins, no windows over the whole corpus —
 * so each query is a single scan + one bounded shuffle at any scale.
 *
 * The documents testdata carries no real PII/URLs, so the redaction and URL
 * queries first append a DETERMINISTIC synthetic tail derived from
 * (doc_id, source, lang) — identically in the oracle — and then run the real
 * extraction machinery over it. The operators are exercised for real; only
 * the payload is synthesized (the same trick the media suite uses for its
 * binary columns).
 */
object TrainingOps {

  private def bridged(c: Column)(f: org.apache.spark.sql.catalyst.expressions.Expression
      => org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(f(ColumnBridge.expression(c)))

  def charSumSq(text: Column): Column = bridged(text)(CharSumSqExpr)
  def charDistinct(text: Column): Column = bridged(text)(CharDistinctExpr)

  // ---- PII redaction ------------------------------------------------------

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpPat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val SsnPat = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  private val PhonePat = "\\b555-[0-9]{4}\\b"

  /** The deterministic PII-bearing text both engines construct. */
  private def piiText: Column = concat(
    col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com or 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
    lit(" at 10.0."), (col("doc_id") % 256).cast("string"),
    lit(".7 ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  /** Scrub emails, IPs, SSNs and phone-shaped strings; report per-source
   *  counts and a content witness (min/max md5 of the redacted text) so the
   *  oracle verifies the REDACTED BYTES, not just the counts. Redaction
   *  order matters (an SSN tail is phone-shaped): email → ip → ssn → phone,
   *  identical in the oracle. */
  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(piiText, EmailPat, "<EMAIL>"),
            IpPat, "<IP>"),
          SsnPat, "<SSN>"),
        PhonePat, "<PHONE>")
    Tables.documents(spark, dir)
      .select(
        col("source"),
        size(regexp_extract_all(piiText, lit(EmailPat), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(piiText, lit(IpPat), lit(0))).cast("long").as("n_ip"),
        size(regexp_extract_all(piiText, lit(SsnPat), lit(0))).cast("long").as("n_ssn"),
        md5(redacted).as("red_md5"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_email").as("sum_email"),
        sum("n_ip").as("sum_ip"),
        sum("n_ssn").as("sum_ssn"),
        min("red_md5").as("min_red_md5"),
        max("red_md5").as("max_red_md5"))
      .orderBy("source")
  }

  // ---- URL parsing --------------------------------------------------------

  /** The deterministic URL both engines construct per doc. */
  private def urlCol: Column = concat(
    lit("https://"), col("source"), lit(".example."),
    element_at(array(lit("com"), lit("org"), lit("net")), (col("doc_id") % 3 + 1).cast("int")),
    lit("/"), col("lang"), lit("/p"), col("doc_id").cast("string"),
    lit("?ref=r"), (col("doc_id") % 5).cast("string"))

  /** Host/path/param extraction via Spark's native `parse_url`, rolled up
   *  per host: the "which domains feed the corpus, in which languages"
   *  report every crawl-curation pass starts with. */
  def urlStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        parse_url(urlCol, lit("HOST")).as("host"),
        parse_url(urlCol, lit("PATH")).as("path"),
        parse_url(urlCol, lit("QUERY"), lit("ref")).as("ref"))
      .select(col("host"), split_part(col("path"), lit("/"), lit(2)).as("path_lang"), col("ref"))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("path_lang")).as("n_langs"),
        countDistinct(col("ref")).as("n_refs"))
      .orderBy("host")

  // ---- Vocabulary (Zipf head) --------------------------------------------

  /** Global top-50 tokens by frequency (count desc, token asc tiebreak).
   *  Shape: map-side partial count per token, then `TakeOrdered` — each
   *  partition keeps its own top-50 and only those merge on the driver, so
   *  no global sort of the vocabulary ever happens. */
  def tokenZipf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)

  // ---- BPE pair statistics -------------------------------------------------

  /** Adjacent-token PAIR frequencies — the corpus statistic the first BPE
   *  merge step maximizes (Sennrich et al. 2016): top-40 bigrams by count
   *  (count desc, then lexicographic). Pairs come from `zip_with` over the
   *  token array against its own 1-shifted slice — a narrow per-row
   *  expansion of exactly `ntok − 1` structs, no shuffle until the pair
   *  count.
   *
   *  Shape: map-side partial count per pair → one hash shuffle on the pair
   *  key → `TakeOrdered` keeps only 40 rows per partition before the driver
   *  merge. The pair vocabulary can be huge at 100 TB, but it never sorts
   *  globally and never leaves the aggregate unbounded. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (l, r) -> named_struct('left_tok', l, 'right_tok', r))")).as("p"))
      .select(col("p.left_tok").as("left_tok"), col("p.right_tok").as("right_tok"))
      .groupBy("left_tok", "right_tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("left_tok").asc, col("right_tok").asc)
      .limit(40)

  /** BIGRAM-LM FAMILIARITY — the language-model-lite quality filter (the
   *  cheap stand-in for a KenLM perplexity gate, cf. CCNet): per doc, the
   *  share of adjacent token bigrams whose corpus frequency is STRICTLY
   *  ABOVE the corpus mean bigram frequency, in basis points, rolled up
   *  per source. Low share = improbable word sequences = likely noise.
   *  The threshold is self-calibrating (`cnt·types > total` — integer
   *  cross-multiplication against the corpus mean), so the rule is
   *  invariant to corpus growth, unlike any absolute count cutoff.
   *
   *  Shape (rewritten r12, guide §2.4): the corpus count of a row's OWN
   *  pair is a WINDOW over the pair key, not a separate aggregate joined
   *  back — so the pair stream is exchanged ONCE (by (l, r)) instead of
   *  twice (once aggregated into the LM table, once as the scoring join's
   *  probe side) and the merge join disappears; a same-window row_number
   *  marks one row per distinct pair, from which the (types, total)
   *  calibration is a bounded aggregate. The token strings are projected
   *  away right after the window, so the persisted two-consumer frame
   *  carries only (doc_id, source, cnt, rn) — no string payload. */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
          " (l, r) -> named_struct('l', l, 'r', r))")).as("p"))
      .select(col("doc_id"), col("source"), col("p.l").as("l"), col("p.r").as("r"))
    val byPair = Window.partitionBy("l", "r")
    // rn's intra-group order is irrelevant: only "exactly one row per
    // distinct pair has rn = 1" is consumed (types/tot), true for any order
    val scored = pairs
      .withColumn("cnt", count(lit(1)).over(byPair))
      .withColumn("rn", row_number().over(byPair.orderBy("doc_id")))
      .select(col("doc_id"), col("source"), col("cnt"), col("rn"))
      .persist(Tuning.persistLevel) // calibration + per-doc rollup consumers
    val cal = broadcast(scored.filter(col("rn") === 1)
      .agg(count(lit(1)).as("types"), sum("cnt").as("tot")))
    scored.crossJoin(cal)
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("nbi"),
        sum(when(col("cnt") * col("types") > col("tot"), 1L).otherwise(0L)).as("fam"))
      .select(col("source"), expr("fam * 10000 div nbi").as("share_bp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(share_bp) div count(1)").as("avg_familiar_bp"),
        min("share_bp").as("min_bp"), max("share_bp").as("max_bp"))
      .orderBy("source")
  }

  /** FEATURE-LABEL ASSOCIATION — the exact first step of training a
   *  linear label classifier (and the classic feature-selection screen):
   *  for each token, how unbalanced its document frequency is between
   *  English and non-English docs. The score is the cross-multiplied
   *  rate difference `n_pos·N_neg − n_neg·N_pos` (sign = direction) —
   *  exactly proportional to the first logistic-regression gradient from
   *  zero weights over binary presence features (σ(0) = ½ makes step one
   *  LINEAR — no exp, so the distributed gradient aggregate is
   *  integer-exact). One distinct-presence explode + one hash aggregate
   *  + TakeOrdered; the (N_pos, N_neg) calibration is a broadcast row. */
  def labelAssoc(spark: SparkSession, dir: String): DataFrame = {
    val dt = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("y"),
        explode(array_distinct(tokens(col("text")))).as("token"))
    val tot = broadcast(Tables.documents(spark, dir)
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("np"),
        sum(when(col("lang") === "en", 0L).otherwise(1L)).as("nn")))
    dt.groupBy("token")
      .agg(sum("y").as("n_pos"), sum(expr("1 - y")).as("n_neg"))
      .crossJoin(tot)
      .select(col("token"), col("n_pos"), col("n_neg"),
        expr("n_pos * nn - n_neg * np").as("assoc"))
      .orderBy(abs(col("assoc")).desc, col("token"))
      .limit(20)
  }

  // ---- Vocabulary coverage -------------------------------------------------

  /** Out-of-vocabulary rate per source against the corpus' own top-100
   *  token vocabulary — the tokenizer-coverage report a training run
   *  publishes before committing to a vocab size. The vocab is the zipf
   *  top-k (count desc, token asc at the boundary, so the cut is
   *  deterministic); each source's token stream is scored against it and
   *  rolled up to exact integer basis points.
   *
   *  Shape: pass 1 builds the bounded vocab (partial counts + TakeOrdered,
   *  same as [[tokenZipf]]); pass 2 re-streams tokens through a BROADCAST
   *  left join against those 100 rows (map-side, no shuffle) into one
   *  per-source aggregate. Two scans, one small shuffle — at 100 TB the
   *  vocab pass is the same job a real tokenizer-training step runs anyway. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(100)
      .select(col("tok"), lit(1L).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", expr("n_oov * 10000 div n_tokens"))
      .orderBy("source")
  }

  // ---- Character diversity ------------------------------------------------

  /** Per-source character-diversity rollup from the native char stats:
   *  Simpson concentration Σc²·10⁴ / len² (integer basis points — exact,
   *  see [[graft.functions.CharStat]]) and distinct-char counts. Catches
   *  single-character spam and alphabet-soup noise that token-level quality
   *  features miss. */
  def charDiversity(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"),
        charSumSq(col("text")).as("char_sum_sq_v"),
        charDistinct(col("text")).cast("long").as("n_distinct_chars"),
        length(col("text")).cast("long").as("char_len"))
      .withColumn("simpson_bp",
        when(col("char_len") > 0,
          expr("char_sum_sq_v * 10000 div (char_len * char_len)")).otherwise(0L))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("simpson_bp").as("sum_simpson_bp"),
        sum("n_distinct_chars").as("sum_distinct_chars"),
        max("n_distinct_chars").as("max_distinct_chars"))
      .orderBy("source")
  }

  // ---- SCD-2 history ------------------------------------------------------

  /** Slowly-changing-dimension (type 2) build over the event stream: for
   *  each user, collapse consecutive same-type events into validity
   *  intervals [valid_from, valid_to) and report per-user version counts.
   *  The windows partition BY USER — each user's history sorts within its
   *  own task, so the shuffle is one hash exchange and no global sort
   *  exists at any corpus size. Timestamps are exact micros (`ts div
   *  1000`), ties broken by event_id. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val versions = evs
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("us", 1).over(w))
    versions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_versions"),
        min("us").as("first_from"),
        max("us").as("last_from"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"))
      .orderBy("user_id")
  }

  // ---- TF-IDF keyword search ---------------------------------------------

  /** The fixed query vocabulary for [[tfidfSearch]] — corpus words, so every
   *  term has a real document frequency. */
  private val SearchTerms = Seq("spark", "join", "window", "hash")

  /** TF-IDF keyword search: score = Σ_t tf(t,d) · idf(t) over the query
   *  terms, top-10 documents. The idf is EXACT INTEGER — `(N·10⁶) div df` —
   *  instead of the textbook `log(N/df)`: monotone in N/df (so rankings
   *  agree), and integer arithmetic keeps the score bit-identical across
   *  engines, which floating logs cannot (the suite-wide convention behind
   *  `qualityBp`).
   *
   *  Shape at scale: the term filter lands directly on the exploded token
   *  stream (map-side, before any shuffle), tf is one partial-aggregated
   *  groupBy, df is a 4-row aggregate broadcast back, and the global top-10
   *  is `orderBy.limit` = TakeOrderedAndProject — per-partition top-k, no
   *  global sort, no window. The corpus row count N comes from a parquet
   *  count (metadata-only scan). */
  def tfidfSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count() // metadata-only count; the one scalar the score needs
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(SearchTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .withColumn("w", col("tf") * expr(s"(${n}L * 1000000L) div df"))
      .groupBy("doc_id")
      .agg(sum("w").as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** Per-document keyword extraction: top-3 tokens by full-vocabulary
   *  TF-IDF — the tagging/topic pass a curation run uses to label shards.
   *  Same exact-integer idf convention as [[tfidfSearch]].
   *
   *  Shape at scale: tf is one partial-aggregated groupBy over the
   *  exploded token stream; df derives from tf (no second corpus pass) and
   *  joins back by token (equi-join — the vocabulary is NOT broadcast: at
   *  web scale it is itself huge); the per-doc top-3 is a window
   *  partitioned by doc_id — a HIGH-cardinality key, so every task ranks
   *  only its own docs' few hundred terms (the per-group-window shape the
   *  ANN queries must avoid is few-groups × whole-corpus, not this). */
  def keywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val n = docs.count() // metadata-only count
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = tf.join(dfreq, "tok")
      .withColumn("w", col("tf") * expr(s"(${n}L * 1000000L) div df"))
    val perDoc = Window.partitionBy("doc_id").orderBy(col("w").desc, col("tok"))
    w.withColumn("rank", row_number().over(perDoc))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("bigint").as("rank"), col("tok"), col("w"))
      .orderBy("doc_id", "rank")
  }

  /** MARKOV TRANSITION MATRIX over per-user event sequences — the
   *  sequence-modeling prep that turns a log into next-step statistics:
   *  order each user's events (exact micros, event_id tiebreak — the q15
   *  convention), pair each with its successor via `lead` on the per-user
   *  window (high-cardinality key, the per-key window discipline), and
   *  count (from, to) pairs with the within-from share in exact basis
   *  points. The 5×5 output is the bigram table a sampler or a
   *  next-event baseline consumes.
   *
   *  Scale shape: one hash exchange on user_id for the window, one
   *  map-combined pair aggregate, a 5-row broadcast for the shares. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("from_type").agg(sum("n_transitions").as("t"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        expr("n_transitions * 10000 div t").as("share_bp"))
      .orderBy("from_type", "to_type")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("q59_transitions", transitions, Some("""
      WITH seq AS (
        SELECT event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events),
      p AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n_transitions,
             cast(n_transitions * 10000
                  // sum(n_transitions) OVER (PARTITION BY from_type) as bigint)
               AS share_bp
      FROM p ORDER BY from_type, to_type""")),
    QueryDef("text_keywords", keywords, Some("""
      WITH tok AS (
        SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                                   ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
      idf AS (
        SELECT tok, ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf
        FROM tf GROUP BY tok),
      w AS (
        SELECT doc_id, tok, cast(tf.tf * idf.idf as bigint) AS w
        FROM tf JOIN idf USING (tok)),
      r AS (
        SELECT doc_id, tok, w,
               row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, tok) AS rank
        FROM w)
      SELECT doc_id, rank, tok, w FROM r WHERE rank <= 3
      ORDER BY doc_id, rank""")),
    QueryDef("text_tfidf_search", tfidfSearch, Some("""
      WITH tok AS (
        SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                                   ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM tok
        WHERE tok IN ('spark', 'join', 'window', 'hash')
        GROUP BY 1, 2),
      idf AS (
        SELECT tok, ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf
        FROM tf GROUP BY tok)
      SELECT doc_id,
             cast(sum(tf.tf * idf.idf) as bigint) AS score,
             count(*) AS n_terms
      FROM tf JOIN idf USING (tok)
      GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 10""")),
    QueryDef("text_pii_redaction", piiRedaction, Some(s"""
      WITH synth AS (
        SELECT source,
               text || ' contact user' || cast(doc_id as varchar)
                    || '@example.com or 555-' || lpad(cast(doc_id % 10000 as varchar), 4, '0')
                    || ' at 10.0.' || cast(doc_id % 256 as varchar)
                    || '.7 ssn 123-45-' || lpad(cast(doc_id % 10000 as varchar), 4, '0') AS t
        FROM documents),
      red AS (
        SELECT source,
               len(regexp_extract_all(t, '$EmailPat')) AS n_email,
               len(regexp_extract_all(t, '$IpPat')) AS n_ip,
               len(regexp_extract_all(t, '$SsnPat')) AS n_ssn,
               md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                 '$EmailPat', '<EMAIL>', 'g'),
                 '$IpPat', '<IP>', 'g'),
                 '$SsnPat', '<SSN>', 'g'),
                 '$PhonePat', '<PHONE>', 'g')) AS red_md5
        FROM synth)
      SELECT source, count(*) AS n_docs,
             cast(sum(n_email) as bigint) AS sum_email,
             cast(sum(n_ip) as bigint) AS sum_ip,
             cast(sum(n_ssn) as bigint) AS sum_ssn,
             min(red_md5) AS min_red_md5,
             max(red_md5) AS max_red_md5
      FROM red GROUP BY source ORDER BY source""")),
    QueryDef("text_url_stats", urlStats, Some("""
      WITH u AS (
        SELECT 'https://' || source || '.example.'
               || ['com','org','net'][cast(doc_id % 3 as int) + 1]
               || '/' || lang || '/p' || cast(doc_id as varchar)
               || '?ref=r' || cast(doc_id % 5 as varchar) AS url
        FROM documents),
      p AS (
        SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
               regexp_extract(url, '^https://[^/]+/([^/]+)/', 1) AS path_lang,
               regexp_extract(url, 'ref=([^&#]*)', 1) AS ref
        FROM u)
      SELECT host, count(*) AS n_docs,
             count(DISTINCT path_lang) AS n_langs,
             count(DISTINCT ref) AS n_refs
      FROM p GROUP BY host ORDER BY host""")),
    QueryDef("text_token_zipf", tokenZipf, Some("""
      WITH t AS (
        SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents)
      SELECT token, count(*) AS n
      FROM (SELECT unnest(toks) AS token FROM t)
      GROUP BY token ORDER BY n DESC, token LIMIT 50""")),
    // exact twin: distinct token presence, the same cross-multiplied
    // gradient, abs-ranked with the token tiebreak
    QueryDef("text_label_assoc", labelAssoc, Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      dt AS (
        SELECT DISTINCT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               unnest(toks) AS token
        FROM t),
      tot AS (
        SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
               sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
        FROM documents),
      c AS (SELECT token, sum(y) AS n_pos, sum(1 - y) AS n_neg FROM dt GROUP BY 1)
      SELECT token, cast(n_pos as bigint) AS n_pos, cast(n_neg as bigint) AS n_neg,
             cast(n_pos * nn - n_neg * np as bigint) AS assoc
      FROM c, tot
      ORDER BY abs(n_pos * nn - n_neg * np) DESC, token LIMIT 20""")),
    // exact twin: same tokenization/bigram machinery as text_bpe_pairs,
    // the mean threshold cross-multiplied, all-floor integer shares
    QueryDef("text_bigram_lm", bigramLm, Some("""
      WITH t AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      p AS (
        SELECT doc_id, source,
               unnest(toks[1:len(toks)-1]) AS l,
               unnest(toks[2:len(toks)])   AS r
        FROM t WHERE len(toks) >= 2),
      c AS (SELECT l, r, count(*) AS cnt FROM p GROUP BY 1, 2),
      m AS (SELECT count(*) AS types, sum(cnt) AS tot FROM c),
      d AS (
        SELECT p.doc_id, p.source, count(*) AS nbi,
               sum(CASE WHEN c.cnt * m.types > m.tot THEN 1 ELSE 0 END) AS fam
        FROM p JOIN c USING (l, r), m GROUP BY 1, 2),
      s AS (SELECT source, fam * 10000 // nbi AS share_bp FROM d)
      SELECT source, count(*) AS n_docs,
             cast(sum(share_bp) // count(*) as bigint) AS avg_familiar_bp,
             cast(min(share_bp) as bigint) AS min_bp,
             cast(max(share_bp) as bigint) AS max_bp
      FROM s GROUP BY 1 ORDER BY 1""")),
    QueryDef("text_bpe_pairs", bpePairs, Some("""
      WITH t AS (
        SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      p AS (
        SELECT unnest(toks[1:len(toks)-1]) AS left_tok,
               unnest(toks[2:len(toks)])   AS right_tok
        FROM t WHERE len(toks) >= 2)
      SELECT left_tok, right_tok, count(*) AS n
      FROM p GROUP BY 1, 2
      ORDER BY n DESC, left_tok, right_tok LIMIT 40""")),
    QueryDef("text_oov_rate", oovRate, Some("""
      WITH tok AS (
        SELECT source,
               unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END) AS tok
        FROM documents),
      vocab AS (
        SELECT tok FROM (
          SELECT tok, count(*) AS n FROM tok GROUP BY tok
          ORDER BY n DESC, tok LIMIT 100)),
      s AS (
        SELECT t.source, count(*) AS n_tokens,
               cast(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) as bigint) AS n_oov
        FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.source)
      SELECT source, n_tokens, n_oov, n_oov * 10000 // n_tokens AS oov_bp
      FROM s ORDER BY source""")),
    QueryDef("text_char_diversity", charDiversity, Some("""
      WITH c AS (
        SELECT source, length(text) AS n,
               list_sum(list_transform(list_distinct(chars),
                 ch -> len(list_filter(chars, x -> x = ch))
                       * len(list_filter(chars, x -> x = ch)))) AS sum_sq,
               len(list_distinct(chars)) AS n_distinct
        FROM (SELECT source, text,
                     CASE WHEN length(text) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(text, '') END AS chars
              FROM documents))
      SELECT source, count(*) AS n_docs,
             cast(sum(CASE WHEN n > 0 THEN (sum_sq * 10000) // (n * n) ELSE 0 END) as bigint)
               AS sum_simpson_bp,
             cast(sum(n_distinct) as bigint) AS sum_distinct_chars,
             cast(max(n_distinct) as bigint) AS max_distinct_chars
      FROM c GROUP BY source ORDER BY source""")),
    QueryDef("q39_scd2", scd2, Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events),
      v AS (
        SELECT user_id, us, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        FROM e),
      k AS (
        SELECT user_id, us, event_id,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to
        FROM v
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id, count(*) AS n_versions,
             cast(min(us) as bigint) AS first_from,
             cast(max(us) as bigint) AS last_from,
             cast(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) as bigint) AS n_open
      FROM k GROUP BY user_id ORDER BY user_id"""))
  )
}
