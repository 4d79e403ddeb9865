package graft.dedup

import org.apache.spark.sql.catalyst.expressions.XXH64

/**
 * Generator for DuckDB oracles that reproduce Spark's XXH64 (xxhash64,
 * seed 42) in pure SQL — unlocking hash-checked oracles for the two dedup
 * tiers whose outputs are xxhash64-derived: [[Dedup.simhashDup]] and
 * [[Dedup.minhashLsh]].
 *
 * The xxHash64 algorithm is public (Yann Collet's spec); what's generated
 * here is its evaluation in 128-bit SQL arithmetic:
 *  - 64-bit wrapping multiply via 32-bit limb split (a full HUGEINT
 *    product of two 64-bit operands would overflow int128);
 *  - rotations/shifts as exact multiply/divide by powers of two;
 *  - the ≥32-byte stripe loop as four per-lane `list_reduce` folds (each
 *    accumulator only touches its own lane's words);
 *  - every pipeline stage is a MATERIALIZED CTE — DuckDB substitutes CTE
 *    and alias references textually, so chaining these expressions
 *    inline would blow the expression tree up exponentially (observed:
 *    planner hangs);
 *  - byte access via `ascii(substring(s, i, 1))`, exact for the ASCII
 *    corpus these queries run on (a non-ASCII corpus would need
 *    octet-level access; Spark hashes UTF-8 bytes).
 *
 * Validated bit-for-bit against `xxhash64()` over strings of length
 * 0–100 (both short and multi-stripe paths), raw longs, raw ints, and
 * long-array folds, plus the full query outputs at sf0.001/sf0.01.
 */
object XxhashOracle {

  private val M64 = "18446744073709551616::hugeint"
  private val M32 = "4294967296::hugeint"
  private val P1 = "11400714785074694791::hugeint"
  private val P2 = "14029467366897019727::hugeint"
  private val P3 = "1609587929392839161::hugeint"
  private val P4 = "9650029242287828579::hugeint"
  private val P5 = "2870177450012600261::hugeint"

  private def mul64(a: String, b: String): String =
    s"((($a)%$M32)*(($b)%$M32) + (((($a)%$M32)*(($b)//$M32) + (($a)//$M32)*(($b)%$M32)) % $M32) * $M32) % $M64"
  private def rotl(x: String, r: Int): String =
    s"((($x) * ${1L << r}::hugeint + ($x) // ${1L << (64 - r)}::hugeint) % $M64)"
  private def add64(a: String, b: String): String = s"((($a) + ($b)) % $M64)"
  private def xor64(a: String, b: String): String = s"xor(($a)::hugeint, ($b)::hugeint)"
  private def signed(x: String): String =
    s"CASE WHEN ($x) >= 9223372036854775808::hugeint THEN (($x) - $M64)::bigint ELSE ($x)::bigint END"
  private def unsigned(x: String): String =
    s"CASE WHEN ($x) < 0 THEN ($x)::hugeint + $M64 ELSE ($x)::hugeint END"

  private def wordAt(s: String, o: String, n: Int = 8): String =
    (0 until n).map(j => s"ascii(substring($s, ($o)+${j + 1}, 1))::hugeint * ${1L << (8 * j)}::hugeint")
      .mkString("(", " + ", ")")

  private def round0(v: String): String = mul64(rotl(mul64(v, P2), 31), P1)
  private def stripeRound(acc: String, w: String): String = mul64(rotl(add64(acc, mul64(w, P2)), 31), P1)

  private val vInits = Seq(
    s"((42::hugeint + $P1 + $P2) % $M64)",
    s"((42::hugeint + $P2) % $M64)",
    "42::hugeint",
    s"(((42::hugeint - $P1) % $M64 + $M64) % $M64)")

  private def lane(i: Int): String = {
    val w = wordAt("s", s"32*t + ${8 * i}")
    s"list_reduce(list_prepend(${vInits(i)}, list_transform(range(0, ns), t -> $w)), " +
      s"(acc, w) -> (${stripeRound("acc", "w")})::hugeint)"
  }

  /** CTE chain hashing each (sid, s) row of `src` with Spark xxhash64
   *  (UTF8String path, seed 42). Final CTE: `{pfx}_out(sid, h)`. */
  private def xxhStringCtes(pfx: String, src: String): String = {
    var merged = add64(add64(rotl("v1", 1), rotl("v2", 7)), add64(rotl("v3", 12), rotl("v4", 18)))
    for (i <- 1 to 4) merged = add64(mul64(xor64(merged, round0(s"v$i")), P1), P4)
    val h8 = s"list_reduce(list_prepend(h1, list_transform(range(0, n8), t -> ${wordAt("s", "32*ns + 8*t")})), " +
      s"(acc, w) -> (${add64(mul64(rotl(xor64("acc", round0("w")), 27), P1), P4)})::hugeint)"
    val h4 = add64(mul64(rotl(xor64("h8", mul64(wordAt("s", "o4", 4), P1)), 23), P2), P3)
    val hb = s"list_reduce(list_prepend(h4, list_transform(range(ob, L), o -> ascii(substring(s, o+1, 1))::hugeint)), " +
      s"(acc, b) -> (${mul64(rotl(xor64("acc", mul64("b", P5)), 11), P1)})::hugeint)"
    s"""${pfx}_g AS MATERIALIZED (
       |        SELECT sid, s, length(s) AS L, length(s)//32 AS ns,
       |               (length(s) - 32*(length(s)//32))//8 AS n8,
       |               32*(length(s)//32) + 8*((length(s) - 32*(length(s)//32))//8) AS o4
       |        FROM $src),
       |      ${pfx}_l AS MATERIALIZED (
       |        SELECT sid, s, L, ns, n8, o4, ${lane(0)} AS v1, ${lane(1)} AS v2, ${lane(2)} AS v3, ${lane(3)} AS v4
       |        FROM ${pfx}_g),
       |      ${pfx}_m AS MATERIALIZED (
       |        SELECT sid, s, L, n8, ns, o4,
       |               ((CASE WHEN ns > 0 THEN ($merged) ELSE ((42::hugeint + $P5) % $M64) END) + L) % $M64 AS h1
       |        FROM ${pfx}_l),
       |      ${pfx}_t8 AS MATERIALIZED (
       |        SELECT sid, s, L, o4, ($h8) AS h8 FROM ${pfx}_m),
       |      ${pfx}_t4 AS MATERIALIZED (
       |        SELECT sid, s, L,
       |               CASE WHEN o4 + 4 <= L THEN ($h4) ELSE h8 END AS h4,
       |               CASE WHEN o4 + 4 <= L THEN o4 + 4 ELSE o4 END AS ob
       |        FROM ${pfx}_t8),
       |      ${pfx}_tb AS MATERIALIZED (
       |        SELECT sid, ($hb) AS hb FROM ${pfx}_t4),
       |      ${pfx}_f2 AS MATERIALIZED (
       |        SELECT sid, (${mul64(xor64("hb", "hb // 8589934592::hugeint"), P2)}) AS f2 FROM ${pfx}_tb),
       |      ${pfx}_f4 AS MATERIALIZED (
       |        SELECT sid, (${mul64(xor64("f2", "f2 // 536870912::hugeint"), P3)}) AS f4 FROM ${pfx}_f2),
       |      ${pfx}_out AS MATERIALIZED (
       |        SELECT sid, ${signed(xor64("f4", "f4 // 4294967296::hugeint"))} AS h FROM ${pfx}_f4)""".stripMargin
  }

  /** CTE chain: XXH64.hashLong(u, sd) for each row of `src(keys, u, sd)`
   *  (unsigned hugeints). Final CTE: `{pfx}_out(keys, hu)` (unsigned). */
  private def hashLongCtes(pfx: String, src: String, keys: Seq[String]): String = {
    val k = keys.mkString(", ")
    val f4 = mul64(xor64("f2", "f2 // 536870912::hugeint"), P3)
    s"""${pfx}_a AS MATERIALIZED (
       |        SELECT $k, sd, (${mul64(rotl(mul64("u", P2), 31), P1)}) AS t FROM $src),
       |      ${pfx}_b AS MATERIALIZED (
       |        SELECT $k, (${add64(mul64(rotl(xor64(add64(add64("sd", P5), "8::hugeint"), "t"), 27), P1), P4)}) AS h1 FROM ${pfx}_a),
       |      ${pfx}_c AS MATERIALIZED (
       |        SELECT $k, (${mul64(xor64("h1", "h1 // 8589934592::hugeint"), P2)}) AS f2 FROM ${pfx}_b),
       |      ${pfx}_out AS MATERIALIZED (
       |        SELECT $k, (${xor64(f4, s"($f4) // 4294967296::hugeint")}) AS hu FROM ${pfx}_c)""".stripMargin
  }

  private val toksCte: String =
    """toks AS MATERIALIZED (
      |        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |                            ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      |        FROM documents)""".stripMargin

  /** Oracle for dedup_simhash: per-token xxh64 → 64 ±1 bit counters →
   *  sign-packed signature → all pairs at Hamming ≤ 3 (the pigeonhole
   *  chunk join emits exactly this set; the oracle joins directly at its
   *  own scale). */
  lazy val simhashSql: String = {
    val pw = (0 until 64).map(b => (BigInt(1) << b).toString).mkString("[", ",", "]::hugeint[]")
    s"""
       |      WITH $toksCte,
       |      xin AS MATERIALIZED (
       |        SELECT doc_id*1000000 + u.i AS sid, toks[u.i] AS s
       |        FROM toks, unnest(range(1, len(toks)+1)) u(i)),
       |      ${xxhStringCtes("x", "xin")},
       |      thu AS MATERIALIZED (
       |        SELECT sid // 1000000 AS doc_id, ${unsigned("h")} AS u FROM x_out),
       |      bits AS MATERIALIZED (
       |        SELECT doc_id, b.b AS b,
       |               sum(CASE WHEN (u // ($pw)[b.b + 1]) % 2 = 1 THEN 1 ELSE -1 END) AS c
       |        FROM thu, unnest(range(0, 64)) b(b)
       |        GROUP BY doc_id, b.b),
       |      sigs AS MATERIALIZED (
       |        SELECT doc_id, ${signed(s"sum(CASE WHEN c > 0 THEN ($pw)[b + 1] ELSE 0::hugeint END)")} AS sig
       |        FROM bits GROUP BY doc_id
       |        UNION ALL
       |        -- zero-token docs produce no xin rows, but SimHash64Expr
       |        -- assigns an empty token array sig = 0 — keep them so two
       |        -- blank docs pair at hamming 0 in both engines
       |        SELECT doc_id, 0::bigint AS sig FROM toks WHERE len(toks) = 0)
       |      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |             cast(bit_count(xor(a.sig, b.sig)) as int) AS hamming
       |      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |      WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |      ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for pipeline_dsir_weights: per-token xxh64 (same `xin`/`x_out`
   *  machinery as the simhash oracle) → bucket = unsigned hash mod 64
   *  (= Spark's `pmod(h, 64)`, identical low bits under two's complement)
   *  → per-(doc, bucket) counts → +1-smoothed target/raw basis-point
   *  ratios → count-weighted per-doc sums rolled up per source. All
   *  integer arithmetic, so the comparison is hash-exact. */
  /** Oracle for text_classifier_score: per-token string xxh64 → bucket
   *  (unsigned mod 4096 — a power of two, so it equals Spark's signed
   *  `pmod`), per-DISTINCT-bucket long xxh64 → weight
   *  `(h mod 2048) − 1024` (again power-of-two), per-doc weight sums
   *  rolled up per source with a `score > 0` keep count. The Spark side
   *  computes the weight inline per occurrence; hashing only the
   *  distinct buckets here is the same function evaluated once per
   *  input, so the joined result is identical. */
  lazy val classifierSql: String = {
    s"""
       |      WITH $toksCte,
       |      xin AS MATERIALIZED (
       |        SELECT doc_id*1000000 + u.i AS sid, toks[u.i] AS s
       |        FROM toks, unnest(range(1, len(toks)+1)) u(i)),
       |      ${xxhStringCtes("x", "xin")},
       |      tb AS MATERIALIZED (
       |        SELECT sid // 1000000 AS doc_id, (${unsigned("h")}) % 4096 AS b FROM x_out),
       |      wsrc AS MATERIALIZED (
       |        SELECT b, b::hugeint AS u, 42::hugeint AS sd FROM (SELECT DISTINCT b FROM tb)),
       |      ${hashLongCtes("w", "wsrc", Seq("b"))},
       |      wt AS MATERIALIZED (
       |        SELECT b, (hu % 2048)::bigint - 1024 AS w FROM w_out),
       |      pd AS MATERIALIZED (
       |        SELECT t.doc_id, sum(w) AS score FROM tb t JOIN wt USING (b) GROUP BY 1)
       |      SELECT d.source, count(*) AS n_docs,
       |             cast(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) as bigint) AS n_keep,
       |             cast(sum(score) as bigint) AS sum_score
       |      FROM pd JOIN documents d USING (doc_id)
       |      GROUP BY 1 ORDER BY source""".stripMargin
  }

  lazy val dsirSql: String = {
    val target = "('src0', 'src1', 'src2', 'src3')"
    s"""
       |      WITH $toksCte,
       |      xin AS MATERIALIZED (
       |        SELECT doc_id*1000000 + u.i AS sid, toks[u.i] AS s
       |        FROM toks, unnest(range(1, len(toks)+1)) u(i)),
       |      ${xxhStringCtes("x", "xin")},
       |      tb AS MATERIALIZED (
       |        SELECT sid // 1000000 AS doc_id, (${unsigned("h")}) % 64 AS b FROM x_out),
       |      db AS MATERIALIZED (
       |        SELECT t.doc_id, d.source, t.b, count(*) AS c
       |        FROM tb t JOIN documents d ON d.doc_id = t.doc_id
       |        GROUP BY 1, 2, 3),
       |      bc AS MATERIALIZED (
       |        SELECT b,
       |               sum(CASE WHEN source IN $target THEN c ELSE 0 END) AS t_b,
       |               sum(CASE WHEN source IN $target THEN 0 ELSE c END) AS r_b
       |        FROM db GROUP BY b),
       |      lr AS MATERIALIZED (
       |        SELECT b, (t_b + 1) * 10000 // (r_b + 1) AS lr_bp FROM bc),
       |      pd AS MATERIALIZED (
       |        SELECT doc_id, source, sum(c * lr_bp) AS w
       |        FROM db JOIN lr USING (b) GROUP BY 1, 2)
       |      SELECT source, count(*) AS n_docs, cast(sum(w) as bigint) AS sum_w
       |      FROM pd GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** Oracle for dedup_minhash_lsh: shingle-string xxh64 → 32 seed-mixed
   *  minima (seeds = XXH64.hashInt(i, 42), embedded as literals) → band
   *  keys as the 4-step hashLong fold Spark's xxhash64(array) performs →
   *  hot-bucket exclusion → candidate pairs → agreement-fraction estimate. */
  lazy val minhashSql: String = {
    val k = 32; val bands = 8; val rows = k / bands
    val seeds = (0 until k).map { i =>
      val h = XXH64.hashInt(i, 42L)
      val u = if (h < 0) BigInt(h) + (BigInt(1) << 64) else BigInt(h)
      s"($i, $u::hugeint)"
    }.mkString(",")
    val bandChain = new StringBuilder
    var prev = "bseed"
    for (j <- 0 until rows) {
      bandChain.append(
        s"""bs${j}_src AS MATERIALIZED (
           |        SELECT b.doc_id, b.band, ${unsigned("g.m")} AS u, b.acc AS sd
           |        FROM $prev b JOIN sig g ON g.doc_id = b.doc_id AND g.i = b.band*$rows + $j),
           |      ${hashLongCtes(s"bs$j", s"bs${j}_src", Seq("doc_id", "band"))},
           |      bacc$j AS MATERIALIZED (
           |        SELECT doc_id, band, hu AS acc FROM bs${j}_out),
           |      """.stripMargin)
      prev = s"bacc$j"
    }
    s"""
       |      WITH $toksCte,
       |      toks3 AS MATERIALIZED (SELECT doc_id, toks FROM toks WHERE len(toks) >= 3),
       |      xin AS MATERIALIZED (
       |        SELECT doc_id*1000000 + u.i AS sid,
       |               toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2] AS s
       |        FROM toks3, unnest(range(1, len(toks)-1)) u(i)),
       |      ${xxhStringCtes("x", "xin")},
       |      hs AS MATERIALIZED (
       |        SELECT sid // 1000000 AS doc_id, ${unsigned("h")} AS u FROM x_out),
       |      seeds(i, sd) AS (VALUES $seeds),
       |      mh_src AS MATERIALIZED (
       |        SELECT hs.doc_id, seeds.i, hs.u, seeds.sd FROM hs, seeds),
       |      ${hashLongCtes("mh", "mh_src", Seq("doc_id", "i"))},
       |      sig AS MATERIALIZED (
       |        SELECT doc_id, i, min(${signed("hu")}) AS m FROM mh_out GROUP BY doc_id, i),
       |      bseed AS MATERIALIZED (
       |        SELECT DISTINCT doc_id, b.b AS band, 42::hugeint AS acc
       |        FROM sig, unnest(range(0, $bands)) b(b)),
       |      ${bandChain}bkeys AS MATERIALIZED (
       |        SELECT doc_id, band, ${signed("acc")} AS bkey FROM $prev),
       |      hot AS MATERIALIZED (
       |        SELECT band, bkey FROM bkeys GROUP BY band, bkey HAVING count(*) > 1000),
       |      kept AS MATERIALIZED (
       |        SELECT k.doc_id, k.band, k.bkey FROM bkeys k ANTI JOIN hot USING (band, bkey)),
       |      pairs AS MATERIALIZED (
       |        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |        FROM kept a JOIN kept b USING (band, bkey)
       |        WHERE a.doc_id < b.doc_id),
       |      est AS MATERIALIZED (
       |        SELECT p.id_a, p.id_b,
       |               (sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)::double / $k::double) AS est_jaccard
       |        FROM pairs p
       |        JOIN sig sa ON sa.doc_id = p.id_a
       |        JOIN sig sb ON sb.doc_id = p.id_b AND sb.i = sa.i
       |        GROUP BY p.id_a, p.id_b)
       |      SELECT id_a, id_b, est_jaccard FROM est
       |      WHERE est_jaccard >= 0.5
       |      ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for dedup_lsh_eval: the full minhash chain re-run up to its
   *  thresholded candidate set, joined against the exact n-gram-Jaccard
   *  ground truth (the dedup_ngram_jaccard formulas verbatim: `inter`
   *  over cap-filtered cold shingles, sizes over ALL shingles), then
   *  precision/recall in integer basis points. Extracts the shared CTE
   *  prefix from [[minhashSql]] so the two stay in lockstep. */
  lazy val dedupEvalSql: String = {
    val prefix = minhashSql.substring(0, minhashSql.lastIndexOf("SELECT id_a"))
      .trim.stripSuffix(",").trim
    s"""
       |      $prefix,
       |      cand AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
       |      sh2 AS (
       |        SELECT DISTINCT doc_id, toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2] AS sh
       |        FROM toks3, unnest(range(1, len(toks) - 1)) u(i)),
       |      cnt2 AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY 1),
       |      hot2 AS (SELECT sh FROM sh2 GROUP BY sh HAVING count(*) > 100),
       |      cold2 AS (SELECT * FROM sh2 ANTI JOIN hot2 USING (sh)),
       |      ip AS (
       |        SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
       |        FROM cold2 x JOIN cold2 y USING (sh)
       |        WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
       |      truth AS (
       |        SELECT id_a, id_b FROM ip
       |        JOIN cnt2 a ON a.doc_id = ip.id_a
       |        JOIN cnt2 b ON b.doc_id = ip.id_b
       |        WHERE cast(inter as double) / cast(a.n_sh + b.n_sh - inter as double) >= 0.5),
       |      agg AS (
       |        SELECT (SELECT count(*) FROM cand) AS n_candidates,
       |               (SELECT count(*) FROM truth) AS n_truth,
       |               (SELECT count(*) FROM cand SEMI JOIN truth USING (id_a, id_b)) AS n_hits)
       |      SELECT cast(n_candidates as bigint) AS n_candidates,
       |             cast(n_truth as bigint) AS n_truth,
       |             cast(n_hits as bigint) AS n_hits,
       |             cast(n_hits * 10000 // greatest(n_candidates, 1) as bigint) AS precision_bp,
       |             cast(n_hits * 10000 // greatest(n_truth, 1) as bigint) AS recall_bp
       |      FROM agg""".stripMargin
  }
}
