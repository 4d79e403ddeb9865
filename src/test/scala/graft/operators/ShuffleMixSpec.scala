package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the epoch shuffle and the domain-mix plan. */
class ShuffleMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("epoch shuffle is a permutation: positions 1..n, shards balanced, reruns identical") {
    val rows = CurationPipeline.epochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq, "positions must be exactly 1..n")
    assert(rows.map(_._1).distinct.length == n, "every doc appears once")
    val shardCounts = rows.groupBy(_._3).values.map(_.length)
    assert(shardCounts.max - shardCounts.min <= 1, s"shards must be balanced, got $shardCounts")
    // order is NOT the input order (the permutation actually permutes)
    assert(rows.sortBy(_._2).map(_._1).toSeq != rows.map(_._1).sorted.toSeq)
    val again = CurationPipeline.epochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq, "the seeded permutation must be reproducible")
  }

  test("survival funnel: counts monotone per source; every tier actually bites somewhere") {
    // sf0.01: the bigger corpus has exact dups, near-dup clusters AND
    // contaminated docs, so all three tiers are exercised
    val rows = CurationPipeline.survivalFunnel(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.foreach { case (src, raw, ex, nd, cl, tok) =>
      assert(raw >= ex && ex >= nd && nd >= cl, s"$src: tiers must only shrink")
      assert(cl > 0 && tok > 0, s"$src: a whole source vanished")
    }
    // this corpus has no byte-identical texts (dedup_exact = 500 distinct
    // hashes over 500 docs), so the exact tier passes everything through —
    // pin that premise so a testdata change resurfaces here
    assert(rows.forall { case (_, raw, ex, _, _, _) => ex == raw }, "corpus premise changed")
    assert(rows.exists { case (_, _, ex, nd, _, _) => nd < ex }, "near-dup tier never dropped")
    assert(rows.exists { case (_, _, _, nd, cl, _) => cl < nd }, "decontamination never dropped")
  }

  test("domain mix: smallest source accepted in full, every rate <= 10000, after-mass equalized") {
    val rows = CurationPipeline.domainMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4), r.getLong(5)))
    val minTokens = rows.map(_._2).min
    rows.foreach { case (src, tokens, acceptBp, after) =>
      assert(acceptBp <= 10000L, s"$src accept rate over 100%")
      if (tokens == minTokens) assert(acceptBp == 10000L, s"smallest source $src must keep everything")
      // half-up rounding keeps the planned mass within one 10000th of target
      assert(math.abs(after - minTokens) <= tokens / 10000 + 1,
        s"$src planned mass $after vs target $minTokens")
    }
  }
}
