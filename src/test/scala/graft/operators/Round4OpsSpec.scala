package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 operators beyond the oracle hash: chunk
 *  geometry/bytes, filtered-ANN predicate safety, TF-IDF scoring, and the
 *  stream-stream join vs its batch twin. */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pipeline_chunks: geometry and bytes match a driver-side recompute") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_ => text.trim.nonEmpty)
      val n = toks.length
      if (n == 0) Nil
      else {
        val w = 32; val stride = 24
        val nchunks = 1 + (math.max(0, n - w) + stride - 1) / stride
        (0 until nchunks).map { i =>
          val chunk = toks.slice(i * stride, i * stride + w)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, i.toLong, chunk.length.toLong, md5)
        }
      }
    }.toSet
    val got = CurationPipeline.chunkDocs(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("pipeline_chunks: consecutive chunks overlap by exactly W - stride tokens") {
    // full chunks start every `stride` tokens and are W wide, so chunk i and
    // i+1 share W-stride=8 tokens — the property that guarantees no token
    // sequence of length <= stride is ever split across a chunk boundary
    val chunks = CurationPipeline.chunkDocs(spark, dir)
    val full = chunks.filter(col("n_tokens") === 32)
    assert(full.count() > 0, "corpus should produce full-width chunks")
    // geometry invariant: n_tokens never exceeds W and is positive
    assert(chunks.filter(col("n_tokens") > 32 || col("n_tokens") <= 0).count() == 0)
  }

  test("ann_filtered_topk: every neighbor satisfies the metadata predicate") {
    import spark.implicits._
    val labels = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val out = graft.similarity.Ann.filteredTopK(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, n) =>
      assert(labels(n) == labels(q), s"neighbor $n label ${labels(n)} != query $q label ${labels(q)}")
      assert(n != q, "self must be excluded")
    }
  }

  test("ann_filtered_topk: equals brute force restricted to the label subset") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val expected = emb.filter(_._1 < 8).flatMap { case (q, qe, ql) =>
      emb.filter(e => e._3 == ql && e._1 != q)
        .map(e => (q, e._1, cos(qe, e._2)))
        .sortBy { case (_, id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((qid, nid, _), i) => (qid, nid, (i + 1).toLong) }
    }.toSet
    val got = graft.similarity.Ann.filteredTopK(spark, dir)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("text_tfidf_search: scores decompose as sum of tf * integer idf") {
    import spark.implicits._
    val terms = Set("spark", "join", "window", "hash")
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").filter(terms).map(tok => (id, tok))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val scores = tf.groupBy(_._1._1).map { case (id, m) =>
      id -> m.map { case ((_, tok), c) => c * ((n * 1000000L) / df(tok)) }.sum
    }
    val expectedTop = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10).toSet
    val got = TrainingOps.tfidfSearch(spark, dir)
      .select("doc_id", "score").as[(Long, Long)].collect().toSet
    assert(got == expectedTop)
  }

  test("q44_funnel: stage counts are monotone non-increasing") {
    val r = SessionAndSkew.q44Funnel(spark, dir).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0, "corpus has view events")
  }

  test("q45_snapshot_diff: classifications partition the modified slices") {
    import spark.implicits._
    val m = SessionAndSkew.q45SnapshotDiff(spark, dir)
      .select("change", "n").as[(String, Long)].collect().toMap
    // slice 0 exists only in the new snapshot, slice 3 only in the old,
    // slice 1 changed status — all three classes must be present
    assert(Set("added", "removed", "changed").subsetOf(m.keySet), m.toString)
    assert(m.values.forall(_ > 0))
  }

  test("stream_join equals the batch interval join") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), expr("ts div 1000").as("us"), col("user_id"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("us").as("v_us"), col("user_id").as("v_user"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("us").as("p_us"), col("user_id"))
    val batch = p.join(v,
        col("user_id") === col("v_user") &&
        col("v_us") <= col("p_us") && col("v_us") >= col("p_us") - 1800000000L)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("p_us") - col("v_us")).as("lag_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = graft.streaming.EventStreams.streamJoin(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "sf0.001 should attribute at least one purchase")
  }
}
