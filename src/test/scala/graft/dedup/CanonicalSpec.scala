package graft.dedup

import graft.{SparkTestSession, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_canonical picks, per near-dup cluster, the member with the highest
 *  quality score (lowest doc_id on ties) — verified against a direct
 *  recomputation of every cluster member's quality. */
class CanonicalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("keep_id is the max-quality member of its own cluster") {
    val canonical = Dedup.dedupCanonical(spark, dir).collect()
    assert(canonical.nonEmpty)

    val labels = Dedup.connectedComponents(
        Dedup.ngramJaccard(spark, dir).select("id_a", "id_b"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label"))
    val quality = Tables.documents(spark, dir)
      .select(col("doc_id"), qualityBp(col("text")).as("qbp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("qbp")).toMap

    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    assert(canonical.length == byCluster.size)
    for (row <- canonical) {
      val cid = row.getAs[Long]("cluster_id")
      val members = byCluster(cid)
      assert(row.getAs[Long]("n_members") == members.length)
      val best = members.map(m => (quality(m), m)).minBy { case (q, m) => (-q, m) }
      assert(row.getAs[Long]("keep_id") == best._2, s"cluster $cid")
      assert(row.getAs[Long]("keep_qbp") == best._1, s"cluster $cid")
    }
  }

  test("length buckets partition the corpus exactly") {
    val rows = graft.operators.CurationPipeline.lengthBuckets(spark, dir).collect()
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables.documents(spark, dir).count())
    for (r <- rows) {
      val lo = r.getAs[Long]("bucket_lo")
      assert(lo == 0L || (lo & (lo - 1)) == 0L, s"bucket_lo $lo not a power of 2")
      // ceil-packing never under-counts: packed * 2048 >= sum_tokens
      assert(r.getAs[Long]("packed_seqs") * 2048L >= r.getAs[Long]("sum_tokens"))
    }
  }
}
