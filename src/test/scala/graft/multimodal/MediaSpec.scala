package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import Media._

  test("StubCodec is deterministic and shape-plausible") {
    val bytes = "hello world, this is a fake image payload".getBytes("UTF-8")
    val a = StubCodec.decode("jpeg", bytes)
    val b = StubCodec.decode("jpeg", bytes)
    assert(a == b)
    assert(a._1 >= 64 && a._1 < 64 + 1024 && a._2 >= 64 && a._2 < 64 + 1024)
    assert(a._3 > 0.0 && a._3 <= 1.0)
    assert(StubCodec.decode("jpeg", "different".getBytes) != a)
  }

  test("extractFeatures runs the codec partition-streamed over real payloads") {
    import spark.implicits._
    val media = mediaTable(spark, "/root/testdata/sf0.001")
      .select("doc_id", "media", "format", "n_bytes").as[MediaRecord]
    val feats = extractFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(f => f.width >= 64 && f.mean_luma > 0))
    // features keyed correctly: same doc twice → same features
    val f0 = feats.find(_.doc_id == 0).get
    val again = extractFeatures(media.filter(_.doc_id == 0)).collect().head
    assert(f0 == again)
  }

  test("sampleFrames chunks the payload with the stride") {
    import spark.implicits._
    val one = Seq(MediaRecord(1L, Array.fill[Byte](100)(7), "mp4", 100L)).toDS()
    val frames = sampleFrames(one, frameSize = 32, stride = 2).collect()
    // 100/32 = 3 frames, stride 2 keeps idx 0 and 2
    assert(frames.map(_.getInt(1)).toSeq.sorted == Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 32))
  }
}
