package graft.multimodal

import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample
 * operators.
 *
 * The container has no media codecs, so the decode step is a clearly-marked
 * DETERMINISTIC STUB (`StubCodec`) — the Spark-side plumbing is real and
 * tested: schema, binary payloads, partition-streaming batch shape
 * (`mapPartitions` over a typed Dataset — the Scala analogue of
 * `mapInPandas` batching: one iterator per partition, constant memory),
 * and explode-style frame sampling. Swapping `StubCodec` for a real codec
 * changes no plan shape.
 *
 * Payloads are synthesized deterministically from the documents table
 * (UTF-8 bytes of `text`) since the testdata ships no binary column.
 */
object Media {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String, n_bytes: Long)

  /** Decoded features for one media item. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, mean_luma: Double, phash: Long)

  /** The stub codec: derives plausible, deterministic features from raw
   *  bytes. A real implementation would decode pixels/samples here —
   *  signature and batching stay identical. */
  object StubCodec {
    def decode(format: String, bytes: Array[Byte]): (Int, Int, Double, Long) = {
      var h = 1125899906842597L
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        h = h ^ ((h << 13) + (bytes(i) & 0xFF)); sum += (bytes(i) & 0xFF); i += 1
      }
      val width = 64 + math.floorMod(h, 1024).toInt
      val height = 64 + math.floorMod(h >> 10, 1024).toInt
      val meanLuma = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0
      (width, height, meanLuma, h)
    }
  }

  /** Synthesize the media table from documents: payload = UTF-8 bytes of
   *  text, format bucketed from a content hash (stable across engines). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(substring(md5(col("text")), 1, 1) <= "3", "jpeg")
        .when(substring(md5(col("text")), 1, 1) <= "7", "png")
        .when(substring(md5(col("text")), 1, 1) <= "b", "wav")
        .otherwise("mp4").as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** Decode + feature-extract: typed `mapPartitions` — each task streams
   *  its partition through the codec, no collect, no per-row UDF boxing. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, luma, phash) = StubCodec.decode(r.format, r.media)
        MediaFeatures(r.doc_id, r.format, r.n_bytes, w, h, luma, phash)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
   *  chunk becomes one frame row (doc_id, frame_idx, frame bytes) — the
   *  explode shape a real video pipeline uses, with deterministic fakes. */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = r.media.length / frameSize
      (0 until nFrames by stride).map { i =>
        (r.doc_id, i, r.media.slice(i * frameSize, (i + 1) * frameSize))
      }
    }.toDF("doc_id", "frame_idx", "frame")
  }

  // ---- harness queries -----------------------------------------------------

  /** Metadata extraction — pure column expressions, exact oracle. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select("doc_id", "format", "n_bytes").orderBy("doc_id")

  /** Full decode pipeline (stub codec → features), aggregated per format. */
  def mediaFeatureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
      .select("doc_id", "media", "format", "n_bytes").as[MediaRecord]
    extractFeatures(media)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h"),
        round(avg(col("mean_luma")), 4).as("avg_luma"))
      .orderBy("format")
  }

  /** Frame sampling stats: frames per doc for the "videos". */
  def frameSampleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vids = mediaTable(spark, dir)
      .filter(col("format") === "mp4")
      .select("doc_id", "media", "format", "n_bytes").as[MediaRecord]
    sampleFrames(vids, frameSize = 32, stride = 2)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), max(octet_length(col("frame"))).as("frame_bytes"))
      .orderBy("doc_id")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("media_meta", mediaMeta, Some("""
      SELECT doc_id,
             CASE WHEN substr(md5(text),1,1) <= '3' THEN 'jpeg'
                  WHEN substr(md5(text),1,1) <= '7' THEN 'png'
                  WHEN substr(md5(text),1,1) <= 'b' THEN 'wav'
                  ELSE 'mp4' END AS format,
             octet_length(encode(text)) AS n_bytes
      FROM documents ORDER BY doc_id""")),
    QueryDef("media_feature_stats", mediaFeatureStats, None),
    QueryDef("media_frame_samples", frameSampleStats, None)
  )
}
