package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostic for the KnnSplitSpec corpus: which vector loses its
  * edges, and what does its (cell, sub) neighborhood look like. */
object KnnDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 600; val dim = 64
    val rnd = new scala.util.Random(7)
    val u = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def jitter(): Array[Float] = u.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    def randomVec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val rows = (0L until n).map { i =>
      val v = if (i >= 30 && i % 3 == 0) jitter() else randomVec()
      (i, v, 0)
    }
    val dirTmp = java.nio.file.Files.createTempDirectory("knndiag").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirTmp/embeddings.parquet")

    val edges = Ann.knnGraph(spark, dirTmp).collect()
    val have = edges.map(_.getLong(0)).toSet
    val lost = (0L until n.toLong).filterNot(have)
    println(s"[diag] lost vectors: $lost")

    val (salted, candidates) = Ann.knnIndexSides(spark, dirTmp)
    val s = salted.select("cell", "sub", "salt", "vec_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val c = candidates.select("cell", "sub", "neighbor_id").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    for (v <- lost) {
      val mine = s.filter(_._4 == v)
      println(s"[diag] vec $v query keys: ${mine.mkString(", ")}")
      for ((cell, sub, _, _) <- mine) {
        val cands = c.filter(x => x._1 == cell && x._2 == sub).map(_._3)
        println(s"[diag]   candidates in (cell=$cell, sub=$sub): n=${cands.length} ids=${cands.sorted.take(10).mkString(",")}")
        val qs = s.filter(x => x._1 == cell && x._2 == sub).map(_._4).distinct
        println(s"[diag]   queries   in (cell=$cell, sub=$sub): n=${qs.length}")
      }
      val asCand = c.filter(_._3 == v)
      println(s"[diag]   vec $v appears as candidate in: ${asCand.map(x => (x._1, x._2)).mkString(", ")}")
    }
    spark.stop()
  }
}
