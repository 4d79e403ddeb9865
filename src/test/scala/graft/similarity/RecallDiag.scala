package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostic: which ground-truth top-3 edges does the kNN graph
  * miss at sf0.01, and what do the query/candidate cell assignments and
  * top-2 margins look like for each miss. */
object RecallDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val truth = Ann.bruteForceTopK(spark, dir).filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = Ann.knnGraph(spark, dir).filter(col("vec_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth.filterNot(edges)
    println(s"[rdiag] missed edges: ${missed.mkString(", ")}")

    val (salted, candidates) = Ann.knnIndexSides(spark, dir)
    val q = salted.select("vec_id", "cell", "sub").distinct().collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val c = candidates.select("neighbor_id", "cell", "sub").distinct().collect()
      .groupBy(_.getLong(0)).map { case (id, rows) =>
        id -> rows.map(r => (r.getInt(1), r.getInt(2))).toSet }
    for ((qv, nv) <- missed) {
      println(s"[rdiag] query $qv at ${q(qv)}; neighbor $nv memberships ${c.getOrElse(nv, Set.empty)}")
    }
    spark.stop()
  }
}
