package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the kNN-graph pair-work census at a given corpus,
  * WITHOUT running the pair join — group each join side by the join key
  * and multiply the per-key counts. Separates "the candidate replication
  * band inflated the pair count" from "the per-pair cost is the
  * bottleneck" at scales the oracle sweep never reaches (the sf100 build
  * ran 53+ min CPU-bound where r8's pre-multiprobe form took 210 s; the
  * oracle scales measured replication at only 4.6-5.6%).
  *
  * Prints: n, candidate-side rows (replication factor), exact pair count,
  * the top-10 heaviest join keys, and the per-(cell,sub) population
  * skew — everything the throughput fix needs to be designed against. */
object KnnCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (salted, candidates) = graft.similarity.Ann.knnIndexSides(spark, sfDir)
    val key = Seq("cell", "sub", "salt")
    val q = salted.groupBy(key.map(col): _*).agg(count(lit(1)).as("nq"))
    val c = candidates.groupBy(key.map(col): _*).agg(count(lit(1)).as("nc"))
    val keyed = q.join(c, key).select(col("cell"), col("sub"), col("salt"),
      col("nq"), col("nc"), (col("nq") * col("nc")).as("pairs"))
      .persist()
    val tot = keyed.agg(sum("pairs").as("pairs"), sum("nq").as("nq"),
      count(lit(1)).as("keys"), max("pairs").as("max_key_pairs")).head()
    val nCand = candidates.count()
    val n = salted.count()
    println(f"[census] n=$n%d candidate_rows=$nCand%d repl_factor=${nCand.toDouble / n}%.3f")
    println(f"[census] join_keys=${tot.getLong(2)}%d exact_pairs=${tot.getLong(0)}%d " +
      f"max_key_pairs=${tot.getLong(3)}%d n_sq_over_k=${n.toDouble * n / math.max(16, math.ceil(math.sqrt(n.toDouble)).toLong)}%.3e")
    println("[census] top-10 heaviest join keys:")
    keyed.orderBy(col("pairs").desc).limit(10).collect()
      .foreach(r => println(s"[census]   cell=${r.get(0)} sub=${r.get(1)} salt=${r.get(2)} nq=${r.get(3)} nc=${r.get(4)} pairs=${r.get(5)}"))
    spark.stop()
  }
}
