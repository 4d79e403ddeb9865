package graft
import org.apache.spark.sql.SparkSession
object InferBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(sys.env.getOrElse("INFER_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions","32").config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("INFER_SPLIT", "134217728")).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val path = args(0)
    val t0 = System.nanoTime()
    val w = graft.schemer.InferSchema.inferPath(spark, path)
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.textFile(path).count()
    println(f"INFER rows=$rows sec=$sec%.2f rows_per_sec=${rows/sec}%.0f")
    println(graft.schemer.HiveRender.definition(w))
    spark.stop()
  }
}
