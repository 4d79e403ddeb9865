package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // class-loading + first-parquet-footer costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    // touch EVERY table once (footers + OS page cache): otherwise the
    // first-touch I/O cost of each table lands on whichever query happens
    // to read it first — r2 profiling showed that cost is 3-8x a query's
    // steady-state time and lands name-sort-arbitrarily. Hash over ALL
    // columns, not count(): a bare count() answers from row-group
    // metadata and never reads the data pages the queries will.
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .selectExpr("count(xxhash64(struct(*)))").collect()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop frames persisted inside the query so caches don't accumulate
      // across the loop and GC-skew later measurements
      spark.catalog.clearCache()
      name -> sec
    }.toMap
    // 4-decimal rounding keeps the whole line under ~2 KB so a tail-capture
    // of stdout still contains the complete JSON object (r1/r2 both lost the
    // head of the unrounded ~2.5 KB line to truncation)
    def f(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // belt and braces: also persist the line where a driver can parse it as a
    // file instead of regexing an sbt-banner-wrapped stdout tail
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8")) catch { case _: Throwable => }
    println(line)
    spark.stop()
  }
}
