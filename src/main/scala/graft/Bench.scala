package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    // shuffle partitions default to the thread count (right at sf<=1);
    // big single-JVM corpora want MORE partitions than threads so each
    // task's hash/sort state stays small — the sf10 suite runs at 128
    // (with SPARK_GRAFT_SNAPSHOT_LEVEL=DISK_ONLY), where 32 OOMed a 16g
    // heap on the shingle pair join
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // persisted-RDD blocks (the per-corpus DatasetBridge snapshots) are
      // NOT compressed by default — shuffle and spill are. At sf100 the
      // DISK_ONLY artifact set is a first-order term in the scratch
      // budget; lz4 here is the same codec the shuffles already pay
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
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
    // failed queries are still timed (the driver wants a total) but NEVER
    // silently: a failure at a new scale factor must show up as data, not
    // as a plausible-looking duration
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Family-boundary artifact release for bounded-scratch hosts
    // (SPARK_GRAFT_RELEASE_PER_FAMILY=1): a memoized DatasetBridge
    // snapshot keeps its LINEAGE, which pins the entire build shuffle
    // chain on disk for the memo's lifetime — across 248 queries at sf100
    // the pinned dead spill grew past this box's ~94 GB volume twice
    // (ENOSPC mid-dedup both runs). Releasing at query-family boundaries
    // bounds resident scratch to one family's artifact set while keeping
    // the within-family sharing that the cost model documents; on a real
    // cluster with TB-scale executor scratch the flag stays off.
    val releasePerFamily = sys.env.get("SPARK_GRAFT_RELEASE_PER_FAMILY").contains("1")
    // Disk-pressure release (SPARK_GRAFT_MIN_FREE_GB=n): even within one
    // family, the lineage-pinned artifact set plus a single heavyweight
    // query's ~25 GB transient spill can overrun a small scratch volume
    // (attempt 3 still ENOSPC'd mid-dedup with family releases alone).
    // When free space under the shuffle dir falls below the floor, drop
    // every memo before the next query — the query rebuilds exactly the
    // artifacts it needs with the whole volume available. Spill-aware
    // scheduling, not a cost-model change; off unless set.
    val minFreeBytes = sys.env.get("SPARK_GRAFT_MIN_FREE_GB").map(_.toLong * (1L << 30))
    val tmpStore = java.nio.file.Files.getFileStore(
      java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp")))
    var prevFamily = ""
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val family = name.takeWhile(_ != '_')
      val familyChanged = family != prevFamily && prevFamily.nonEmpty
      val diskLow = minFreeBytes.exists(_ > tmpStore.getUsableSpace)
      if ((releasePerFamily && familyChanged) || diskLow) {
        CorpusCaches.releaseAll()
        System.gc()
      }
      prevFamily = family
      // live attribution for capacity campaigns: the suite logs nothing
      // per-query otherwise, so an ENOSPC burst in a 4-hour stderr stream
      // can only be tied to a query by this line's timestamp
      System.err.println(s"BENCH RUNNING: $name at ${java.time.Instant.now()}")
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case t: Throwable =>
            errors(name) = (t.getClass.getSimpleName + ": " + String.valueOf(t.getMessage))
              .replaceAll("[\"\\\\\\s]+", " ").take(160)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // drop frames persisted inside the query so caches don't accumulate
        // across the loop and GC-skew later measurements
        spark.catalog.clearCache()
        // shuffle files are reaped by ContextCleaner only when their
        // dependencies are GC'd — a 48g heap under a big corpus can run
        // hundreds of queries between collections, so dead spill from
        // completed queries ACCUMULATES until the disk fills (measured:
        // the first full sf100 attempt hit ENOSPC in the dedup family
        // with 45 GB of dead shuffle on disk). Nudge a collection after
        // any query expensive enough to have spilled; sub-2s queries
        // (the whole sf0.1 driver gate) never pay the ~100 ms cost.
        if (sec > 2.0) System.gc()
        sec
      }
      // Steady state = min of two runs, but only when the first run is slow
      // enough that per-query Janino codegen compilation (cached JVM-wide on
      // the repeat) or host-load jitter could be what we measured. r2/r3
      // driver benches showed sub-second queries reading 3-10x their profiled
      // steady state for exactly those reasons (BASELINE.md "Round-3
      // profile"); a repeat run answers from the codegen cache and measures
      // the actual plan.
      val t1 = once()
      val sec = if (t1 > 0.5) math.min(t1, once()) else t1
      name -> sec
    }
    val total = results.map(_._2).sum
    val line = BenchFormat.line(total, results, sfDir, errors.keys.toSeq)
    // full-resolution copy where a driver can read a file instead of
    // regexing an sbt-banner-wrapped stdout tail
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (BenchFormat.fullLine(total, results, sfDir, errors.toSeq) + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    errors.foreach { case (q, e) => System.err.println(s"BENCH QUERY FAILED: $q -> $e") }
    println(line)
    spark.stop()
  }
}
