package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe global ranking — the distributed form of
 * `row_number() OVER (ORDER BY …)` / `ntile(n) OVER (ORDER BY …)`.
 *
 * A no-partitionBy window collapses the whole table into ONE task (Spark
 * even warns). This operator instead:
 *   1. range-partitions by the sort key (parallel sample-based split, the
 *      same machinery as a distributed ORDER BY),
 *   2. ranks locally inside each range partition (a window partitioned by
 *      the partition id — every task ranks only its own slice),
 *   3. adds per-partition offsets from a tiny count-per-partition
 *      aggregate (O(#partitions) rows on the driver, like AQE stats).
 *
 * The result is the exact global row number for any total order; ties must
 * be broken by the caller's sort key (include a unique column).
 */
object ScalableRank {

  /** Adds `outCol` = exact global 1-based row number under `sortCols`
   *  (which must form a total order). Returns (df, totalRows) — the total
   *  comes free from the offset pass and callers (ntile) need it. */
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column], outCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist() // scanned twice: once for counts, once for the local rank
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
    val total = counts.map(_._2).sum
    val offsetDf = broadcast(
      spark.createDataFrame(counts.zip(offsets.init.map(_._2)).map { case ((pid, _), off) => (pid, off) })
        .toDF("__pid", "__offset"))
    val local = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val ranked = ranged
      .withColumn("__lrn", row_number().over(local))
      .join(offsetDf, "__pid")
      .withColumn(outCol, (col("__offset") + col("__lrn")).cast("bigint"))
      .drop("__pid", "__lrn", "__offset")
    (ranked, total)
  }

  /** Adds `outCol` = exact `ntile(n)` bucket (1-based BIGINT) under
   *  `sortCols`, reproducing the SQL-standard distribution (the first
   *  `total % n` buckets get one extra row) without a global window. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], n: Int, outCol: String): DataFrame = {
    val (ranked, total) = withGlobalRowNumber(df, sortCols, "__grn")
    val small = total / n
    val nBig = total % n
    val big = small + 1
    // integer division via `div` — Column./ is fractional
    val bucket =
      when(col("__grn") <= nBig * big, expr(s"(__grn - 1) div $big"))
        .otherwise(lit(nBig) + expr(s"(__grn - 1 - ${nBig * big}) div ${math.max(small, 1L)}"))
    ranked.withColumn(outCol, (bucket + 1).cast("bigint")).drop("__grn")
  }
}
