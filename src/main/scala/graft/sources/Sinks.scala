package graft.sources

import graft.Tables
import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sink-side layout operators: partitioned parquet writes and the
 * partition-pruned reads they enable — at 100 TB, partitioning by a
 * low-cardinality filter column (date, language, source) is what turns a
 * full-corpus scan into a directory listing.
 */
object Sinks {

  /** Paths already written by THIS process — the builder is invoked for
   *  plan dumps too, which must not re-run the heavy write. */
  private val written = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write documents partitioned by `lang`, read back with a lang filter —
   *  the read plan prunes to one partition directory (PartitionFilters in
   *  `graft.Plans sink_partition_pruning`), so the count touches only the
   *  matching files. Output oracled against the unpartitioned table.
   *  The output path embeds the Spark application id: concurrent processes
   *  (driver Verify + a developer Bench) must not race each other's
   *  overwrite against a mid-flight read. */
  def partitionPruning(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_sink_" +
      s"${spark.sparkContext.applicationId}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (written.add(out)) {
      Tables.documents(spark, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(out)
    }
    spark.read.parquet(out)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_en_docs"), sum(col("n_chars")).cast("bigint").as("total_chars"))
      .orderBy("source")
  }

  val defs: Vector[QueryDef] = Vector(
    QueryDef("sink_partition_pruning", partitionPruning, Some("""
      SELECT source, count(*) AS n_en_docs, cast(sum(n_chars) as bigint) AS total_chars
      FROM documents WHERE lang = 'en'
      GROUP BY source ORDER BY source"""))
  )
}
