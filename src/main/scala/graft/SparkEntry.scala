package graft

import graft.Tables.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` is the full operator inventory; each entry with an `oracleSql`
 * twin is hash-checked against DuckDB on the same parquet tables, the rest
 * get rows-only checks (non-SQL-expressible ops: schema-DDL strings,
 * MinHash/SimHash signatures, ANN rankings, …). */
object SparkEntry {

  /** All query modules, concatenated. Names must stay unique. */
  private lazy val allDefs: Vector[QueryDef] =
    graft.operators.RelationalQueries.defs ++
    graft.operators.RelationalQueries2.defs ++
    graft.operators.AsofAndSketch.defs ++
    graft.operators.JoinsAndSetOps.defs ++
    graft.operators.SessionAndSkew.defs ++
    graft.operators.SweepSkyline.defs ++
    graft.operators.GraphOps.defs ++
    graft.sources.Sinks.defs ++
    graft.operators.SchemerQueries.defs ++
    graft.operators.TextQueries.defs ++
    graft.operators.CurationPipeline.defs ++
    graft.operators.TrainingOps.defs ++
    graft.dedup.Dedup.defs ++
    graft.similarity.Ann.defs ++
    graft.multimodal.Media.defs ++
    graft.streaming.EventStreams.defs

  /** Flagship: the schema-inference engine end-to-end on sf0.001 — the
   *  unified Hive DDL of the events.props JSON column as a 1-row frame. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val props = Tables.events(spark, dir).select("props").as[String]
    val witness = graft.schemer.InferSchema.inferWitness(props)
    val ddl = graft.schemer.HiveRender.table(witness, "events_props", s"$dir/events.parquet")
    Seq(ddl).toDF("ddl")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql.trim }.toMap
}
