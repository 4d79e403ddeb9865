package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Testdata table loaders (see TESTDATA.md). One parquet per table under the
 * scale-factor directory the driver passes in.
 *
 * `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark rejects by
 * default — `spark.sql.legacy.parquet.nanosAsLong` reads it as a raw
 * nanosecond Long. The DuckDB oracle sees the same column truncated to
 * microseconds, so oracled queries must bucket via `ts div 1000`
 * (micros) — never `ts / 1000` (Long nanos exceed 2^53, double math would
 * corrupt them).
 */
object Tables {

  /** One query-definition row: name, builder, optional DuckDB oracle SQL. */
  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** DuckDB oracle fragment: the quality-feature columns, for a CTE that
   *  has `text` and `ntok` in scope. Twin of the integer features inside
   *  [[graft.functions.TextFunctions.qualityBp]]. */
  val QbpParts: String =
    """greatest(length(text), 1) AS len1,
      |               CASE WHEN ntok = 0 THEN 0
      |                    ELSE (length(replace(trim(text), ' ', '')) * 100) // ntok END AS m,
      |               length(text) - length(translate(text, '.,;:!?', '')) AS punct,
      |               length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS alpha""".stripMargin

  /** DuckDB oracle fragment: the exact-integer basis-point quality score
   *  over `ntok`/`len1`/`m`/`punct`/`alpha` — `(2N + D) // 2D`, the same
   *  half-up rational rounding as `qualityBp`. Yields BIGINT. */
  val QbpExpr: String =
    """(2*(4000*least(ntok, 64)*len1
      |             + ((CASE WHEN m BETWEEN 300 AND 1000 THEN 2000 ELSE 800 END)
      |                + (CASE WHEN punct*10 <= len1 THEN 2000 ELSE 600 END))*64*len1
      |             + 2000*alpha*64) + 64*len1) // (128*len1)""".stripMargin

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // runtime-settable SQL conf; must be on before the events read resolves
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$table.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
