package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming witness aggregation must converge to the batch answer
 *  after a bounded replay — the semilattice merge makes streaming state
 *  and batch fold interchangeable. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming schema inference equals the batch result after replay") {
    val streamed = EventStreams.streamSchemaEvolution(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = graft.operators.SchemerQueries.schemaPropsByType(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.values.forall(_.startsWith("STRUCT<")))
  }
}
