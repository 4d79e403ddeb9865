package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The sink-scratch lifecycle contract that sf100 attempt 12 broke twice
 *  over: (1) a FAILED write must not stay memoized as written (the
 *  poisoned-memo bug — three in-suite retries read missing/truncated
 *  output after ENOSPC), and (2) [[Sinks.cleanup]] must reap every output
 *  this process wrote AND let the next entry rebuild it from scratch
 *  (the per-query reaping that bounds the family's resident scratch to
 *  one output instead of ~16 GB at sf100). */
class SinkScratchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_spec_$name"

  test("writeOnce runs a write exactly once while it keeps succeeding") {
    val out = tmp("once_ok")
    var runs = 0
    Sinks.writeOnce(out) { runs += 1 }
    Sinks.writeOnce(out) { runs += 1 }
    assert(runs == 1)
  }

  test("a failed write heals: memo cleared, partial output removed, retry re-writes") {
    val out = tmp("once_heal")
    val boom = intercept[RuntimeException] {
      Sinks.writeOnce(out) {
        // simulate ENOSPC mid-write: partial output lands, then the throw
        Files.createDirectories(Paths.get(out))
        Files.write(Paths.get(out, "part-00000"), Array[Byte](1, 2, 3))
        throw new RuntimeException("disk full")
      }
    }
    assert(boom.getMessage == "disk full")
    // the partial directory must be gone — a retry that finds it would
    // read truncated data (attempt 12's UNABLE_TO_INFER_SCHEMA failure)
    assert(!Files.exists(Paths.get(out)))
    var retried = false
    Sinks.writeOnce(out) { retried = true }
    assert(retried, "the memo stayed poisoned after a failed write")
  }

  test("cleanup reaps the sink output and the next entry rebuilds it") {
    import org.apache.spark.sql.functions.col
    val appId = spark.sparkContext.applicationId
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_sink_" +
      s"${appId}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val n1 = Sinks.partitionPruning(spark, dir).count()
    assert(n1 > 0 && Files.exists(Paths.get(out)))
    Sinks.cleanup(spark)
    assert(!Files.exists(Paths.get(out)), "cleanup left the sink output behind")
    // the memo must be cleared with the files: next entry re-writes and
    // the read-back still answers
    val n2 = Sinks.partitionPruning(spark, dir).count()
    assert(n2 == n1 && Files.exists(Paths.get(out)))
  }

  test("cleanup drops the bucketed tables so the next entry re-registers them") {
    val n1 = Sinks.bucketedJoin(spark, dir).count()
    assert(n1 > 0)
    val before = spark.catalog.listTables().collect()
      .map(_.name).count(_.startsWith("graft_bkt_"))
    assert(before == 2, s"expected the bucketed pair registered, saw $before")
    Sinks.cleanup(spark)
    val after = spark.catalog.listTables().collect()
      .map(_.name).count(_.startsWith("graft_bkt_"))
    assert(after == 0, "cleanup left bucketed tables registered")
    assert(Sinks.bucketedJoin(spark, dir).count() == n1)
  }
}
