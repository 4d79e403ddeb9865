package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between the public `Column` API and catalyst `Expression`s.
 *
 * Spark 4 made `Column` a thin wrapper over a ColumnNode tree and moved the
 * Expression conversions behind `private[sql] ExpressionUtils`
 * (columnNodeSupport.scala). Extension libraries that define native catalyst
 * expressions (here: the witness aggregate) need exactly these two
 * conversions, so this one-file shim lives under `org.apache.spark.sql` to
 * reach them — the standard Spark-extension pattern, no internals copied.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Iterative-algorithm state management: snapshot a DataFrame's rows into
 *  a persisted `InternalRow` RDD and wrap it back as a DataFrame whose plan
 *  is just `LogicalRDD` — constant-size plans across loop rounds (no
 *  Catalyst plan nesting, no cache plan-matching fragility) WITH an
 *  explicit release handle, which `Dataset.localCheckpoint` doesn't give
 *  (its blocks linger until GC). Rows are copied before caching
 *  (`UnsafeRow` instances are reused by the scan), the RDD keeps its
 *  lineage, so an unpersisted block recomputes correctly. Lives in this
 *  shim package for `internalCreateDataFrame` (private[sql]). */
object DatasetBridge {
  final case class Snapshot(df: org.apache.spark.sql.DataFrame,
                            rdd: org.apache.spark.rdd.RDD[_]) {
    def release(): Unit = rdd.unpersist(blocking = false)
  }

  /** Storage level for snapshots — the [[graft.Tuning.snapshotLevel]] dial
   *  (set `SPARK_GRAFT_SNAPSHOT_LEVEL=DISK_ONLY` for big single-JVM runs
   *  where a dozen per-corpus artifacts competing for one heap cause OOM;
   *  disk-backed snapshots cost a local sequential re-read and zero heap.
   *  On a real cluster the equivalent dial is executor storage memory). */
  private val level: org.apache.spark.storage.StorageLevel =
    graft.Tuning.snapshotLevel

  // every live snapshot, so a long multi-corpus session can release the
  // pinned storage in bulk (graft.CorpusCaches.releaseAll) instead of
  // accumulating one persisted artifact per (application, dir) forever
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Snapshot]()

  def snapshot(df: org.apache.spark.sql.DataFrame): Snapshot = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    val s = Snapshot(spark.internalCreateDataFrame(rdd, df.schema), rdd)
    live.add(s)
    s
  }

  /** Unpersist every snapshot this application has taken. Safe at any
   *  point: the RDDs keep lineage, so a memoized DataFrame that outlives
   *  its release simply recomputes. */
  def releaseAll(): Unit = {
    var s = live.poll()
    while (s != null) { s.release(); s = live.poll() }
  }
}

/** Injects the [[graft.GraftExtensions]] function catalog into an
 *  ALREADY-RUNNING session's function registry (tests, notebooks, REPLs —
 *  anywhere `spark.sql.extensions` wasn't set at session creation). */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.catalog.foreach { case (name, info, builder) =>
      registry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
    }
  }
}
