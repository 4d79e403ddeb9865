package graft

import scala.collection.concurrent.TrieMap

/** Release hook for the per-(application, corpus) artifact memos.
 *
 *  Every module that memoizes a shared per-corpus artifact (dedup shingle
 *  index, kNN edge list, LPA labels, price histograms, stream replays, …)
 *  registers its memo here at construction. A single long-lived session
 *  sweeping MANY corpora would otherwise accumulate pinned cache/disk
 *  without bound — one snapshot per (applicationId, dir) per artifact.
 *  [[releaseAll]] drops every memo and unpersists every snapshot; the
 *  memoized builders simply rebuild on next use (correctness never
 *  depends on a cache hit). The bench/driver flow never needs this — it
 *  runs one corpus per JVM — but a multi-corpus notebook session does. */
object CorpusCaches {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[TrieMap[_, _]]()

  /** Register a memo map at module init; returns it for inline use. */
  def register[K, V](m: TrieMap[K, V]): TrieMap[K, V] = { registered.add(m); m }

  /** Drop every registered memo and release every snapshot's storage. */
  def releaseAll(): Unit = {
    registered.forEach(m => m.clear())
    org.apache.spark.sql.graft.DatasetBridge.releaseAll()
  }
}
