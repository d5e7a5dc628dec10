package graft.operators

import org.apache.spark.sql.DataFrame

/** Operator-scoped caching (the `Tsdb.sync` try/finally discipline, made
  * reusable): intermediates an operator references from several branches
  * of its plan are cached for EXACTLY the duration of the operator call.
  *
  * `withCached` pins the intermediates, eagerly materializes the
  * operator's (small) result with `localCheckpoint` — cutting the
  * returned frame's lineage so it no longer references the cached
  * plans — and unpersists the intermediates before returning. Without
  * the scope, every invocation registers a fresh cache entry that lives
  * for the session: across a long-lived session (or a 29-query bench)
  * the storage pool fills, eviction thrashes, and whichever query runs
  * next pays a 10–30× recompute penalty — a leak, not a cache.
  *
  * The checkpointed result is a plain RDD-backed frame (freed by the
  * ContextCleaner once unreferenced); callers order/filter it as usual.
  */
private[graft] object Caching {

  /** Plan-audit escape hatch: when true, `withCached` returns the raw
    * composed plan (no cache, no checkpoint) so `.explain` can show the
    * operator's interior — the checkpointed form explains as a single
    * `Scan ExistingRDD`. Never set in production paths.
    */
  @volatile var passthrough: Boolean = false

  def withCached(intermediates: DataFrame*)(body: => DataFrame): DataFrame = {
    if (passthrough) return body
    intermediates.foreach(_.cache())
    try body.localCheckpoint(eager = true)
    finally intermediates.foreach(_.unpersist(blocking = false))
  }
}
