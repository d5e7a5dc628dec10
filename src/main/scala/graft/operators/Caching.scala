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

  /** Optional STABLE checkpoint directory for operator result
    * materializations — the `components()` reliable-checkpoint pattern
    * lifted to the caching layer. Default (None): results materialize
    * via `localCheckpoint`, whose blocks live on executors — fast, and
    * fine on local[32] or for short jobs, but an executor loss makes
    * the materialized frame unrecoverable mid-query. A long-running
    * cluster job sets this (directly, or scoped via [[withReliable]])
    * to an HDFS/object-store dir and every [[withCached]] result — and
    * `Banding.selfPairs`' heavy-branch candidate materialization —
    * becomes an eager RELIABLE checkpoint that survives executor loss.
    *
    * The caller owns the directory's lifecycle: Spark only reclaims
    * reliable checkpoint files automatically when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is on, so
    * delete the dir when the job's results have been consumed (same
    * contract as `components(checkpointDir = ...)`).
    */
  @volatile var reliableDir: Option[String] = None

  /** Run `body` with [[reliableDir]] set, restoring the previous value
    * after — the scoped form a job runner should prefer.
    */
  def withReliable[T](dir: String)(body: => T): T = {
    val prev = reliableDir
    reliableDir = Some(dir)
    try body finally reliableDir = prev
  }

  /** Eagerly materialize an operator result, cutting its lineage:
    * executor-local blocks by default, a reliable checkpoint under
    * [[reliableDir]] when set.
    */
  private[graft] def materialize(df: DataFrame): DataFrame =
    reliableDir match {
      case None => df.localCheckpoint(eager = true)
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val prior = sc.getCheckpointDir
        sc.setCheckpointDir(dir)
        try df.checkpoint(eager = true)
        finally prior.foreach(sc.setCheckpointDir)
    }

  def withCached(intermediates: DataFrame*)(body: => DataFrame): DataFrame = {
    if (passthrough) return body
    intermediates.foreach(_.cache())
    try materialize(body)
    finally intermediates.foreach(_.unpersist(blocking = false))
  }
}
