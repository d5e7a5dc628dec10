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

  /** Optional STABLE materialization directory for operator results —
    * the durability of `components()`'s reliable checkpoints, lifted
    * to the caching layer. Default (None): results materialize via
    * `localCheckpoint`, whose blocks live on executors — fast, and
    * fine on local[32] or for short jobs, but an executor loss makes
    * the materialized frame unrecoverable mid-query. A long-running
    * cluster job sets this (directly, or scoped via [[withReliable]])
    * to an HDFS/object-store dir and every [[withCached]] result — and
    * `Banding.selfPairs`' heavy-branch candidate materialization —
    * becomes an eager parquet spill under it that survives executor
    * loss.
    *
    * A parquet write + schema-pinned read-back, deliberately NOT
    * `Dataset.checkpoint`: the checkpoint API routes through the
    * SparkContext-GLOBAL checkpoint dir, and temporarily mutating that
    * from here would race `components()` (which manages the global dir
    * for its own per-round checkpoints) — a concurrent operator could
    * checkpoint into a round subdir components is about to delete.
    * The spill touches no global state; each materialization gets a
    * unique `mat-<n>` subdir from a process-local counter.
    *
    * The caller owns the directory's lifecycle: one directory per job
    * run (two JVMs sharing one dir would collide on the counter — the
    * error-mode write makes that loud, not silent), deleted when the
    * job's results have been consumed (same contract as
    * `components(checkpointDir = ...)`). NOTHING here reclaims
    * `mat-<n>` dirs mid-job — unlike the `localCheckpoint` default,
    * whose blocks the ContextCleaner frees once unreferenced — so a
    * job that invokes operators repeatedly under one dir grows storage
    * by one spill per call until the caller deletes the dir. A
    * long-running loop (e.g. a per-micro-batch probe) should SCOPE
    * each iteration: `withReliable(s"$dir/batch-$id") { ... consume
    * the result ... }` then delete the batch subdir — inside
    * `foreachBatch` the result is fully consumed within the callback,
    * so the spill is safe to drop at batch end.
    *
    * THREAD-LOCAL: the scope binds to the DRIVER thread that sets it
    * (inherited by threads it spawns afterwards), so two concurrent
    * jobs in one JVM — a streaming `foreachBatch` scoping a per-batch
    * dir while another operator runs on a second thread — each see
    * their own mode, and neither can spill into (or delete with) the
    * other's directory. Executor-side code never reads this: the
    * materialization decision happens on the driver, before any task
    * is planned. A job that fans its own operator calls across
    * threads must set the scope on each thread (or spawn the workers
    * from inside the scope, inheriting it).
    */
  private val reliableDirTl: InheritableThreadLocal[Option[String]] =
    new InheritableThreadLocal[Option[String]] {
      override def initialValue: Option[String] = None
    }

  def reliableDir: Option[String] = reliableDirTl.get()
  def reliableDir_=(v: Option[String]): Unit = reliableDirTl.set(v)

  private val matSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `body` with [[reliableDir]] set, restoring the previous value
    * after — the scoped form a job runner should prefer.
    */
  def withReliable[T](dir: String)(body: => T): T = {
    val prev = reliableDir
    reliableDir = Some(dir)
    try body finally reliableDir = prev
  }

  /** Eagerly materialize an operator result, cutting its lineage:
    * executor-local blocks by default, a reliable parquet spill under
    * [[reliableDir]] when set.
    */
  private[graft] def materialize(df: DataFrame): DataFrame =
    reliableDir match {
      case None => df.localCheckpoint(eager = true)
      case Some(dir) =>
        val p = s"$dir/mat-${matSeq.incrementAndGet()}"
        df.write.mode("error").parquet(p)
        // schema pinned from the plan: an empty result writes no part
        // files, and an inferred read would fail on it
        df.sparkSession.read.schema(df.schema).parquet(p)
    }

  def withCached(intermediates: DataFrame*)(body: => DataFrame): DataFrame = {
    if (passthrough) return body
    intermediates.foreach(_.cache())
    try materialize(body)
    finally intermediates.foreach(_.unpersist(blocking = false))
  }
}
