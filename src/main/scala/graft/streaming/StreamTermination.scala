package graft.streaming

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** The shared clean-termination hook behind both `drainOnStop` flags
  * ([[StreamingSimilarity.startSpool]],
  * [[StreamingDedup.startIncrementalAuto]]): run `body` exactly once
  * when the given query terminates WITHOUT an error, then release a
  * per-query latch either way so callers can [[awaitDrain]] before
  * touching the drained layouts.
  *
  * The latch matters because `query.stop()` returns as soon as the
  * engine stops — the drain (a rotation, possibly a maintain tick)
  * still runs asynchronously. A caller that starts new maintenance on
  * the same layouts right after `stop()` would race a live
  * single-maintenance-writer; `awaitDrain` is the handshake that
  * prevents it. An ERROR termination releases the latch WITHOUT
  * running `body` (the crash contract is heal-on-restart).
  *
  * The body runs on its OWN named thread, never on the session-wide
  * listener-bus thread: a drain is minutes of Spark jobs, and running
  * it inline would serialize every other listener in the session
  * (progress reporting, a second stream's own drain) behind it —
  * two back-to-back stops would stack their drains and time the
  * second caller's `awaitDrain` out with nothing wrong. The thread is
  * a daemon like the bus thread it replaces: a JVM exit mid-drain
  * loses nothing the restart-healing contract doesn't recover.
  *
  * Moving off the bus thread removed the ACCIDENTAL serialization it
  * provided between two streams' drains, so drains are now serialized
  * DELIBERATELY, per layout: bodies registered with the same
  * `layoutKey` (the drained layout's root path) run one at a time —
  * two streams stopped against the same layout queue their drains
  * instead of racing the single-maintenance-writer contract, while
  * drains of unrelated layouts still proceed concurrently.
  */
private[graft] object StreamTermination {

  private val latches = new ConcurrentHashMap[UUID, CountDownLatch]()

  /** One monitor per drained layout root — the per-layout drain queue.
    * Bounded by the number of distinct layouts a process ever drains.
    */
  private val layoutLocks = new ConcurrentHashMap[String, Object]()

  private val log =
    org.slf4j.LoggerFactory.getLogger(StreamTermination.getClass)

  /** Register the clean-termination `body` for `query`. Call right
    * after `start()`. A query CAN terminate before registration — an
    * instantly-failing source errors before the next statement runs —
    * and listener-bus events are not replayed; that path is an ERROR
    * termination (the caller cannot have stopped a handle it does not
    * hold yet), where the contract skips the drain anyway, so the
    * post-registration liveness check below just releases the latch.
    */
  private[streaming] def onCleanTermination(
      spark: SparkSession,
      query: StreamingQuery,
      what: String,
      layoutKey: String)(body: => Unit): Unit = {
    val queryId = query.id
    latches.put(queryId, new CountDownLatch(1))
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == queryId) {
          spark.streams.removeListener(this)
          if (e.exception.isDefined) {
            // error path: the contract is heal-on-restart, so the
            // spool must survive intact — release without draining
            Option(latches.remove(queryId)).foreach(_.countDown())
          } else {
            val t = new Thread(() => {
              // serialize per layout: a second stream's drain against
              // the same layout waits here instead of racing the
              // single-maintenance-writer protocols (its awaitDrain
              // latch stays down until ITS body has run)
              val lock =
                layoutLocks.computeIfAbsent(layoutKey, _ => new Object)
              try lock.synchronized(body)
              catch {
                case t: Throwable =>
                  // the spool survives (idempotent protocols): a
                  // manual drain or the next session's healing
                  // finishes the job
                  log.error(
                    s"$what failed; spool left for restart healing", t)
              } finally Option(latches.remove(queryId))
                .foreach(_.countDown())
            }, s"graft-drain-$queryId")
            t.setDaemon(true)
            t.start()
          }
        }
    }
    spark.streams.addListener(listener)
    // the query may have ERROR-terminated before addListener (missed
    // event, never replayed): the drain is skipped on errors anyway,
    // so release any still-pending latch AND drop the listener — a
    // dead query's listener would otherwise sit on the session-wide
    // bus forever, holding the drain closure. If the event DID arrive
    // late, the listener's own Option-guarded remove no-ops.
    if (!query.isActive) {
      Option(latches.remove(queryId)).foreach(_.countDown())
      spark.streams.removeListener(listener)
    }
  }

  /** Block until `query`'s registered drain has COMPLETED (or the
    * query was never registered / already drained — immediate true).
    * Call after `query.stop()` and before any other maintenance on
    * the drained layouts. Returns false on timeout — and the latch
    * STAYS, so a retry keeps waiting for the still-running drain
    * instead of reporting it complete (releasing here would hand a
    * second maintenance writer to layouts the drain still owns).
    */
  def awaitDrain(query: StreamingQuery, timeoutMs: Long = 60000): Boolean =
    Option(latches.get(query.id)) match {
      case None => true
      case Some(l) => l.await(timeoutMs, TimeUnit.MILLISECONDS)
    }
}
