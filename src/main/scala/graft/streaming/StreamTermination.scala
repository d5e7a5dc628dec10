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
  * engine stops — the listener's drain (a rotation, possibly a
  * maintain tick) still runs on the listener-bus thread. A caller that
  * starts new maintenance on the same layouts right after `stop()`
  * would race a live single-maintenance-writer; `awaitDrain` is the
  * handshake that prevents it. An ERROR termination releases the
  * latch WITHOUT running `body` (the crash contract is
  * heal-on-restart).
  */
private[graft] object StreamTermination {

  private val latches = new ConcurrentHashMap[UUID, CountDownLatch]()

  private val log =
    org.slf4j.LoggerFactory.getLogger(StreamTermination.getClass)

  /** Register the clean-termination `body` for `query`. Call right
    * after `start()`; the termination event cannot have fired before
    * registration in practice (the caller holds the only handle and
    * has not stopped it), and a missed registration would only skip
    * the drain — the spool survives for restart healing by contract.
    */
  private[streaming] def onCleanTermination(
      spark: SparkSession,
      query: StreamingQuery,
      what: String)(body: => Unit): Unit = {
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
          try {
            // clean stop only — the error path's contract is
            // heal-on-restart, so the spool must survive intact
            if (e.exception.isEmpty) body
          } catch {
            case t: Throwable =>
              // the spool survives (idempotent protocols): a manual
              // drain or the next session's healing finishes the job
              log.error(s"$what failed; spool left for restart healing", t)
          } finally {
            Option(latches.remove(queryId)).foreach(_.countDown())
            spark.streams.removeListener(this)
          }
        }
    }
    spark.streams.addListener(listener)
  }

  /** Block until `query`'s registered drain has COMPLETED (or the
    * query was never registered / already drained — immediate true).
    * Call after `query.stop()` and before any other maintenance on
    * the drained layouts. Returns false on timeout.
    */
  def awaitDrain(query: StreamingQuery, timeoutMs: Long = 60000): Boolean =
    Option(latches.get(query.id)) match {
      case None => true
      case Some(l) => l.await(timeoutMs, TimeUnit.MILLISECONDS)
    }
}
