package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tsdb
import graft.ingest.LineParser

/** Streaming ingestion — the reference daemon re-expressed as a Structured
  * Streaming query (reference daemon.py:149-216; SURVEY.md §3.1).
  *
  * The reference's handler threads + in-memory queue + timer-tick flush all
  * collapse into the micro-batch engine: `Trigger.ProcessingTime(interval)`
  * IS the 10-second flush timer (daemon.py:156,167-168), and checkpointed
  * replay strictly improves on the reference's "keep batch and hope for the
  * best" retry (daemon.py:170-213).
  *
  * A real UDP source has no Spark built-in (SURVEY.md §2.1 S2); the
  * supported sources are anything that yields a streaming DataFrame with a
  * single string `line` column — `socket` (dev parity with the reference's
  * TCP listener), [[UdpBridge]] (datagrams spooled to a file source),
  * file/directory drop, or `MemoryStream` in tests.
  */
object Ingest {

  /** Start ingesting a streaming DataFrame of wire lines into `tsdb`'s
    * incoming table. Batch-atomic parse failure (SURVEY.md §2.9 Q3): one
    * malformed line drops that micro-batch, the query keeps running.
    *
    * With `selfMetricPrefix` set, the daemon measures itself exactly like
    * the reference (daemon.py:176-198): each non-empty flush inserts a
    * `{prefix}.insert` datapoint carrying the count of non-self rows
    * inserted — atomically with the batch, so the count never lies — and
    * a failed batch records a `{prefix}.error` datapoint (value 1)
    * instead. Self rows are excluded from the count, so the metric loop
    * never feeds back into itself.
    *
    * With `dedupe` set, repeated wire lines are dropped at the batch
    * commit — duplicate datagrams are a real failure mode: UDP senders
    * retry, load balancers replay. The STORE is the dedup state: after
    * the Q3 parse gate, the batch is deduplicated internally on the
    * parsed (path, timestamp, value) triple and anti-joined against the
    * already-stored incoming rows at those event times (a
    * partition-pruned read — a duplicate carries its original's wire
    * timestamp, so the probe window is exactly the batch's own event
    * range). Because no dedup state lives outside the store, a REJECTED
    * batch leaves no residue — a retry of a poisoned batch's lines
    * still lands (streaming-state dedup would remember digests of rows
    * that were never stored, turning transient rejection into permanent
    * loss) — and a crash-replayed batch re-inserts nothing. Self-metric
    * counts see post-dedup rows only, so the insert metric reports what
    * was actually stored; a flush whose every row is a duplicate stores
    * nothing and emits nothing.
    */
  def start(
      tsdb: Tsdb,
      lines: DataFrame,
      intervalSeconds: Long = 10,
      onBatchError: Throwable => Unit = _ => (),
      selfMetricPrefix: Option[String] = None,
      dedupe: Boolean = false): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, max, min}
    lines.writeStream
      .trigger(Trigger.ProcessingTime(intervalSeconds * 1000))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        try {
          val pb = LineParser.parseCounted(batch, batch.columns.head,
            selfMetricPrefix)
          if (pb.bad > 0)
            throw new LineParser.ParseException(
              "malformed line(s) in batch; batch dropped")
          val (toStore, nonSelf) =
            if (!dedupe || pb.total == 0) (pb.rows, pb.nonSelf)
            else {
              val uniq = pb.rows
                .dropDuplicates("path", "timestamp", "value")
              val b = uniq.agg(min("timestamp"), max("timestamp")).head()
              // both bounds matter: they become day-partition predicates
              // in incomingRange, so the probe reads only the batch's
              // own event-time window of history, never the whole store
              val novel = uniq.join(
                  tsdb.incomingRange(b.getDouble(0), b.getDouble(1)),
                  Seq("path", "timestamp", "value"), "left_anti")
                .localCheckpoint(true)
              val ns = selfMetricPrefix match {
                // nonSelf's only consumer is the self-metric union
                // below — without a prefix the count job would run and
                // its result never be read, a redundant scheduler
                // round-trip on every micro-batch of the plain
                // deduped-ingest configuration
                case None => 0L
                case Some(p) =>
                  novel.filter(!col("path").startsWith(p + ".")).count()
              }
              (novel, ns)
            }
          val total = if (dedupe) toStore.count() else pb.total
          if (total > 0) {
            val rows = selfMetricPrefix match {
              case None => toStore
              case Some(prefix) =>
                val spark = batch.sparkSession
                import spark.implicits._
                toStore.unionByName(
                  Seq((s"$prefix.insert", tsdb.now(), nonSelf.toDouble))
                    .toDF("path", "timestamp", "value"))
            }
            tsdb.insert(rows)
          }
        } catch {
          case e: LineParser.ParseException =>
            onBatchError(e)
            selfMetricPrefix.foreach { prefix =>
              try tsdb.insert(Seq((s"$prefix.error", tsdb.now(), 1.0)))
              catch { case _: Throwable => () }
            }
        }
        ()
      }
      .start()
  }
}
