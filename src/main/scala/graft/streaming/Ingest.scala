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
    * With `dedupe` set, repeated wire lines within `dedupeLateness` of
    * their first arrival are dropped before parsing — the
    * [[StreamingDedup]] first-seen pattern applied to the ingest path
    * (duplicate datagrams are a real failure mode: UDP senders retry,
    * load balancers replay). Keyed on the line's content digest with an
    * ARRIVAL-time watermark (the wire timestamp is still inside the
    * un-parsed line at this stage, and a malformed line must reach the
    * parse step to trigger Q3 batch rejection, not silently vanish in a
    * watermark), so state stays bounded and the query runs forever.
    * Self-metric counts see post-dedup rows only, so the insert metric
    * reports what was actually stored.
    */
  def start(
      tsdb: Tsdb,
      lines: DataFrame,
      intervalSeconds: Long = 10,
      onBatchError: Throwable => Unit = _ => (),
      selfMetricPrefix: Option[String] = None,
      dedupe: Boolean = false,
      dedupeLateness: String = "10 minutes"): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, current_timestamp, md5}
    val lineCol = lines.columns.head
    val src =
      if (!dedupe) lines
      else lines
        .withColumn("graft_arrival", current_timestamp())
        .withColumn("graft_line_md5", md5(col(lineCol).cast("binary")))
        .withWatermark("graft_arrival", dedupeLateness)
        .dropDuplicatesWithinWatermark("graft_line_md5")
        .select(lineCol)
    src.writeStream
      .trigger(Trigger.ProcessingTime(intervalSeconds * 1000))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        try {
          val pb = LineParser.parseCounted(batch, batch.columns.head,
            selfMetricPrefix)
          if (pb.bad > 0)
            throw new LineParser.ParseException(
              "malformed line(s) in batch; batch dropped")
          if (pb.total > 0) {
            val rows = selfMetricPrefix match {
              case None => pb.rows
              case Some(prefix) =>
                val spark = batch.sparkSession
                import spark.implicits._
                pb.rows.unionByName(
                  Seq((s"$prefix.insert", tsdb.now(), pb.nonSelf.toDouble))
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
