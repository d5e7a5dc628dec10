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
  * TCP listener), file/directory drop, or `MemoryStream` in tests.
  */
object Ingest {

  /** Start ingesting a streaming DataFrame of wire lines into `tsdb`'s
    * incoming table. Batch-atomic parse failure (SURVEY.md §2.9 Q3): one
    * malformed line drops that micro-batch, the query keeps running.
    */
  def start(
      tsdb: Tsdb,
      lines: DataFrame,
      intervalSeconds: Long = 10,
      onBatchError: Throwable => Unit = _ => ()): StreamingQuery = {
    lines.writeStream
      .trigger(Trigger.ProcessingTime(intervalSeconds * 1000))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        try tsdb.insert(LineParser.parseStrict(batch, batch.columns.head))
        catch { case e: LineParser.ParseException => onBatchError(e) }
        ()
      }
      .start()
  }
}
