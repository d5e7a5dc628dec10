package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming embedding ingest for the IVF layout — the similarity-side
  * twin of [[StreamingDedup]]'s spool → rotate lifecycle, built from
  * the same idempotent batch spool:
  *
  *   1. [[startSpool]] runs the stream: each micro-batch of
  *      `(vec_id, embedding)` rows lands in the current epoch's spool
  *      via [[StreamingDedup.spoolBatch]] (staged + atomic rename, so
  *      `foreachBatch`'s at-least-once replay REPLACES instead of
  *      double-spooling);
  *   2. at the epoch boundary, [[applySpooledEpoch]] appends the
  *      spool's union to the layout through the crash-safe
  *      [[Similarity.appendIvfEpoch]] protocol under the SPOOL'S OWN
  *      epoch id, then clears the spool — ledgered either way, so a
  *      crash between append and clear just replays as a ledger hit.
  *
  * No per-batch query runs against the layout (unlike the dedup
  * stream's probe): ANN readers keep probing the layout as-is and see
  * each epoch when its append lands. Per the explicit-epochId
  * contract, an epoch id must never be REUSED for different data — the
  * ledger makes a reused id a silent no-op and [[applySpooledEpoch]]
  * would then clear the new rows unapplied; `epochIdFor` must be a
  * stable batch→epoch mapping (e.g. `batchId / batchesPerEpoch`).
  */
object StreamingSimilarity {

  /** Start spooling the embedding stream, one epoch-scoped directory
    * per `epochIdFor(batchId)` — `spoolRoot/<epochId>/batch_id=<id>`.
    * The frame must carry the layout's id column and an `embedding`
    * array column (what [[Similarity.appendIvfEpoch]] assigns).
    *
    * ALWAYS pass a stable `checkpointLocation` in production: without
    * one the engine uses a temporary checkpoint, a restart resets
    * batchIds to 0, and `epochIdFor` then maps NEW data onto epoch ids
    * that are already ledgered — [[applySpooledEpoch]] would clear
    * those rows unapplied (the ledger hit looks like the documented
    * crash retry). The kind-tagged ledger cannot catch this: the id
    * really was an epoch id. A pinned checkpoint makes batchIds
    * continue across restarts, which is what keeps `epochIdFor`
    * collision-free.
    */
  def startSpool(
      emb: DataFrame,
      spoolRoot: String,
      epochIdFor: Long => String,
      intervalSeconds: Long = 10,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = emb.writeStream
      .trigger(Trigger.ProcessingTime(intervalSeconds * 1000))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingDedup.spoolBatch(batch,
          s"$spoolRoot/${epochIdFor(batchId)}", batchId)
        ()
      }
    checkpointLocation
      .fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
  }

  /** Epoch-boundary step: append `spoolRoot/<epochId>`'s accumulated
    * rows to the layout under `epochId` (crash-safe, retry-idempotent —
    * [[Similarity.appendIvfEpoch]]), then clear the spool. Returns true
    * when the epoch was applied NOW; false when the spool was empty or
    * the epoch was already ledgered (the crash-between-append-and-clear
    * retry: the layout already holds the rows, only the clear reruns).
    * Call with the stream STOPPED or after the epoch's last batch — the
    * single-maintenance-writer contract of the append protocol.
    */
  def applySpooledEpoch(
      spark: SparkSession,
      spoolRoot: String,
      epochId: String,
      layoutPath: String,
      idCol: String = "vec_id"): Boolean = {
    val sp = s"$spoolRoot/$epochId"
    StreamingDedup.readSpool(spark, sp) match {
      case None => false
      case Some(novel) =>
        val applied =
          Similarity.appendIvfEpoch(novel, layoutPath, epochId, idCol)
        StreamingDedup.clearSpool(spark, sp)
        applied
    }
  }
}
