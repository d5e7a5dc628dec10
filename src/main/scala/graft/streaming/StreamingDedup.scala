package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingestion-time half of the dedup story:
  * a training-data firehose drops repeats as they arrive, so the batch
  * near-dup passes ([[graft.operators.Dedup]]) run on an already
  * exact-unique corpus.
  *
  * First-seen wins: rows carrying a content digest already seen within
  * the watermark horizon are discarded. `dropDuplicatesWithinWatermark`
  * keeps the digest-keyed state store BOUNDED — state older than the
  * event-time watermark is evicted — which is what makes this runnable
  * forever: an unbounded `dropDuplicates` would accumulate one state
  * row per distinct document ever seen. The horizon is therefore the
  * dedup guarantee window: a repeat arriving more than `lateness` after
  * its original may be emitted again, and the downstream batch exact
  * dedup (q20) removes it — at-least-once dedup streaming-side, exact
  * batch-side.
  */
object StreamingDedup {

  /** @param docs streaming frame with `textCol` and an event-time column
    * @param eventTimeCol timestamp column the watermark advances on
    * @param lateness watermark delay = the dedup guarantee window
    */
  def firstSeen(
      docs: DataFrame,
      eventTimeCol: String,
      lateness: String = "10 minutes",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_md5", md5(col(textCol).cast("binary")))
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark("text_md5")
}
