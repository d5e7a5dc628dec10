package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

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

  /** Incremental-dedup ingest — the streaming composition of the batch
    * incremental pieces: every micro-batch is (1) exact-filtered against
    * history through the per-EPOCH broadcast Bloom guard
    * ([[graft.operators.Dedup.filterNovel]], `Broadcast`-handle form —
    * one broadcast per epoch, never one per batch) and exact-deduped
    * within itself, then (2) probed for NEAR-duplicates against the
    * persisted MinHash band index
    * ([[graft.operators.Dedup.minhashProbe]]). `onBatch` receives the
    * surviving novel rows and their near-dup flags, atomically with the
    * batch: append the novels, quarantine or drop the flagged ones, and
    * at the epoch boundary hand the accumulated novels to
    * [[graft.operators.Dedup.rotateEpochBucketed]] — an O(novel)
    * append to the persisted history + index layouts plus a Bloom
    * merge, never an O(corpus) rebuild — then restart the stream with
    * the returned broadcast and the re-opened layouts
    * (StreamingDedupSpec's multi-epoch scenario is the worked
    * example).
    *
    * State at scale: the sketch is O(bits) per epoch, the index is 3
    * longs per history doc per band, and each probe touches only the
    * colliding sliver of history — nothing here grows with the stream.
    * Same (k, bands) as the index build, or keys won't collide.
    */
  def startIncremental(
      docs: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      index: DataFrame,
      history: DataFrame,
      threshold: Double,
      onBatch: (DataFrame, DataFrame) => Unit,
      intervalSeconds: Long = 10,
      textCol: String = "text",
      k: Int = 8,
      bands: Int = 4): StreamingQuery =
    startWith(docs, bloom, intervalSeconds, textCol,
      novel => Dedup.minhashProbe(novel, index, history, threshold,
        textCol, k, bands),
      onBatch)

  /** [[startIncremental]] with the history at rest in a
    * [[graft.operators.Dedup.writeHistoryBucketed]] layout: each batch's
    * candidate-sliver fetch PRUNES history partitions
    * ([[graft.operators.Dedup.minhashProbeBucketed]]) instead of
    * scanning the store — the always-on form, where the probe cost per
    * micro-batch must not grow with the corpus.
    */
  def startIncrementalBucketed(
      docs: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      index: DataFrame,
      historyPath: String,
      threshold: Double,
      onBatch: (DataFrame, DataFrame) => Unit,
      intervalSeconds: Long = 10,
      textCol: String = "text",
      k: Int = 8,
      bands: Int = 4): StreamingQuery = {
    // the layout is epoch-static: resolve the _meta modulus and list the
    // file index ONCE here, not once per micro-batch — per-trigger
    // re-listing of a 100 TB layout would grow with history file count
    val (history, nBuckets) =
      Dedup.openHistoryBucketed(docs.sparkSession, historyPath)
    startWith(docs, bloom, intervalSeconds, textCol,
      novel => Dedup.minhashProbeBucketedOn(novel, index, history, nBuckets,
        threshold, textCol, k, bands),
      onBatch)
  }

  /** [[startIncrementalBucketed]] with BOTH layouts resolved from their
    * persisted paths: the index frame and its (k, bands) geometry come
    * from the [[graft.operators.Dedup.writeMinhashIndex]] `_meta`
    * sidecar, so the probe can never band with a geometry different
    * from the index it joins against (the silent-no-collisions footgun
    * of passing k/bands by hand). Call at each epoch start — after
    * [[graft.operators.Dedup.rotateEpochBucketed]] — so both file
    * listings refresh once per epoch.
    */
  def startIncrementalFromPaths(
      docs: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      indexPath: String,
      historyPath: String,
      threshold: Double,
      onBatch: (DataFrame, DataFrame) => Unit,
      intervalSeconds: Long = 10,
      textCol: String = "text"): StreamingQuery = {
    val (index, k, bands) =
      Dedup.openMinhashIndex(docs.sparkSession, indexPath)
    startIncrementalBucketed(docs, bloom, index, historyPath, threshold,
      onBatch, intervalSeconds, textCol, k, bands)
  }

  private def startWith(
      docs: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      intervalSeconds: Long,
      textCol: String,
      probe: DataFrame => DataFrame,
      onBatch: (DataFrame, DataFrame) => Unit): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.ProcessingTime(intervalSeconds * 1000))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the novels once — both the probe and the caller
        // read them, and the bloom-probe UDF must not run twice
        val novel = Dedup.filterNovel(batch, bloom, textCol)
          .localCheckpoint(eager = true)
        onBatch(novel, probe(novel))
        ()
      }
      .start()
}
