package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Period

/** The engine's aggregation as a genuine Structured Streaming query —
  * the reference's batch sync algebra (SURVEY.md §2.8) expressed with the
  * constructs it anticipates:
  *
  *  - event time = the wire timestamp (W1) ⇒ `withWatermark` on it
  *  - `tail` lateness bound (W2) ⇒ the watermark delay
  *  - tumbling buckets (A1) ⇒ `window(ts, period)`
  *  - append-once finalization + late-data drop (W4–W6) ⇒ append output
  *    mode: a bucket is emitted exactly once, when the watermark passes
  *    its end + tail, and later arrivals for it are dropped — the same
  *    observable behavior `Tsdb.sync` produces with `intervals()`.
  *
  * The one semantic delta vs batch sync: the watermark advances from
  * observed event time, not a wall clock — documented, and why the batch
  * path remains the reference-parity implementation.
  */
object StreamingAgg {

  /** incoming (streaming DataFrame of path/timestamp/value) → per-period
    * final aggregate rows in append mode. Output schema matches the
    * period tables: (path, timestamp, n, min, max, avg, sum, p50, p90, p99).
    *
    * Percentiles are EXACT by default — the reference's own quirk Q1
    * (exact interpolated percentiles) carried into the streaming
    * surface, at the documented state cost: `percentile`'s buffer
    * keeps every raw value of each OPEN (path, window) pair in the
    * state store, ser/de'd per trigger. That is the right trade at
    * the reference's cadence (its periods hold tens-to-hundreds of
    * points), and the wrong one for high-rate paths × long periods
    * (1 Hz into a 1-day window is ~86k buffered doubles per path).
    * `approxPercentileAccuracy = Some(acc)` bounds the buffer to a
    * constant-size sketch (`percentile_approx`, rank error ≤ 1/acc)
    * for that regime — an explicit knob, never a silent default, since
    * it trades away batch-sync parity on the percentile columns.
    */
  def finalBuckets(incoming: DataFrame, period: Period, tailSeconds: Long,
      approxPercentileAccuracy: Option[Int] = None): DataFrame = {
    val withEventTime = incoming
      .withColumn("event_time", timestamp_seconds(col("timestamp")))
      .withWatermark("event_time", s"$tailSeconds seconds")
    val ps = array(lit(0.5), lit(0.9), lit(0.99))
    withEventTime
      .groupBy(col("path"), window(col("event_time"), s"${period.seconds} seconds"))
      .agg(
        count(col("value")).cast(DoubleType).as("n"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        avg(col("value")).as("avg"),
        sum(col("value")).as("sum"),
        approxPercentileAccuracy
          .map(acc => percentile_approx(col("value"), ps, lit(acc)))
          .getOrElse(percentile(col("value"), ps)).as("_ps"))
      .select(
        col("path"),
        // window start back to epoch-seconds double, same as Agg.bucket
        col("window.start").cast(DoubleType).as("timestamp"),
        col("n"), col("min"), col("max"), col("avg"), col("sum"),
        col("_ps").getItem(0).as("p50"),
        col("_ps").getItem(1).as("p90"),
        col("_ps").getItem(2).as("p99"))
  }
}
