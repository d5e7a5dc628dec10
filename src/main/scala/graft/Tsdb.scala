package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Intervals, Period, Periods, Stats}
import graft.operators.Agg

/** Schemas of the two table shapes (reference: tsdb.py:155-180). */
object TsdbSchema {
  val incoming: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("timestamp", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val aggregate: StructType = StructType(
    StructField("path", StringType, nullable = false) +:
      Stats.aggColumns.tail.map(c => StructField(c, DoubleType, nullable = true)))

  /** `schema` + the `day` partition column. Partitioned directories are
    * always read with this EXPLICIT schema: inference throws
    * AnalysisException on a directory whose partitions have all been
    * dropped by retention (an idle source would crash-loop the sync
    * daemon), while an explicit schema yields the empty frame.
    */
  def withDay(schema: StructType): StructType =
    schema.add(StructField("day", LongType, nullable = true))
}

/** Spark-native reimplementation of smalltsdb's TSDB API (tsdb.py:70-457).
  *
  * One class covers the reference's three backends (SURVEY.md §1.4) via two
  * knobs:
  *  - `materialized = false` ⇒ ViewTSDB: every read of a period table
  *    recomputes the aggregation over `incoming` (partial buckets visible).
  *  - `materialized = true` ⇒ TablesTSDB: period tables are real parquet
  *    tables, incrementally maintained by [[sync]] (only *final* buckets
  *    ever appear — append-once semantics, late data for finalized buckets
  *    is dropped, exactly like a Structured Streaming append-mode window
  *    with a `tail`-second watermark).
  *  - TwoDatabasesTSDB's separate-file layout (tsdb.py:423-454) is the
  *    `incomingRoot` option: incoming and aggregate tables at independent
  *    storage paths (free in Spark — there are no file locks to isolate).
  *
  * Scale design: `incoming` is an append-only parquet directory; each
  * period table is parquet partitioned by aggregation work — sync appends
  * only never-before-final buckets (deterministic half-open ranges make the
  * append idempotent across successful runs, replacing SQLite's
  * `insert or replace` PK upsert, SURVEY.md §2.8 W5). On a real cluster the
  * same layout holds: the sync aggregation shuffles once on (path, bucket)
  * and the high-water-mark join broadcasts (distinct paths ≪ data).
  *
  * @param now injectable clock, epoch seconds (reference `_now`,
  *            tsdb.py:92 — the whole deterministic test strategy depends on
  *            keeping this injectable).
  */
final class Tsdb(
    val spark: SparkSession,
    root: String,
    val materialized: Boolean = true,
    val tail: Long = 60,
    var now: () => Double = () => System.currentTimeMillis() / 1000.0,
    val periods: Seq[Period] = Periods.all,
    incomingRoot: Option[String] = None,
    val datePartitioned: Boolean = true) {

  private val incomingPath: String = incomingRoot.getOrElse(root) + "/incoming"
  private def periodPath(p: Period): String = s"$root/${p.name}"

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readOrEmpty(path: String, schema: StructType): DataFrame =
    if (fs(path).exists(new Path(path)))
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  // ---------------------------------------------------------------- write

  /** Append datapoints to `incoming` (reference insert(), tsdb.py:111-114 —
    * no dedup, no validation beyond non-null).
    */
  def insert(points: Seq[(String, Double, Double)]): Unit = {
    import spark.implicits._
    insert(points.toDF("path", "timestamp", "value"))
  }

  def insert(df: DataFrame): Unit = {
    val rows = df.select(
      col("path").cast(StringType),
      col("timestamp").cast(DoubleType),
      col("value").cast(DoubleType))
    if (datePartitioned)
      // day partitions make retention a partition drop and let time
      // predicates prune whole directories at scale
      rows.withColumn("day", Tsdb.dayOf(col("timestamp")))
        .write.partitionBy("day").mode("append").parquet(incomingPath)
    else
      rows.write.mode("append").parquet(incomingPath)
  }

  // ----------------------------------------------------------------- read

  /** Incoming rows with `timestamp ∈ [lo, hi]`, pruned at the
    * day-partition level BEFORE the row filter — the bounded read for
    * incremental probes (e.g. the ingest dedup anti-join): a predicate
    * on the data column `timestamp` alone cannot prune `day`
    * directories, so an unbounded `incoming.filter(ts >= x)` would list
    * and scan the whole history every time.
    */
  def incomingRange(lo: Double, hi: Double): DataFrame = {
    val f = fs(incomingPath)
    if (!f.exists(new Path(incomingPath)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], TsdbSchema.incoming)
    else if (datePartitioned)
      spark.read.schema(TsdbSchema.withDay(TsdbSchema.incoming))
        .parquet(incomingPath)
        .filter(col("day").between(
          math.floor(lo / 86400.0).toLong, math.floor(hi / 86400.0).toLong))
        .filter(col("timestamp").between(lo, hi))
        .select("path", "timestamp", "value")
    else
      spark.read.schema(TsdbSchema.incoming).parquet(incomingPath)
        .filter(col("timestamp").between(lo, hi))
  }

  def incoming: DataFrame = {
    val f = fs(incomingPath)
    if (!f.exists(new Path(incomingPath)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], TsdbSchema.incoming)
    else if (datePartitioned)
      // explicit schema (never inference — see TsdbSchema.withDay); the
      // day column is projected away so the logical schema stays
      // (path, timestamp, value), while remaining available to the
      // optimizer for partition pruning underneath
      spark.read.schema(TsdbSchema.withDay(TsdbSchema.incoming))
        .parquet(incomingPath)
        .select("path", "timestamp", "value")
    else
      spark.read.schema(TsdbSchema.incoming).parquet(incomingPath)
  }

  /** A materialized period table WITH its day partition column (empty
    * frame when never synced). Always an explicit-schema read.
    */
  private def materializedTable(period: Period): DataFrame =
    if (datePartitioned)
      readOrEmpty(periodPath(period), TsdbSchema.withDay(TsdbSchema.aggregate))
    else readOrEmpty(periodPath(period), TsdbSchema.aggregate)

  /** The aggregate series for one period: a maintained table
    * (TablesTSDB) or a recomputed view (ViewTSDB, tsdb.py:201-231).
    */
  def table(period: Period): DataFrame =
    if (materialized)
      materializedTable(period).select(Stats.aggColumns.map(col): _*)
    else Agg.aggregate(incoming, period)

  /** Resolve a period name against THIS instance's period set — a name
    * outside it is an error even if it is a default period name (the
    * reference asserts membership the same way, tsdb.py:120).
    */
  private def resolvePeriod(periodName: String): Period =
    periods.find(_.name == periodName).getOrElse(
      throw new IllegalArgumentException(s"unknown period: $periodName"))

  def table(periodName: String): DataFrame = table(resolvePeriod(periodName))

  /** Reference get_metric (tsdb.py:116-140): one series of one stat over a
    * closed interval. `between` is inclusive on both ends, matching the
    * reference's read-path BETWEEN (tsdb.py:135).
    * The period/stat whitelists guard the same way the reference's asserts
    * do (tsdb.py:119-121, SURVEY.md §2.9 Q7).
    */
  def getMetric(
      path: String,
      periodName: String,
      stat: String,
      interval: (Double, Double)): DataFrame = {
    require(Stats.isValid(stat), s"unknown stat: $stat")
    val period = resolvePeriod(periodName)
    val src =
      if (materialized && datePartitioned)
        // derive the day range from the time interval so the predicate
        // prunes whole partition directories before any file is listed
        materializedTable(period)
          .filter(col("day").between(
            math.floor(interval._1 / 86400.0).toLong,
            math.floor(interval._2 / 86400.0).toLong))
          .select(Stats.aggColumns.map(col): _*)
      else if (materialized) table(period)
      else {
        // view mode: push the equivalent RAW-time range below the
        // aggregation so parquet row-group pruning applies. Bucket b is
        // selected iff b ∈ [start, end] iff its raw points fall in
        // [ceilAlign(start), floorAlign(end) + period) — exact, since
        // buckets are aligned.
        val p = period.seconds
        val rawLo = math.ceil(interval._1 / p) * p
        val rawHi = math.floor(interval._2 / p) * p + p
        // incomingRange, not bare incoming: a predicate on the DATA
        // column timestamp alone cannot prune day= partitions (the
        // class comment above), so the bare form would list and scan
        // the whole retained history per request. Its inclusive hi
        // bound may admit one extra bucket at rawHi; the half-open
        // filter below removes it before aggregation
        Agg.aggregate(
          incomingRange(rawLo, rawHi).filter(col("path") === path &&
            col("timestamp") >= rawLo && col("timestamp") < rawHi),
          period)
      }
    src
      .filter(col("path") === path &&
        col("timestamp").between(interval._1, interval._2))
      .select(col("timestamp"), col(stat))
      .orderBy("timestamp")
  }

  /** Register one temp view per period (+ `incoming`) so plain
    * `spark.sql("select * from tensecond")` works — the reference's
    * view-shaped API surface (A6: tsdb.py:216-226, ViewTSDB's views /
    * TablesTSDB's tables behind the same names).
    */
  def createViews(): Unit = {
    incoming.createOrReplaceTempView("incoming")
    periods.foreach(p => table(p).createOrReplaceTempView(p.name))
    viewsRegistered = true
  }

  // the views are LIVE like the reference's SQLite views, not
  // point-in-time snapshots: a temp view pins its relation's file
  // listing at registration, so after sync/retention/compaction delete
  // or replace files a stale view throws FileNotFoundException (or
  // silently serves pre-sync data). The two mutators re-register at
  // exit whenever the user has created views.
  @volatile private var viewsRegistered = false
  private def refreshViews(): Unit = if (viewsRegistered) createViews()

  /** Reference list_metrics (tsdb.py:142-152): union-distinct of paths over
    * every period table. Kept in the reference's union shape (SURVEY.md
    * §2.9 Q6) — Catalyst's column pruning strips the unused stat aggregates
    * from each leg, so in view mode this degenerates to cheap distinct
    * scans.
    */
  def listMetrics(): DataFrame =
    periods.map(p => table(p).select("path"))
      .reduce(_ union _)
      .distinct()
      .orderBy("path")

  // ----------------------------------------------------------------- sync

  /** Incrementally finalize buckets for every period, then apply raw-data
    * retention (reference TablesTSDB.sync, tsdb.py:305-337). No-op in view
    * mode (tsdb.py:230-231).
    */
  def sync(): Unit = {
    if (!materialized) return
    // a crashed compaction must be resolved BEFORE any table is read or
    // retention deletes anything: sync over a half-compacted period
    // table would re-finalize "missing" buckets that recovery later
    // restores (duplicates), and retention deleting a crashed
    // compaction's manifest inputs would make recovery misclassify its
    // state. sync and compact are the only mutators and share the
    // single-writer lock, so recovery-at-entry restores consistency
    // before either proceeds.
    recoverCompactions()
    recoverRetention()
    val nowTs = now()
    // one incoming scan and ONE distinct-path set shared by all periods —
    // retention keeps incoming bounded to tail + max(period) of raw data,
    // so the cache is the recent window, not unbounded history
    val inc = incoming.cache()
    val paths = inc.select("path").distinct().cache()
    try periods.foreach(p => syncPeriod(nowTs, p, inc, paths))
    finally { inc.unpersist(); paths.unpersist() }
    deleteIncoming(nowTs)
    refreshViews()
  }

  /** Resolve any crashed compaction on every table this instance owns
    * (see [[compactTable]]'s protocol). Runs at the entry of the two
    * mutators, [[sync]] and [[compact]].
    */
  private def recoverCompactions(): Unit = {
    def scan(tableRoot: String): Unit = {
      val f = fs(tableRoot)
      if (!f.exists(new Path(tableRoot))) return
      f.listStatus(new Path(tableRoot))
        .filter(_.getPath.getName.startsWith("_compact_day="))
        .foreach(t => recoverCompact(f, tableRoot, t.getPath))
    }
    if (datePartitioned) {
      scan(incomingPath)
      if (materialized) periods.foreach(p => scan(periodPath(p)))
    }
  }

  /** One period's delta maintenance — the set-oriented form of the
    * reference's per-path loop (tsdb.py:339-410, SURVEY.md §3.2):
    *
    *  1. high-water mark per path: distinct incoming paths LEFT JOIN the
    *     period table's `max(timestamp)` (the J1 join, tsdb.py:354-364).
    *     The hwm side is tiny (one row per metric path) ⇒ broadcast.
    *  2. each path's final range is `[last_final + period, final_end)` with
    *     a single global `final_end = (now - tail) // period * period`
    *     (the [[Intervals]] algebra; half-open per SURVEY.md §2.9 Q2 —
    *     deliberately NOT reproducing the reference's inclusive-BETWEEN
    *     boundary bug at tsdb.py:405-406).
    *  3. one aggregation over the range-filtered incoming ⇒ new final
    *     buckets, appended. Ranges never overlap previously-final buckets,
    *     so append ≡ the reference's `insert or replace` upsert, without
    *     requiring a transactional MERGE.
    */
  private def syncPeriod(
      nowTs: Double,
      period: Period,
      inc: DataFrame,
      paths: DataFrame): Unit = {
    val finalEnd =
      Intervals.intervals(period.seconds, tail, nowTs, None).finalInterval.end

    val hwm = paths
      .join(
        table(period).groupBy("path").agg(max(col("timestamp")).as("last_final")),
        Seq("path"), "left")
      // lastFinal = None ⇒ -period ⇒ final_start = 0 (tsdb.py:260-261)
      .select(col("path"),
        coalesce(col("last_final") + period.seconds, lit(0.0)).as("final_start"))

    val newFinals = Agg.aggregate(
      inc.join(broadcast(hwm), Seq("path"))
        .filter(col("timestamp") >= col("final_start") &&
          col("timestamp") < lit(finalEnd))
        .select("path", "timestamp", "value"),
      period)

    if (datePartitioned)
      // bucket-day partitions: getMetric's time interval prunes whole
      // directories, and ageing out finalized history becomes a partition
      // drop (same layout as incoming). Each sync appends one file per
      // touched day; a periodic compaction job rewriting recent day
      // partitions bounds the file count at cluster scale.
      newFinals.withColumn("day", Tsdb.dayOf(col("timestamp")))
        .write.partitionBy("day").mode("append").parquet(periodPath(period))
    else
      newFinals.write.mode("append").parquet(periodPath(period))
  }

  /** Compact day partitions whose file count exceeded `maxFilesPerDay`:
    * each sync appends one file per touched day, so an always-on daemon
    * grows a day's partition to ~8640 files at a 10 s cadence — this is
    * the periodic maintenance job that bounds it (the companion to
    * [[sync]]'s append-only write path). Each oversized day is rewritten
    * to ~`targetBytes` files which replace exactly the input files read
    * (see [[compactTable]] — concurrent appends to the same day are
    * never touched); run it under the same single-writer lock as sync.
    * Day partitions are independent, so the work is O(oversized days)
    * driver-side listings plus one bounded Spark job per oversized day.
    */
  def compact(
      maxFilesPerDay: Int = 16,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    if (!datePartitioned) return
    recoverCompactions()
    compactTable(incomingPath, TsdbSchema.incoming, maxFilesPerDay, targetBytes)
    if (materialized)
      periods.foreach(p =>
        compactTable(periodPath(p), TsdbSchema.aggregate, maxFilesPerDay, targetBytes))
    refreshViews()
  }

  /** Compact one table's oversized day partitions. Concurrent-append
    * safe: the rewrite reads an EXPLICIT file list and replaces exactly
    * those files — a daemon appending a new file to the same day during
    * the compaction is never touched (the day DIRECTORY is never
    * deleted or renamed). Every delete/rename result is checked (Hadoop
    * FileSystems report most failures through the return value).
    *
    * Crash safety via a manifest protocol — per oversized day:
    *   1. write the compacted files + a `_MANIFEST` of the input paths
    *      into `_compact_day=N` (invisible to readers);
    *   2. delete the manifest's input files;
    *   3. move the compacted files into the live day dir;
    *   4. delete the tmp dir.
    * The manifest lands atomically (write + rename), so it either
    * exists complete or not at all. [[recoverCompactions]] runs at the
    * ENTRY of both mutators — sync() and compact(), which share the
    * single-writer lock — and classifies a leftover tmp by its
    * manifest: all inputs still present ⇒ crashed before (2), discard
    * the tmp; otherwise ⇒ crashed during/after (2), finish the deletes
    * and complete the move. Data therefore comes from EITHER the
    * inputs or the rewrite, never both (no crash state yields
    * duplicates), and no state loses rows. Recovery-at-sync-entry also
    * means retention and re-finalization never observe a
    * half-compacted table. Readers between (2) and (3) see the day
    * partially missing — the window is a handful of renames wide and
    * sits inside the locked maintenance operation.
    */
  private def compactTable(
      tableRoot: String,
      schema: StructType,
      maxFilesPerDay: Int,
      targetBytes: Long): Unit = {
    val f = fs(tableRoot)
    if (!f.exists(new Path(tableRoot))) return
    f.listStatus(new Path(tableRoot))
      .filter(_.getPath.getName.startsWith("day=")).foreach { st =>
        val parts = f.listStatus(st.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
        if (parts.length > maxFilesPerDay) {
          val day = st.getPath.getName.stripPrefix("day=")
          val nOut = math.max(1L,
            (parts.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
          val tmp = new Path(s"$tableRoot/_compact_day=$day")
          spark.read.schema(schema)
            .parquet(parts.map(_.getPath.toString).toIndexedSeq: _*)
            .coalesce(nOut)
            .write.mode("overwrite").parquet(tmp.toString)
          // the manifest is the protocol's commit point, so it must
          // appear ATOMICALLY (write + rename): a truncated manifest
          // would misclassify the crash state and duplicate rows
          val manifestTmp = new Path(tmp, "._MANIFEST.tmp")
          val out = f.create(manifestTmp, true)
          try out.write(parts.map(_.getPath.toString).mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          require(f.rename(manifestTmp, new Path(tmp, "_MANIFEST")),
            s"compact: manifest rename failed for $tmp")
          parts.foreach { p =>
            require(f.delete(p.getPath, false),
              s"compact: delete of input ${p.getPath} failed")
          }
          moveCompactedIn(f, tmp, st.getPath)
        }
      }
  }

  /** Move a tmp dir's compacted parquet files into the live day dir
    * (Spark part-file names embed a job UUID — no collisions), then
    * drop the tmp dir.
    */
  private def moveCompactedIn(
      f: org.apache.hadoop.fs.FileSystem, tmp: Path, dayDir: Path): Unit = {
    f.mkdirs(dayDir) // idempotent; the move target must exist
    f.listStatus(tmp)
      .filter(_.getPath.getName.endsWith(".parquet")).foreach { nf =>
        val dst = new Path(dayDir, nf.getPath.getName)
        require(f.rename(nf.getPath, dst),
          s"compact: rename ${nf.getPath} -> $dst failed")
      }
    require(f.delete(tmp, true), s"compact: cleanup of $tmp failed")
  }

  /** Finish or discard a crashed compaction (see [[compactTable]]). */
  private def recoverCompact(
      f: org.apache.hadoop.fs.FileSystem, tableRoot: String, tmp: Path): Unit = {
    val manifest = new Path(tmp, "_MANIFEST")
    if (!f.exists(manifest)) {
      // crashed before the manifest was durable: inputs are intact,
      // the rewrite may be partial — discard it
      require(f.delete(tmp, true), s"compact: cleanup of $tmp failed")
      return
    }
    val len = f.getFileStatus(manifest).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(manifest)
    try in.readFully(0, buf) finally in.close()
    val inputs = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map(new Path(_))
    val present = inputs.filter(f.exists(_))
    if (present.size == inputs.size) {
      // crashed after writing the rewrite but before any delete: the
      // inputs are complete, so the rewrite is redundant — discard it
      require(f.delete(tmp, true), s"compact: cleanup of $tmp failed")
    } else {
      // deletes started: the rewrite is the source of truth — finish
      // the deletes and complete the move
      present.foreach(p =>
        require(f.delete(p, false), s"compact: delete of input $p failed"))
      val day = tmp.getName.stripPrefix("_compact_day=")
      moveCompactedIn(f, tmp, new Path(s"$tableRoot/day=$day"))
    }
  }

  /** Raw-data retention (reference _delete_incoming, tsdb.py:412-420): drop
    * incoming rows older than `now - tail - max(period)` — kept exactly
    * long enough for the longest period to finalize. Implemented as a
    * filtered rewrite; at cluster scale the incoming table would be
    * date-partitioned and this becomes a partition drop.
    */
  private def deleteIncoming(nowTs: Double): Unit = {
    val cutoff = nowTs - tail - Periods.maxSeconds(periods)
    val f = fs(incomingPath)
    if (!f.exists(new Path(incomingPath))) return
    if (datePartitioned) {
      // whole days strictly before the cutoff day: drop the directories;
      // only the single boundary-day partition needs a filtering rewrite.
      // The rewrite is a CHECKED swap with recovery ([[recoverRetention]]
      // at sync entry): kept rows land in a hidden _retained_day dir
      // (invisible to readers), the live dir deletes, the retained dir
      // renames in — a crash before the delete leaves the live dir the
      // source of truth (retained copy discarded at recovery), a crash
      // after it leaves the retained dir to be renamed in. The previous
      // unchecked delete-then-rename could strand the kept boundary rows
      // in the hidden dir forever, finalizing buckets with missing data.
      val cutoffDay = math.floor(cutoff / 86400.0).toLong
      val status = f.listStatus(new Path(incomingPath))
      status.filter(_.getPath.getName.startsWith("day=")).foreach { st =>
        val day = st.getPath.getName.stripPrefix("day=").toLong
        if (day < cutoffDay)
          require(f.delete(st.getPath, true),
            s"retention: delete of expired ${st.getPath} failed")
        else if (day == cutoffDay) {
          val part = st.getPath.toString
          val kept = spark.read.schema(TsdbSchema.incoming).parquet(part)
            .filter(col("timestamp") >= cutoff)
          val tmp = s"$incomingPath/_retained_day=$day"
          kept.write.mode("overwrite").parquet(tmp)
          require(f.delete(st.getPath, true),
            s"retention: delete of boundary day $part failed")
          require(f.rename(new Path(tmp), st.getPath),
            s"retention: rename $tmp -> $part failed")
        }
      }
    } else {
      // same checked swap; the sibling _retained dir is outside the
      // read path, and recovery resolves either crash window
      val tmp = incomingPath + "_retained"
      incoming.filter(col("timestamp") >= cutoff)
        .write.mode("overwrite").parquet(tmp)
      require(f.delete(new Path(incomingPath), true),
        s"retention: delete of $incomingPath failed")
      require(f.rename(new Path(tmp), new Path(incomingPath)),
        s"retention: rename $tmp -> $incomingPath failed")
    }
  }

  /** Resolve a crashed [[deleteIncoming]] swap: a retained rewrite
    * whose LIVE counterpart still exists never committed (the live dir
    * is the source of truth — the possibly-partial retained copy is
    * discarded and the next sync's retention recomputes it); one whose
    * live counterpart is GONE committed at the delete — finish the
    * rename. Runs at sync entry beside [[recoverCompactions]], under
    * the same single-writer lock.
    */
  private def recoverRetention(): Unit = {
    val f = fs(incomingPath)
    if (datePartitioned) {
      if (!f.exists(new Path(incomingPath))) return
      f.listStatus(new Path(incomingPath))
        .filter(_.getPath.getName.startsWith("_retained_day="))
        .foreach { t =>
          val day = t.getPath.getName.stripPrefix("_retained_day=")
          val live = new Path(s"$incomingPath/day=$day")
          if (f.exists(live))
            require(f.delete(t.getPath, true),
              s"retention recovery: discard of ${t.getPath} failed")
          else
            require(f.rename(t.getPath, live),
              s"retention recovery: rename ${t.getPath} -> $live failed")
        }
    } else {
      val tmp = new Path(incomingPath + "_retained")
      if (f.exists(tmp)) {
        if (f.exists(new Path(incomingPath)))
          require(f.delete(tmp, true),
            s"retention recovery: discard of $tmp failed")
        else
          require(f.rename(tmp, new Path(incomingPath)),
            s"retention recovery: rename $tmp -> $incomingPath failed")
      }
    }
  }
}

object Tsdb {
  /** Partition day (UTC day number) of an epoch-seconds timestamp. */
  def dayOf(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(ts / 86400).cast(LongType)
}
