package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.core.{Intervals, Periods}
import graft.ingest.LineParser
import graft.operators.Agg

/** The reference's operator inventory (SURVEY.md §2) instantiated over the
  * driver's `events` table, with DuckDB oracles.
  *
  * Mapping of `events` onto the reference's `incoming(path, timestamp,
  * value)` stream (FIXTURES.md §B): path = event_type, timestamp =
  * whole-second epoch of ts (both engines truncate identically), value =
  * value.
  */
object CoreQueries {

  /** `events` → incoming-shaped DataFrame.
    *
    * The fixtures store `ts` as parquet TIMESTAMP(NANOS); under the
    * pinned [[Fixtures.eventsSchema]] it reads as TimestampType and
    * whole seconds come from `unix_timestamp` (truncation toward zero —
    * exact for the positive-epoch domain). The session-level
    * `nanosAsLong` legacy flag stays set for UNPINNED readers of the
    * same files (tools, tests), whose inference would otherwise refuse
    * the nanos annotation.
    */
  def incomingFromEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Fixtures.table(spark, dir, "events").select(
      col("event_type").as("path"),
      unix_timestamp(col("ts")).cast(DoubleType).as("timestamp"),
      col("value"))
  }

  /** DuckDB mirror of [[incomingFromEvents]]. `date_diff('second', …)`
    * truncates toward zero for positive epochs, same as Spark's
    * `unix_timestamp`.
    */
  val incomingCte: String =
    """incoming AS (
      |  SELECT event_type AS path,
      |         date_diff('second', TIMESTAMP '1970-01-01', ts) AS ts_s,
      |         value
      |  FROM events
      |)""".stripMargin

  // ------------------------------------------------------------- rounding

  /** The engine aggregation with float-accumulating columns made
    * hash-comparable across engines: percentiles rounded to 6 decimals
    * (their input order is SORTED, so they are already order-stable),
    * while `avg`/`sum` come from an exact DECIMAL accumulation. Decimal
    * addition is associative, so the result is independent of
    * partition/summation order in BOTH engines — a plain double sum
    * differs in the last ulp depending on order, which flips
    * `round(x, 6)` whenever a bucket's value lands on a rounding
    * boundary (observed at sf0.1: one onehour bucket's avg). The
    * production path ([[Agg.aggregateSeconds]]) keeps reference-parity
    * float semantics; only the cross-engine comparison quantizes.
    *
    * ONE `groupBy` carries the decimal sum beside the other stats —
    * one scan, one exchange, one ObjectHashAggregate (the percentile
    * buffer keeps the aggregate in the object path either way); the
    * `avg` is the decimal sum over the count, so no second aggregation
    * or self-join is ever planned.
    */
  def aggRounded(incoming: DataFrame, seconds: Long): DataFrame =
    incoming
      .groupBy(col("path"), Agg.bucket(col("timestamp"), seconds).as("timestamp"))
      .agg(
        count(col("value")).cast(DoubleType).as("n"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        sum(col("value").cast("decimal(28,10)")).as("_sum_dec"),
        percentile(col("value"), array(lit(0.5), lit(0.9), lit(0.99)))
          .as("_ps"))
      .select(col("path"), col("timestamp"), col("n"), col("min"), col("max"),
        round(col("_sum_dec").cast(DoubleType) / col("n"), 6).as("avg"),
        round(col("_sum_dec").cast(DoubleType), 6).as("sum"),
        round(col("_ps").getItem(0), 6).as("p50"),
        round(col("_ps").getItem(1), 6).as("p90"),
        round(col("_ps").getItem(2), 6).as("p99"))

  /** The order-proof avg/sum fragments of [[aggRounded]]'s DuckDB mirror. */
  val avgSumSql: String =
    """round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / count(value), 6) AS "avg",
      |       round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) AS "sum",""".stripMargin

  /** DuckDB mirror of [[aggRounded]] as a CTE body over `incoming`. */
  def aggSql(seconds: Long): String =
    s"""SELECT path,
       |       CAST((ts_s // $seconds) * $seconds AS DOUBLE) AS "timestamp",
       |       CAST(count(value) AS DOUBLE) AS "n",
       |       min(value) AS "min",
       |       max(value) AS "max",
       |       $avgSumSql
       |       round(quantile_cont(value, 0.5), 6) AS "p50",
       |       round(quantile_cont(value, 0.9), 6) AS "p90",
       |       round(quantile_cont(value, 0.99), 6) AS "p99"
       |FROM incoming
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------- fixed time points
  // All within the events tables' Jan 2024 span at every scale factor.
  private val jan8: Long = 1704672000L   // 2024-01-08 00:00:00 UTC
  private val jan15: Long = 1705276800L  // 2024-01-15 00:00:00 UTC

  // ------------------------------------------------------------- queries

  /** S1/S6 — the incoming scan itself (schema + mapping parity). */
  private val qIncoming = QueryDef(
    "q01_incoming_scan",
    (s, dir) => incomingFromEvents(s, dir)
      .orderBy("path", "timestamp", "value"),
    Some(
      s"""WITH $incomingCte
         |SELECT path, CAST(ts_s AS DOUBLE) AS "timestamp", value
         |FROM incoming
         |ORDER BY path, "timestamp", value""".stripMargin))

  /** A1–A4 — the full 8-stat bucketed aggregation, one per period width. */
  private def qAgg(name: String, seconds: Long) = QueryDef(
    name,
    (s, dir) => aggRounded(incomingFromEvents(s, dir), seconds)
      .orderBy("path", "timestamp"),
    Some(
      s"""WITH $incomingCte
         |${aggSql(seconds)}
         |ORDER BY path, "timestamp"""".stripMargin))

  /** S6/P1-P3/O1 — get_metric: one path, one stat, closed interval,
    * ordered by time (tsdb.py:116-140). BETWEEN inclusive on both ends,
    * matching the reference's read path.
    */
  private val qGetMetric = QueryDef(
    "q05_get_metric",
    (s, dir) => {
      // raw-domain pre-filter (bucket-aligned bounds ⇒ provably identical
      // result) so the path + time predicates reach the parquet scan
      val pre = incomingFromEvents(s, dir).filter(
        col("path") === "error" &&
          col("timestamp") >= jan8 && col("timestamp") < jan15 + 10)
      aggRounded(pre, 10)
        .filter(col("timestamp").between(jan8.toDouble, jan15.toDouble))
        .select(col("timestamp"), col("p50"))
        .orderBy("timestamp")
    },
    Some(
      s"""WITH $incomingCte,
         |agg AS (${aggSql(10)})
         |SELECT "timestamp", "p50"
         |FROM agg
         |WHERE path = 'error' AND "timestamp" BETWEEN $jan8 AND $jan15
         |ORDER BY "timestamp"""".stripMargin))

  /** O3/P4 — list_metrics: union-distinct of paths over all 6 period
    * views (tsdb.py:142-152). Computed as ONE distinct over the incoming
    * paths instead of the reference's literal 6-leg union: each leg is
    * `aggregate(inc, p).select("path")` — a pure `groupBy(path, bucket)`
    * that never drops a group or invents a path, so every leg's path set
    * IS the incoming path set, and union-distinct of six identical sets
    * is that set. The literal shape cost 6 full scans + 6 aggregation
    * exchanges to produce rows the final distinct collapsed anyway
    * (guide §2.3/§2.4: don't compute what you throw away); the oracle
    * still runs the 6-leg SQL and pins the equivalence.
    */
  private val qListMetrics = QueryDef(
    "q06_list_metrics",
    (s, dir) => incomingFromEvents(s, dir)
      .select("path")
      .distinct()
      .orderBy("path"),
    Some {
      val legs = Periods.all.map(p =>
        s"""SELECT DISTINCT path FROM (
           |  SELECT path, (ts_s // ${p.seconds}) * ${p.seconds} AS b
           |  FROM incoming GROUP BY 1, 2)""".stripMargin)
      s"""WITH $incomingCte
         |SELECT path FROM (
         |${legs.mkString("\n", "\nUNION\n", "\n")})
         |ORDER BY path""".stripMargin
    })

  /** J1/A5 — the high-water-mark join: distinct incoming paths LEFT JOIN
    * per-path max finalized bucket (tsdb.py:354-364). The aggregate side is
    * restricted to buckets before Jan 8 to model a table synced through
    * that point.
    */
  private val qHwmJoin = QueryDef(
    "q07_hwm_join",
    (s, dir) => {
      val inc = incomingFromEvents(s, dir)
      val agg = Agg.aggregateSeconds(
        inc.filter(col("timestamp") < jan8), 60).select("path", "timestamp")
      inc.select("path").distinct()
        .join(
          agg.groupBy("path").agg(max(col("timestamp")).as("last_final")),
          Seq("path"), "left")
        .select(col("path"), col("last_final"),
          coalesce(col("last_final") + 60, lit(0.0)).as("final_start"))
        .orderBy("path")
    },
    Some(
      s"""WITH $incomingCte,
         |agg AS (
         |  SELECT path, CAST((ts_s // 60) * 60 AS DOUBLE) AS "timestamp"
         |  FROM incoming WHERE ts_s < $jan8 GROUP BY 1, 2),
         |hwm AS (
         |  SELECT p.path, max(a."timestamp") AS last_final
         |  FROM (SELECT DISTINCT path FROM incoming) p
         |  LEFT JOIN agg a ON p.path = a.path
         |  GROUP BY p.path)
         |SELECT path, last_final,
         |       coalesce(last_final + 60, 0.0) AS final_start
         |FROM hwm
         |ORDER BY path""".stripMargin))

  /** W5 — one sync step end-to-end: hwm join → per-path half-open final
    * range [final_start, final_end) → recomputed final buckets
    * (tsdb.py:339-410, set-oriented per SURVEY.md §3.2; half-open per
    * §2.9 Q2). Constants: now = Jan 15, tail = 60 s, period = tensecond,
    * previously synced through Jan 8.
    */
  private val qSyncFinal = {
    val tail = 60L
    val finalEnd = (jan15 - tail) / 10 * 10  // 1705276740
    QueryDef(
      "q08_sync_final_range",
      (s, dir) => {
        val inc = incomingFromEvents(s, dir)
        val prev = Agg.aggregateSeconds(
          inc.filter(col("timestamp") < jan8), 10).select("path", "timestamp")
        val hwm = inc.select("path").distinct()
          .join(
            prev.groupBy("path").agg(max(col("timestamp")).as("last_final")),
            Seq("path"), "left")
          .select(col("path"),
            coalesce(col("last_final") + 10, lit(0.0)).as("final_start"))
        val newFinals = inc.join(broadcast(hwm), Seq("path"))
          .filter(col("timestamp") >= col("final_start") &&
            col("timestamp") < lit(finalEnd.toDouble))
          .select("path", "timestamp", "value")
        aggRounded(newFinals, 10).orderBy("path", "timestamp")
      },
      Some(
        s"""WITH $incomingCte,
           |prev AS (
           |  SELECT path, (ts_s // 10) * 10 AS b
           |  FROM incoming WHERE ts_s < $jan8 GROUP BY 1, 2),
           |hwm AS (
           |  SELECT i.path, max(p.b) AS last_final
           |  FROM (SELECT DISTINCT path FROM incoming) i
           |  LEFT JOIN prev p ON i.path = p.path
           |  GROUP BY i.path),
           |ranges AS (
           |  SELECT path, coalesce(last_final + 10, 0) AS final_start
           |  FROM hwm)
           |SELECT a.path,
           |       CAST((a.ts_s // 10) * 10 AS DOUBLE) AS "timestamp",
           |       CAST(count(a.value) AS DOUBLE) AS "n",
           |       min(a.value) AS "min",
           |       max(a.value) AS "max",
           |       round(CAST(sum(CAST(a.value AS DECIMAL(28,10))) AS DOUBLE)
           |             / count(a.value), 6) AS "avg",
           |       round(CAST(sum(CAST(a.value AS DECIMAL(28,10))) AS DOUBLE), 6) AS "sum",
           |       round(quantile_cont(a.value, 0.5), 6) AS "p50",
           |       round(quantile_cont(a.value, 0.9), 6) AS "p90",
           |       round(quantile_cont(a.value, 0.99), 6) AS "p99"
           |FROM incoming a JOIN ranges r ON a.path = r.path
           |WHERE a.ts_s >= r.final_start AND a.ts_s < $finalEnd
           |GROUP BY 1, 2
           |ORDER BY a.path, "timestamp"""".stripMargin))
  }

  /** W7 — retention: rows of incoming surviving
    * `delete where timestamp < now - tail - max(period)` (tsdb.py:412-420)
    * at now = Jan 15.
    */
  private val qRetention = {
    val cutoff = jan15 - 60 - 86400
    QueryDef(
      "q09_retention",
      (s, dir) => incomingFromEvents(s, dir)
        .filter(col("timestamp") >= cutoff)
        .orderBy("path", "timestamp", "value"),
      Some(
        s"""WITH $incomingCte
           |SELECT path, CAST(ts_s AS DOUBLE) AS "timestamp", value
           |FROM incoming
           |WHERE ts_s >= $cutoff
           |ORDER BY path, "timestamp", value""".stripMargin))
  }

  /** S4/F5 — wire-line round trip: encode each event as the daemon's
    * `"path value timestamp"` line (note wire order: value before
    * timestamp, daemon.py:16-30), then parse back. Output compares the
    * parsed doubles (string forms round-trip in both engines).
    */
  private val qParseLines = QueryDef(
    "q10_parse_lines",
    (s, dir) => {
      val lines = incomingFromEvents(s, dir).select(
        concat_ws(" ",
          col("path"),
          col("value").cast(StringType),
          col("timestamp").cast(LongType).cast(StringType)).as("line"))
      LineParser.parse(lines).orderBy("path", "timestamp", "value")
    },
    Some(
      s"""WITH $incomingCte,
         |lines AS (
         |  SELECT path || ' ' || value::VARCHAR || ' ' || ts_s::VARCHAR AS line
         |  FROM incoming)
         |SELECT split_part(line, ' ', 1) AS path,
         |       CAST(split_part(line, ' ', 3) AS DOUBLE) AS "timestamp",
         |       CAST(split_part(line, ' ', 2) AS DOUBLE) AS "value"
         |FROM lines
         |ORDER BY path, "timestamp", "value"""".stripMargin))

  /** W3 — the `intervals()` finalization algebra over the reference's
    * 16-case spec table (tests/test_smalltsdb.py:85-118) plus never-synced
    * cases, evaluated by the pure Scala port and mirrored by the closed-form
    * SQL.
    */
  private val qIntervals = {
    // (period, tail, now, lastFinal) — tests/test_smalltsdb.py:86-105
    val cases: Seq[(Long, Long, Long, Option[Long])] = Seq(
      (10L, 30L, 102L, Some(30L)), (10L, 30L, 102L, Some(50L)),
      (10L, 30L, 102L, Some(60L)), (10L, 30L, 109L, Some(60L)),
      (10L, 30L, 110L, Some(60L)),
      (60L, 30L, 102L, Some(0L)), (60L, 30L, 119L, Some(0L)),
      (60L, 30L, 120L, Some(0L)), (60L, 30L, 149L, Some(0L)),
      (60L, 30L, 150L, Some(0L)), (60L, 30L, 150L, Some(60L)),
      (300L, 60L, 1499L, Some(0L)), (300L, 60L, 1499L, Some(900L)),
      (300L, 60L, 1500L, Some(900L)), (300L, 60L, 1559L, Some(900L)),
      (300L, 60L, 1560L, Some(900L)),
      // never-synced (lastFinal = None ⇒ sync from 0, tsdb.py:260-261)
      (10L, 30L, 102L, None), (86400L, 60L, 1705276800L, None))
    QueryDef(
      "q11_intervals",
      (s, _) => {
        import s.implicits._
        cases.map { case (p, t, n, lf) =>
          val r = Intervals.intervals(p, t, n.toDouble, lf.map(_.toDouble))
          (p, t, n, lf,
            r.finalInterval.start.toLong, r.finalInterval.end.toLong,
            r.partialInterval.start.toLong, r.partialInterval.end.toLong)
        }.toDF("period", "tail", "now", "last_final",
            "final_start", "final_end", "partial_start", "partial_end")
          .orderBy("period", "tail", "now", "last_final")
      },
      Some {
        val rows = cases.map { case (p, t, n, lf) =>
          s"($p, $t, $n, ${lf.map(_.toString).getOrElse("NULL")})"
        }.mkString(",\n  ")
        s"""WITH cases("period", "tail", "now", "last_final") AS (VALUES
           |  $rows),
           |c AS (
           |  SELECT "period"::BIGINT AS "period", "tail"::BIGINT AS "tail",
           |         "now"::BIGINT AS "now", "last_final"::BIGINT AS "last_final"
           |  FROM cases)
           |SELECT "period", "tail", "now", "last_final",
           |       coalesce("last_final", -"period") + "period" AS "final_start",
           |       (("now" - "tail") // "period") * "period" AS "final_end",
           |       (("now" - "tail") // "period") * "period" AS "partial_start",
           |       (("now" // "period") + 1) * "period" AS "partial_end"
           |FROM c
           |ORDER BY "period", "tail", "now", "last_final" NULLS FIRST""".stripMargin
      })
  }

  /** Flagship TPC-H-style pricing summary over lineitem — exercises the
    * same HashAggregate partial/final shape at the driver's bench scale.
    * Large double sums are computed in exact DECIMAL arithmetic on both
    * sides (summation-order-proof), then cast to double.
    */
  private val qFlagship = QueryDef(
    "q1_agg",
    (s, dir) => {
      val li = Fixtures.table(s, dir, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast(DoubleType).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast(DoubleType) /
            count(lit(1))).as("avg_qty"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast(DoubleType) /
            count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |             AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Multi-join star query (TPC-H Q5 shape): revenue per nation for one
    * region and a date window. The dimension chain
    * region→nation→customer broadcasts against the fact-side
    * orders⋈lineitem join; sums run in exact DECIMAL (order-proof).
    */
  private val qJoinRevenue = QueryDef(
    "q12_join_revenue",
    (s, dir) => {
      def t(n: String) = {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        Fixtures.table(s, dir, n)
      }
      val dims = t("customer")
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("c_custkey"), col("n_name"))
      val ordersInWindow = t("orders")
        .filter(expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01' AND " +
          "o_orderdate < TIMESTAMP_NTZ '1998-01-01'"))
        .select("o_orderkey", "o_custkey")
      t("lineitem")
        .join(ordersInWindow, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(
      """SELECT n_name,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |             AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    qIncoming,
    qAgg("q02_agg_tensecond", 10),
    qAgg("q03_agg_oneminute", 60),
    qAgg("q04_agg_onehour", 3600),
    qGetMetric,
    qListMetrics,
    qHwmJoin,
    qSyncFinal,
    qRetention,
    qParseLines,
    qIntervals,
    qJoinRevenue,
    qFlagship)
}
