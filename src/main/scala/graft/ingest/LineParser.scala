package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Graphite/statsd-style line-protocol decode (reference daemon.py:16-30).
  *
  * Wire format is `"path value timestamp"` — note the wire order is
  * (path, VALUE, TIMESTAMP); the parser reorders to the storage order
  * (path, timestamp, value). Both numerics are parsed as doubles.
  */
object LineParser {

  class ParseException(msg: String) extends IllegalArgumentException(msg)

  /** Lenient columnar parse: malformed lines yield null fields.
    * Whitespace-splitting matches Python's argless `str.split()`
    * (daemon.py:24: split on any whitespace run, ignore leading/trailing).
    * `try_cast` (not `cast`) so a bad numeric nulls the field instead of
    * throwing under Spark 4's default ANSI mode.
    */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val f = split(trim(col(lineCol)), "\\s+")
    lines.select(f.as("_f"))
      .select(
        when(size(col("_f")) === 3, col("_f").getItem(0)).as("path"),
        when(size(col("_f")) === 3, expr("try_cast(_f[2] AS DOUBLE)")).as("timestamp"),
        when(size(col("_f")) === 3, expr("try_cast(_f[1] AS DOUBLE)")).as("value"))
  }

  /** A parsed micro-batch with its per-batch counts, gathered in ONE
    * parse pass: the parsed rows are materialized once
    * (`localCheckpoint`), then counted and inserted from the
    * materialization — the parse never runs twice.
    *
    * @param nonSelf good rows whose path does NOT start with the
    *                daemon's self-metric prefix (all good rows when no
    *                prefix) — the reference's `non_self_count`
    *                (daemon.py:176-178).
    */
  final case class ParsedBatch(rows: DataFrame, total: Long, bad: Long, nonSelf: Long)

  def parseCounted(
      lines: DataFrame,
      lineCol: String = "line",
      selfPrefix: Option[String] = None): ParsedBatch = {
    val exploded = lines
      .select(explode(split(col(lineCol), "\n")).as("line"))
      .filter(trim(col("line")) =!= "")
    val parsed = parse(exploded).localCheckpoint(true)
    val isBad =
      col("path").isNull || col("timestamp").isNull || col("value").isNull
    val isSelf = selfPrefix match {
      case Some(p) => col("path").startsWith(p + ".")
      case None => lit(false)
    }
    val counts = parsed.select(
      count(lit(1)).as("total"),
      count_if(isBad).as("bad"),
      count_if(!isBad && !isSelf).as("non_self")).head()
    ParsedBatch(parsed, counts.getLong(0), counts.getLong(1), counts.getLong(2))
  }

  /** Batch-atomic parse (SURVEY.md §2.9 Q3): the reference drops the WHOLE
    * datagram/connection batch when any one line fails to parse
    * (daemon.py:39-47, ValueError caught per-request). Throwing here from
    * inside `foreachBatch` reproduces that: the batch is rejected as a
    * unit.
    */
  def parseStrict(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val pb = parseCounted(lines, lineCol)
    if (pb.bad > 0)
      throw new ParseException("malformed line(s) in batch; batch dropped")
    pb.rows
  }
}
