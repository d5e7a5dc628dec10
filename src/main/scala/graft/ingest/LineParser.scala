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

  /** Batch-atomic parse (SURVEY.md §2.9 Q3): the reference drops the WHOLE
    * datagram/connection batch when any one line fails to parse
    * (daemon.py:39-47, ValueError caught per-request). Throwing here from
    * inside `foreachBatch` reproduces that: the batch is rejected as a
    * unit.
    */
  def parseStrict(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val exploded = lines
      .select(explode(split(col(lineCol), "\n")).as("line"))
      .filter(trim(col("line")) =!= "")
    val parsed = parse(exploded)
    val bad = parsed.filter(
      col("path").isNull || col("timestamp").isNull || col("value").isNull)
    if (!bad.isEmpty)
      throw new ParseException("malformed line(s) in batch; batch dropped")
    parsed
  }
}
