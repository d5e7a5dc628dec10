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
    */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val f = split(trim(col(lineCol)), "\\s+")
    lines.select(
      when(size(f) === 3, f.getItem(0)).as("path"),
      when(size(f) === 3, f.getItem(2).cast(DoubleType)).as("timestamp"),
      when(size(f) === 3, f.getItem(1).cast(DoubleType)).as("value"))
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
