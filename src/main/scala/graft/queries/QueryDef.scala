package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation over the parquet
  * tables in a scale-factor dir, plus (when SQL-expressible) the equivalent
  * DuckDB oracle SQL over the same tables.
  *
  * Determinism contract (the driver hash-compares values): every query ends
  * with a total ORDER BY; aggregate columns that involve floating
  * accumulation are rounded to 6 decimals ON BOTH SIDES (or computed in
  * exact decimal arithmetic where magnitudes are large); column names are
  * aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
