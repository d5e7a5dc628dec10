package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Pinned schemas for the driver's deterministic fixture tables.
  *
  * Every `spark.read.parquet(fixture)` without a user schema runs a
  * distributed schema-inference job before the query proper — one
  * scheduled Spark job per fixture read per query, pure fixed overhead
  * (the suite reads `documents` alone ~70 times per bench pass). The
  * generator's schemas are identical at every scale factor (verified
  * sf0.001/sf0.01/sf0.1), so the readers pin them. Drift detection is
  * partial by Spark's user-schema contract: a TYPE-drifted column fails
  * loudly at scan time, but a column MISSING from the files silently
  * reads as nulls (the oracle's row hashes are what catch that case —
  * every pinned column is exercised by at least one hashed query).
  */
private[queries] object Fixtures {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  private val byName: Map[String, StructType] = Map(
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema,
    "events" -> eventsSchema,
    "lineitem" -> lineitemSchema,
    "orders" -> ordersSchema,
    "customer" -> customerSchema,
    "nation" -> nationSchema,
    "region" -> regionSchema)

  /** Read `<dir>/<table>.parquet` under its pinned schema (inference
    * job skipped); tables without a pinned schema read as before.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    byName.get(name) match {
      case Some(s) => spark.read.schema(s).parquet(s"$dir/$name.parquet")
      case None => spark.read.parquet(s"$dir/$name.parquet")
    }
}
