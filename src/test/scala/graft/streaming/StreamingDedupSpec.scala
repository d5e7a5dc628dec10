package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming first-seen dedup drops repeats within the watermark window") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "ts")

    val deduped = StreamingDedup.firstSeen(docs, "ts", "10 minutes")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()

    def t(s: Long) = new Timestamp(s * 1000)
    stream.addData((1L, "alpha", t(100)), (2L, "beta", t(101)))
    query.processAllAvailable()
    // same content, later event time -> dropped; new content -> kept
    stream.addData((3L, "alpha", t(200)), (4L, "gamma", t(201)))
    query.processAllAvailable()
    query.stop()

    val kept = spark.sql("select doc_id from dedup_out order by doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 2L, 4L))
  }
}
