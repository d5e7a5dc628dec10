package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("batched (mapPartitions) decode agrees with the columnar decode") {
    implicit val s = spark
    val typed = Multimodal.decodeMetaBatched(media.as[Multimodal.MediaRow])
      .collect().sortBy(_.doc_id)
    val columnar = Multimodal.decodeMetaColumnar(media)
      .orderBy("doc_id").collect()
      .map(r => Multimodal.MediaMeta(r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(typed.sameElements(columnar))
  }

  test("blob column is real binary and round-trips the text") {
    val r = media.limit(1).collect()(0)
    assert(r.get(1).isInstanceOf[Array[Byte]])
  }

  test("frame sampling is bounded by n_frames and stepped") {
    val meta = Multimodal.decodeMetaColumnar(media)
    val frames = Multimodal.frameSample(meta, step = 4)
    val joined = frames.join(meta.select("doc_id", "n_frames"), "doc_id")
    import org.apache.spark.sql.functions._
    assert(joined.filter(col("frame_idx") >= col("n_frames")).count() == 0)
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() == 0)
  }
}
