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

  test("resize plan: aspect-preserving fit inside the box, never upscales") {
    import org.apache.spark.sql.functions._
    val plan = Multimodal.resizePlan(Multimodal.decodeMetaColumnar(media))
    assert(plan.filter(col("out_w") > 224 || col("out_h") > 224).count() == 0)
    assert(plan.filter(
      col("out_w") > col("width") || col("out_h") > col("height")).count() == 0)
    // aspect ratio preserved to rounding: out_w/out_h within 1 px of
    // width/height scaled by the same factor
    val bad = plan.filter(
      abs(col("out_w") * col("height") - col("out_h") * col("width"))
        > (col("width") + col("height"))).count()
    assert(bad == 0)
  }

  test("batched resize agrees with the plan and truncates payload by area") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    val resized = Multimodal.resizeBatched(media.as[Multimodal.MediaRow])
      .collect().map(r => r.doc_id -> r).toMap
    val plan = Multimodal.resizePlan(Multimodal.decodeMetaColumnar(media))
      .collect()
    plan.foreach { r =>
      val got = resized(r.getLong(0))
      assert(got.out_w == r.getLong(3) && got.out_h == r.getLong(4))
      assert(got.blob.length >= 1)
    }
  }

  test("features: dim-length vectors in [0,1), equal blobs collide, changed bytes diverge") {
    import spark.implicits._
    val df = Seq((0L, "same text"), (1L, "same text"), (2L, "same texU"))
      .toDF("doc_id", "text")
    val feats = Multimodal.features(Multimodal.mediaFromDocuments(df), dim = 8)
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    assert(feats.forall(f => f.length == 8 && f.forall(x => x >= 0.0 && x < 1.0)))
    assert(feats(0) == feats(1))
    assert(feats(0) != feats(2))
  }

  test("decode parity holds OUTSIDE ascii and for null payloads: the " +
    "columnar first-byte matches the batched stub's blob(0) & 0xff on " +
    "multi-byte UTF-8, and a null blob is dropped by BOTH forms") {
    implicit val s = spark
    // 'Ä' = UTF-8 bytes C3 84: first byte 195, but the first
    // CHARACTER'S codepoint is 196 — the old ascii-of-decoded columnar
    // form diverged from the batched stub here
    val docs = Seq((1L, "Ämulti-byte head"), (2L, "ascii head"),
      (3L, null)).toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(docs)
    val colr = Multimodal.decodeMetaColumnar(m)
      .select("doc_id", "n_bytes", "media_kind", "width", "height",
        "n_frames")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val bat = Multimodal.decodeMetaBatched(
        m.as[Multimodal.MediaRow])
      .collect().map(mm => (mm.doc_id, mm.n_bytes, mm.media_kind,
        mm.width, mm.height, mm.n_frames)).toSet
    assert(colr == bat, s"columnar=$colr batched=$bat")
    assert(colr.map(_._1) == Set(1L, 2L), "null blob must drop, not decode")
  }

  test("decodeMetaBatched amortizes decoder setup per PARTITION: a " +
    "stateful counting decoder is constructed once per partition and " +
    "invoked once per row") {
    implicit val spark2: org.apache.spark.sql.SparkSession = spark
    val setups = spark2.sparkContext.longAccumulator("decoder-setups")
    val calls = spark2.sparkContext.longAccumulator("decoder-calls")
    val nParts = 4
    val docs = (0L until 40L).map(i => (i, s"payload number $i"))
      .toDF("doc_id", "text").repartition(nParts)
    val media = Multimodal.mediaFromDocuments(docs)
    // the factory runs per partition (real codec: bind native context
    // here); the returned function closes over that per-partition
    // state — the counter stands in for it
    val decoder: () => (Long, Array[Byte]) => Multimodal.MediaMeta =
      () => {
        setups.add(1L)
        val perPartitionState = new java.util.concurrent.atomic.AtomicLong()
        (id, blob) => {
          calls.add(1L)
          perPartitionState.incrementAndGet()
          Multimodal.fakeDecode(id, blob)
        }
      }
    val got = Multimodal.decodeMetaBatched(
      media.as[Multimodal.MediaRow], decoder).collect()
    assert(got.length == 40)
    assert(calls.value == 40L, s"decode ran ${calls.value} times")
    assert(setups.value == nParts.toLong,
      s"decoder setup ran ${setups.value} times for $nParts partitions — " +
        "the iterator contract must amortize setup per partition")
    // and the injected decoder's OUTPUT is what lands in the Dataset
    assert(got.map(_.doc_id).toSet == (0L until 40L).toSet)
  }
}
