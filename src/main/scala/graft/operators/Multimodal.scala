package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, with the decode boundary stubbed deterministically (no
  * image/audio codecs exist in this environment).
  *
  * The Spark-side shape is the real thing:
  *  - media rows are `(id, blob: binary)` — at 100 TB these live in their
  *    own parquet/row-group-aligned table, partitioned by content shard;
  *    metadata extraction is a narrow per-partition map (no shuffle).
  *  - [[decodeMetaBatched]] is the executor-side batch decode boundary —
  *    the Scala analogue of a vectorized python `mapInPandas` decode: an
  *    iterator→iterator `mapPartitions` so a real codec could amortize
  *    per-batch setup (model load, decoder context) across the partition.
  *  - frame sampling explodes a bounded `sequence`, keeping output size
  *    linear in sampled frames, not media duration.
  *
  * STUB: `fakeDecode` stands in for the real byte decode. It derives
  * metadata deterministically from the blob bytes so tests and oracles are
  * exact. A production build replaces ONLY that function.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, blob: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, media_kind: String,
      width: Long, height: Long, n_frames: Long)

  /** documents → a media table: utf-8 bytes of `text` standing in for an
    * encoded media payload (the fixtures carry no real media).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** STUB decode — deterministic fake: metadata derived from byte count
    * and first byte. Replace with a real codec at the same signature.
    */
  def fakeDecode(id: Long, blob: Array[Byte]): MediaMeta = {
    val n = blob.length.toLong
    val first = if (blob.nonEmpty) (blob(0) & 0xffL) else 0L
    val kind = (n % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(id, n, kind,
      width = 16L * (n % 40 + 1),
      height = 16L * ((n / 7) % 30 + 1),
      n_frames = (n + first) % 24 + 1)
  }

  /** Batched decode at the executor: iterator→iterator so real decoder
    * setup is paid once per partition, not per row. `decoder` is the
    * per-partition FACTORY — it runs inside `mapPartitions`, exactly
    * once per partition, and the function it returns runs per row;
    * a real codec binds its native context in the factory and swaps
    * nothing else (the default binds the deterministic
    * [[fakeDecode]] stub). The factory (not the decode function it
    * builds) must be serializable — it ships in the task closure.
    */
  def decodeMetaBatched(
      media: Dataset[MediaRow],
      decoder: () => (Long, Array[Byte]) => MediaMeta =
        () => fakeDecode(_, _))(
      implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // the per-partition decoder context: initialized HERE, once
      val decode = decoder()
      // A null payload is NO MEDIA: dropped, the same judgment the
      // columnar form applies — the stub used to NPE here while the
      // columnar path fabricated a 'video' row of null metadata
      rows.filter(_.blob != null).map(r => decode(r.doc_id, r.blob))
    }
  }

  /** The same metadata as pure columnar expressions (codegen'd, and the
    * DuckDB-oracle-comparable form of the stub).
    */
  def decodeMetaColumnar(media: DataFrame): DataFrame = {
    val n = octet_length(col("blob")).cast("long")
    // the payload's first BYTE, unsigned — fakeDecode's `blob(0) &
    // 0xff` exactly. The previous ascii-of-decoded-string form read
    // the first CHARACTER'S CODEPOINT, which diverges from the
    // batched stub on any blob whose text starts outside ASCII
    // (e.g. 'Ä' = bytes C3 84: first byte 195, codepoint 196) — the
    // all-ASCII fixtures were the only thing hiding the mismatch
    val first = coalesce(
      expr("CAST(conv(hex(substring(blob, 1, 1)), 16, 10) AS BIGINT)"),
      lit(0L))
    media
      // a null payload is no media — parity with the batched form
      .filter(col("blob").isNotNull)
      .select(
        col("doc_id"),
        n.as("n_bytes"),
        when(n % 3 === 0, "image").when(n % 3 === 1, "audio").otherwise("video")
          .as("media_kind"),
        (lit(16L) * (n % 40 + 1)).as("width"),
        (lit(16L) * (expr("CAST(octet_length(blob) AS BIGINT) div 7") % 30 + 1)).as("height"),
        ((n + first) % 24 + 1).as("n_frames"))
  }

  /** Aspect-preserving resize PLAN (never upscales): the metadata half
    * of a resize — target dims from a bounding box, computed as pure
    * codegen'd arithmetic so it is DuckDB-oracle-comparable. The byte
    * transform itself is the stubbed decode boundary
    * ([[resizeBatched]]).
    */
  def resizePlan(meta: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    meta.select(col("doc_id"), col("width"), col("height"),
      greatest(floor(col("width") * scale), lit(1)).cast("long").as("out_w"),
      greatest(floor(col("height") * scale), lit(1)).cast("long").as("out_h"))
  }

  final case class ResizedMedia(
      doc_id: Long, out_w: Long, out_h: Long, blob: Array[Byte])

  /** Batched resize at the executor — iterator→iterator like
    * [[decodeMetaBatched]], so a real image library would amortize its
    * context per partition. STUB byte transform: payload truncated
    * proportional to the area ratio (deterministic, shape-checkable);
    * a production build swaps only the body.
    */
  def resizeBatched(
      media: Dataset[MediaRow], maxW: Int = 224, maxH: Int = 224)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder/scaler context would be initialized here
      rows.map { r =>
        val m = fakeDecode(r.doc_id, r.blob)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
        val ow = math.max(1L, math.floor(m.width * scale).toLong)
        val oh = math.max(1L, math.floor(m.height * scale).toLong)
        val keep = math.max(1,
          (r.blob.length * (ow * oh).toDouble / (m.width * m.height)).toInt)
        ResizedMedia(r.doc_id, ow, oh, r.blob.take(keep))
      }
    }
  }

  /** Per-media feature extraction (stub embedding): `dim` deterministic
    * doubles in [0, 1) derived from the full payload's content hash
    * (codegen'd [[graft.functions.PolyHash]] over the bytes, then one
    * universal hash per dimension). Content-sensitive — equal blobs get
    * equal features, any byte change perturbs every dimension — and
    * exactly reproducible in the DuckDB oracle. A real extractor
    * (CLIP/wav2vec/...) replaces this projection at the same schema:
    * `(doc_id, features: array<double>)`.
    */
  def features(media: DataFrame, dim: Int = 8): DataFrame = {
    import graft.functions.TextHash
    val withHash = media.withColumn("chash",
      graft.functions.PolyHash(col("blob").cast("string")))
    val feats = (0 until dim).map { j =>
      round(expr(TextHash.universalHashSql("chash", j)).cast("double")
        / TextHash.P, 6)
    }
    withHash.select(col("doc_id"), array(feats: _*).as("features"))
  }

  /** Sample every `step`-th frame of each media row: bounded explode. */
  def frameSample(meta: DataFrame, step: Int = 4): DataFrame = {
    // loud precondition like every sibling's width/stride checks —
    // step <= 0 otherwise dies deep in execution as an opaque
    // 'Illegal sequence boundaries' task failure
    require(step >= 1, s"step must be >= 1, got $step")
    meta.select(col("doc_id"), col("n_frames"),
        explode(expr(s"sequence(0, CAST(n_frames AS INT) - 1, $step)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // deterministic stand-in for a per-frame feature/content hash
        ((col("doc_id") * 31 + col("frame_idx")) % 1000000007L).as("frame_hash"))
  }
}
