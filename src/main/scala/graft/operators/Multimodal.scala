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
    * setup would be paid once per partition, not per row.
    */
  def decodeMetaBatched(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder context would be initialized here
      rows.map(r => fakeDecode(r.doc_id, r.blob))
    }
  }

  /** The same metadata as pure columnar expressions (codegen'd, and the
    * DuckDB-oracle-comparable form of the stub).
    */
  def decodeMetaColumnar(media: DataFrame): DataFrame = {
    val n = octet_length(col("blob")).cast("long")
    // first byte of the payload; the fixtures' blobs are utf-8 text, so
    // ascii-of-decoded == blob(0) for the stub's purposes
    val first = coalesce(expr("CAST(ascii(CAST(blob AS STRING)) AS BIGINT)"), lit(0L))
    media.select(
      col("doc_id"),
      n.as("n_bytes"),
      when(n % 3 === 0, "image").when(n % 3 === 1, "audio").otherwise("video")
        .as("media_kind"),
      (lit(16L) * (n % 40 + 1)).as("width"),
      (lit(16L) * (expr("CAST(octet_length(blob) AS BIGINT) div 7") % 30 + 1)).as("height"),
      ((n + first) % 24 + 1).as("n_frames"))
  }

  /** Sample every `step`-th frame of each media row: bounded explode. */
  def frameSample(meta: DataFrame, step: Int = 4): DataFrame =
    meta.select(col("doc_id"), col("n_frames"),
        explode(expr(s"sequence(0, CAST(n_frames AS INT) - 1, $step)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // deterministic stand-in for a per-frame feature/content hash
        ((col("doc_id") * 31 + col("frame_idx")) % 1000000007L).as("frame_hash"))
}
