package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Doc

/** Multimodal column plumbing (builder-prompt mandate): media payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature-extraction
  * runs batched inside mapPartitions (the Scala analog of `mapInPandas` batch
  * processing — one codec invocation per batch, not per row).
  *
  * The codec itself is a DETERMINISTIC STUB (this container ships no image/
  * audio libraries): `stubFetch` synthesizes payload bytes from the media_ref
  * and `stubDecode` derives features arithmetically. Everything around the
  * stub — schema, lineage, partitioning, batch shape, typed Datasets — is the
  * real production plumbing; swapping in a real codec changes only the two
  * stub bodies.
  */
object Media {

  /** One media payload: doc provenance + opaque bytes + coarse kind. */
  case class MediaRow(doc_id: String, media_ref: String, kind: String, bytes: Array[Byte])

  /** Typed decode output: metadata + a small feature embedding. */
  case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      fingerprint: Long,
      embedding: Array[Float])

  /** media spans -> payload rows. Fetch is stubbed: bytes are a deterministic
    * function of the ref (in production: object-store get by media_ref).
    */
  def mediaTable(docs: Dataset[Doc]): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      d.spans.filter(_.kind == "media").map { s =>
        MediaRow(d.doc_id, s.media_ref, kindOf(s.media_ref), stubFetch(s.media_ref))
      }
    }
  }

  private def kindOf(ref: String): String = (math.abs(ref.hashCode) % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  /** STUB — deterministic pseudo-payload (no object store in the sandbox). */
  private[pipeline] def stubFetch(ref: String): Array[Byte] = {
    val n = 64 + (math.abs(ref.hashCode) % 192)
    val out = new Array[Byte](n)
    var h = ref.foldLeft(1125899906842597L)((acc, c) => acc * 31 + c)
    var i = 0
    while (i < n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = (h >>> 56).toByte
      i += 1
    }
    out
  }

  /** Batched feature extraction: `batchSize` rows per codec call (the batch
    * shape a real decoder / GPU featurizer needs). The per-batch call is
    * `decodeBatch` — the integration point for a real codec.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** STUB decode — one invocation per batch; deterministic arithmetic stands in
    * for the codec. Real implementation: hand `batch.map(_.bytes)` to the
    * decoder in one call, zip results back.
    */
  private[pipeline] def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      var fp = 0L
      var i = 0
      while (i < m.bytes.length) { fp = (fp * 31 + (m.bytes(i) & 0xff)) % 1000000007L; i += 1 }
      val emb = Array.tabulate(8)(j => (((fp >> (j * 4)) & 0xf).toFloat - 7.5f) / 7.5f)
      MediaFeatures(
        doc_id = m.doc_id,
        media_ref = m.media_ref,
        kind = m.kind,
        n_bytes = m.bytes.length.toLong,
        width = (fp % 640).toInt,
        height = (fp % 480).toInt,
        fingerprint = fp,
        embedding = emb)
    }

  /** Resized variant of a feature row: real plumbing (typed output, batched
    * mapPartitions), stub arithmetic for the resampling itself (no image libs
    * in this container). A real implementation swaps only `resizeOne`.
    */
  case class ResizedMedia(
      doc_id: String, media_ref: String, kind: String,
      width: Int, height: Int, fingerprint: Long)

  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import features.sparkSession.implicits._
    features.mapPartitions(_.map(f => resizeOne(f, maxW, maxH)))
  }

  private def resizeOne(f: MediaFeatures, maxW: Int, maxH: Int): ResizedMedia = {
    // STUB: aspect-preserving bound; fingerprint re-derived deterministically
    val w = math.max(1, f.width); val h = math.max(1, f.height)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    ResizedMedia(f.doc_id, f.media_ref, f.kind,
      math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt),
      (f.fingerprint * 31 + maxW * 7919L + maxH) % 1000000007L)
  }

  /** Frame sampling for video-kind payloads: one row per sampled frame index
    * (`explode`-style fan-out, deterministic frame count from the payload).
    * Real decoder integration point = `frameOf`.
    */
  case class Frame(doc_id: String, media_ref: String, frame_ix: Int, frame_fingerprint: Long)

  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int): Dataset[Frame] = {
    import features.sparkSession.implicits._
    features.filter(_.kind == "video").flatMap { f =>
      val nFrames = (f.n_bytes % 240 + 16).toInt // STUB: fake stream length
      (0 until nFrames by everyN).map(i => frameOf(f, i))
    }
  }

  private def frameOf(f: MediaFeatures, ix: Int): Frame =
    Frame(f.doc_id, f.media_ref, ix, (f.fingerprint * 131 + ix) % 1000000007L)

  /** Exact media dedup across docs: payload-fingerprint groups (the media-side
    * analog of text exact-dedup; feeds the `media` exact comparator signal).
    */
  def dedupByFingerprint(features: Dataset[MediaFeatures]): Dataset[(Long, Long, String)] = {
    import features.sparkSession.implicits._
    features.groupByKey(_.fingerprint)
      .mapGroups { (fp, rows) =>
        val all = rows.toSeq
        (fp, all.size.toLong, all.map(_.media_ref).min)
      }
  }
}
