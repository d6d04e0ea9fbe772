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
