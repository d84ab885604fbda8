package graft.xscale

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.query.Q
import graft.query.Registry.table

/** A raw multimodal row: opaque payload bytes + typed metadata. At 100 TB
  * the payload column dominates storage — keep it `binary` in parquet,
  * size-partition the table, and never let a wide payload column through a
  * shuffle you don't need (project it away before joins/aggs).
  */
final case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])

/** Decoded features — the narrow output schema that downstream joins see. */
final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    width: Long,
    height: Long)

/** Multimodal columns: image/audio/video treated as opaque `binary` columns
  * with typed metadata; decode / feature-extract runs batched per partition.
  *
  * The decode step itself is STUBBED (no codec libraries in this container):
  * [[Multimodal.decodeStub]] derives deterministic fake dimensions from the
  * payload's md5, so the Spark-side plumbing — schema, partition batching,
  * feature extraction shape — is real and testable, and the oracle can
  * reproduce the values.
  */
object Multimodal {

  /** Batch size for per-partition decoding — mirrors the batch shape a real
    * vectorized decoder (or Arrow-based UDF) would use.
    */
  val decodeBatchSize = 64

  /** STUB decoder. A real implementation would parse the image/audio header
    * here; the container has no codec libs, so dimensions are derived
    * deterministically from md5(payload) — same formula as the SQL oracle:
    * h = first 15 hex digits of md5; width = h mod 1024,
    * height = (h >> 10) mod 1024.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).take(8).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    (h % 1024, (h >> 10) % 1024)
  }

  /** Distributed batched decode: the real plumbing. Batches amortize
    * per-batch decoder setup exactly like `mapInPandas` batches do in
    * PySpark; output is the narrow features schema.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h) = decodeStub(m.payload)
          MediaFeatures(m.doc_id, m.modality, m.payload.length.toLong, w, h)
        }
      }
    }
  }

  /** Documents table → media records: text bytes stand in for the opaque
    * payload; modality assigned round-robin. (The testdata has no real
    * image bytes — the point is the binary-column plumbing.)
    */
  def asMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** A sampled frame: 1→N output of frame sampling, keyed back to its doc. */
  final case class MediaFrame(doc_id: Long, frame_idx: Long, payload: Array[Byte])

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub deterministically re-hashes payload+dims so downstream schema and
    * the batched per-partition shape are exercised for real.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(s"${w}x$h".getBytes)
    md.digest()
  }

  /** Batched per-partition resize — same `mapPartitions` plumbing a real
    * codec-backed implementation would keep; only [[resizeStub]] changes.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(_.map(m =>
      m.copy(payload = resizeStub(m.payload, w, h)))))
  }

  /** Frame sampling: every video payload yields ceil(len / stride) "frames"
    * (payload slices in the stub; decoded frames for real) — the 1→N
    * flatMap shape that makes frame extraction distributable: downstream
    * operators join on (doc_id, frame_idx), never re-touching the source
    * video bytes.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(col("modality") === "video").flatMap { m =>
      m.payload.grouped(stride).zipWithIndex.map {
        case (slice, i) => MediaFrame(m.doc_id, i.toLong, slice)
      }
    }
  }

  /** An evenly-sampled frame reference: no payload, just the index and a
    * deterministic fingerprint — what a downstream dedup/embedding stage
    * keys on.
    */
  final case class FrameRef(doc_id: Long, n_frames: Long, frame_idx: Long, frame_h: Long)

  /** Evenly-spaced frame sampling (the "k thumbnails per video" shape):
    * n_frames = bytes/256 + 1 (stub — a real decoder reads the container
    * header), sample min(maxFrames, n_frames) indices evenly across
    * [0, n_frames-1], fingerprint each as h60(md5(payload) + "_" + idx).
    * Indices are strictly increasing because k <= n_frames. Batched
    * per-partition like every decode step here.
    */
  def sampleFramesEvenly(media: Dataset[MediaRecord], maxFrames: Int = 4): Dataset[FrameRef] = {
    import media.sparkSession.implicits._
    media.filter(col("modality") === "video").mapPartitions {
      _.grouped(decodeBatchSize).flatMap(_.flatMap { m =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val mh = md.digest(m.payload).map(b => f"$b%02x").mkString
        val nf = m.payload.length.toLong / 256 + 1
        val k = math.min(maxFrames.toLong, nf)
        val idxs = if (k == 1) Seq(0L) else (0L until k).map(j => j * (nf - 1) / (k - 1))
        idxs.map(i => FrameRef(m.doc_id, nf, i, XHash.h60(s"${mh}_$i")))
      })
    }
  }

  val queries: Seq[Q] = Seq(
    // ----- x42: evenly-spaced frame sampling (video thumbnails) -----
    Q(
      "x42_frame_sample",
      Some(
        "WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2), " +
          "m AS (SELECT doc_id, md5(text) AS mh, " +
          "octet_length(encode(text)) // 256 + 1 AS nf FROM v), " +
          "k AS (SELECT doc_id, mh, nf, least(4, nf) AS k FROM m), " +
          "f AS (SELECT doc_id, mh, nf, k, unnest(generate_series(0, k - 1)) AS j FROM k), " +
          "i AS (SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, " +
          "CAST(CASE WHEN k = 1 THEN 0 ELSE (j * (nf - 1)) // (k - 1) END AS BIGINT) " +
          "AS frame_idx, mh FROM f) " +
          "SELECT doc_id, n_frames, frame_idx, " +
          s"${XHash.h60Sql("mh || '_' || CAST(frame_idx AS VARCHAR)")} AS frame_h " +
          "FROM i ORDER BY doc_id, frame_idx"),
      "evenly-spaced frame sampling for the video modality — the 'k thumbnails per video' " +
        "stage of a multimodal pipeline: frame count derived from the payload (stub; a real " +
        "decoder reads the container header), min(4, n) indices spread across the clip, " +
        "each fingerprinted so downstream frame-level dedup/embedding joins on " +
        "(doc_id, frame_idx) without re-touching the bytes. Same batched mapPartitions " +
        "plumbing as x12 — the 1-to-N flatMap that makes frame work distributable."
    ) { (s, dir) =>
      sampleFramesEvenly(asMedia(s, table(s, dir, "documents")))
        .toDF().orderBy("doc_id", "frame_idx")
    },

    // ----- x12: multimodal feature extraction over binary payloads -----
    Q(
      "x12_multimodal",
      Some(
        "SELECT doc_id, (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality, " +
          "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
          s"${XHash.h60Sql("text")} % 1024 AS width, " +
          s"(${XHash.h60Sql("text")} >> 10) % 1024 AS height " +
          "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
      "binary payload column + typed metadata; batched per-partition decode (STUB — deterministic " +
        "md5-derived dimensions; schema/partitioning/batching are the real plumbing)"
    ) { (s, dir) =>
      val media = asMedia(s, table(s, dir, "documents").filter(col("doc_id") < 200))
      extractFeatures(media).toDF().orderBy("doc_id")
    }
  )
}
