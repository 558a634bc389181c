package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.sources.Tables

/** Typed multimodal column pipeline (SURVEY.md §2.9 / builder mandate).
  *
  * Media payloads are opaque binary columns with typed metadata. The
  * decode step is STUBBED — no image/audio codecs exist in this
  * environment — with a deterministic fake that derives "dimensions" and
  * a byte-histogram "feature vector" from the payload bytes. Everything
  * around the stub is the real production shape:
  *   - schema: (doc_id, media_type, payload binary) → fixed-width
  *     feature struct with an array column;
  *   - execution: mapPartitions so per-partition codec initialization
  *     happens once per task, not per row (the pattern a JNI/FFmpeg/
  *     turbojpeg decoder needs), rows stream through without
  *     materializing a partition in memory;
  *   - partitioning: inherited from the source — at 100 TB, payloads
  *     live in parquet/lance files partitioned by media_type or shard,
  *     and this map runs embarrassingly parallel with no shuffle.
  * Swapping [[decodeStub]] for a real codec changes no plumbing.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, histogram: Array[Double])

  /** STUB codec: deterministic fake decode. A real implementation
    * returns (width, height, pixel/spectrogram histogram) from the
    * decoded media; this derives them from payload bytes so tests can
    * assert exact values. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val w = 16 + (if (payload.isEmpty) 0 else java.lang.Byte.toUnsignedInt(payload(0)) % 16)
    val h = 16 + (payload.length % 16)
    val hist = new Array[Double](8)
    payload.foreach(b => hist(java.lang.Byte.toUnsignedInt(b) % 8) += 1.0)
    val n = math.max(1, payload.length).toDouble
    (w, h, hist.map(_ / n))
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, thumb: Array[Byte])

  /** STUB resize: deterministic fake of image/audio downsampling — takes
    * every stride-th payload byte up to maxBytes (a real implementation
    * would bilinear-resample decoded pixels; batch shape is identical). */
  def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (payload.isEmpty) Array.empty
    else {
      val stride = math.max(1, payload.length / maxBytes)
      payload.indices.by(stride).take(maxBytes).map(payload).toArray
    }
  }

  /** STUB spectrogram: deterministic fake audio feature — windowed byte
    * energy (mean of unsigned bytes per fixed-size window). */
  def spectrogramStub(payload: Array[Byte], window: Int): Array[Double] =
    payload.grouped(window)
      .map(w => w.map(java.lang.Byte.toUnsignedInt(_)).sum.toDouble / w.length)
      .toArray

  /** Partition-parallel resize pipeline (same plumbing contract as
    * [[extractFeatures]]). */
  def resizeAll(records: Dataset[MediaRecord], maxBytes: Int = 32): Dataset[ResizedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val (w, h, _) = decodeStub(r.payload)
      ResizedMedia(r.doc_id, r.media_type, w, h, resizeStub(r.payload, maxBytes))
    })
  }

  /** Partition-parallel feature extraction over binary payloads. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // Per-partition init slot: a real codec context/JNI handle would be
      // created here, once per task, and closed by the iterator's end.
      it.map { r =>
        val (w, h, hist) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, hist)
      }
    }
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame extraction: a "video" payload is split into fixed-size
    * frame chunks (a real implementation seeks keyframes via the codec;
    * the 1→N row shape, ordering, and typing are identical). */
  def frameChunks(payload: Array[Byte], frameBytes: Int): Seq[Array[Byte]] =
    payload.grouped(frameBytes).toSeq

  /** Frame sampling: every k-th frame of each video payload, as typed
    * 1→N rows (flatMap through mapPartitions — per-partition codec init,
    * rows stream out without buffering a whole video's frames). At
    * 100 TB, videos are the fat rows; sampling happens before any
    * shuffle so only sampled frames move. */
  def sampleFrames(records: Dataset[MediaRecord], everyK: Int = 4,
      frameBytes: Int = 16): Dataset[VideoFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder context would init here
      it.flatMap { r =>
        frameChunks(r.payload, frameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % everyK == 0 => VideoFrame(r.doc_id, idx, chunk)
        }
      }
    }
  }

  /** Fixture adapter: treat document text bytes as payloads (the fixtures
    * ship no media table), typed end-to-end. */
  def documentPayloads(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .selectExpr("doc_id", "CAST('text' AS STRING) AS media_type",
        "CAST(text AS BINARY) AS payload")
      .as[MediaRecord]
  }
}
