package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRecord}

/** The multimodal plumbing is real even though the codec is stubbed:
  * schema, typed mapPartitions execution, partition independence. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("extractFeatures is exact and partition-count independent") {
    val recs = Seq(
      MediaRecord(1L, "image", Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)),
      MediaRecord(2L, "audio", Array[Byte](16, 17)),
      MediaRecord(3L, "image", Array.empty[Byte]))
    def run(parts: Int): Seq[(Long, Int, Int, Int, Seq[Double])] =
      Multimodal.extractFeatures(recs.toDS().repartition(parts))
        .collect().toSeq.sortBy(_.doc_id)
        .map(f => (f.doc_id, f.byte_len, f.width, f.height, f.histogram.toSeq))
    val one = run(1)
    assert(one == run(4))
    assert(one.head == ((1L, 8, 16, 24, Seq.fill(8)(0.125))))
    assert(one(2) == ((3L, 0, 16, 16, Seq.fill(8)(0.0))))
  }

  test("resize + spectrogram stubs are deterministic and bounded") {
    val payload = (0 until 100).map(_.toByte).toArray
    val resized = Multimodal.resizeStub(payload, 32)
    assert(resized.length <= 32 && resized.sameElements(Multimodal.resizeStub(payload, 32)))
    val spec = Multimodal.spectrogramStub(payload, 10)
    assert(spec.length == 10 && spec.head == 4.5) // mean of 0..9
    val thumbs = Multimodal.resizeAll(
      Multimodal.documentPayloads(spark, sf), 16).collect()
    assert(thumbs.length == 500)
    thumbs.foreach(t => assert(t.thumb.length <= 16))
  }

  test("frame sampling keeps every k-th frame with its index, 1->N typed rows") {
    val payload = (0 until 100).map(_.toByte).toArray // 7 frames of 16B (last short)
    val chunks = Multimodal.frameChunks(payload, 16)
    assert(chunks.length == 7 && chunks.last.length == 4)
    val frames = Multimodal.sampleFrames(
      Multimodal.documentPayloads(spark, sf), everyK = 4, frameBytes = 16).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.frame_idx % 4 == 0)
      assert(f.frame.length <= 16 && f.frame.nonEmpty)
    }
    // every doc contributes its frame 0
    assert(frames.count(_.frame_idx == 0) == 500)
  }

  test("fixture documents flow through the typed pipeline") {
    val feats = Multimodal.extractFeatures(
      Multimodal.documentPayloads(spark, sf)).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.byte_len > 0)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    }
  }
}
