package graft.xscale

import graft.SparkSpec

/** Multimodal plumbing: binary payload schema, batched decode, resize,
  * frame sampling — the Spark-side shapes are real; only the codec is a
  * deterministic stub (no image/audio libs in this container).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    spark,
    Seq((0L, "alpha beta"), (1L, "gamma delta epsilon"), (2L, "zeta"), (3L, "eta theta iota kappa"))
      .toDF("doc_id", "text"))

  test("asMedia: payload is the opaque bytes, modality round-robins") {
    val m = media.collect().sortBy(_.doc_id)
    assert(m.map(_.modality).toSeq === Seq("image", "audio", "video", "image"))
    assert(new String(m(0).payload, "UTF-8") === "alpha beta")
  }

  test("extractFeatures: deterministic stub dims, n_bytes = payload length") {
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f.map(_.n_bytes).toSeq === Seq(10L, 19L, 4L, 20L))
    assert(f.forall(x => x.width >= 0 && x.width < 1024 && x.height >= 0 && x.height < 1024))
    // determinism: same input, same dims
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f.map(x => (x.width, x.height)).toSeq === again.map(x => (x.width, x.height)).toSeq)
  }

  test("resize: payload transformed per-record, schema preserved") {
    val r = Multimodal.resize(media, 64, 64).collect().sortBy(_.doc_id)
    assert(r.length === 4)
    assert(r.forall(_.payload.length === 16)) // md5 stub output
    // different target dims give different payloads
    val r2 = Multimodal.resize(media, 32, 32).collect().sortBy(_.doc_id)
    assert(!r(0).payload.sameElements(r2(0).payload))
  }

  test("sampleFrames: only video, 1->N slices with frame indexes") {
    val frames = Multimodal.sampleFrames(media, 2).collect()
    assert(frames.forall(_.doc_id === 2L)) // doc 2 is the video
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0L, 1L)) // "zeta" = 4 bytes / stride 2
    assert(frames.map(_.payload.length).sum === 4)
  }

  test("sampleFramesEvenly: spread across the clip, endpoints included, video only") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val refs = Multimodal.sampleFramesEvenly(Multimodal.asMedia(spark, docs))
      .collect().groupBy(_.doc_id)
    assert(refs.nonEmpty)
    assert(refs.keySet.forall(_ % 3 == 2)) // video modality = doc_id % 3 == 2
    refs.values.foreach { g =>
      val nf = g.head.n_frames
      val idxs = g.map(_.frame_idx).sorted.toSeq
      assert(g.length == math.min(4L, nf))
      assert(idxs == idxs.distinct && idxs.head == 0L)
      if (nf > 1) assert(idxs.last == nf - 1) // last frame always sampled
      assert(idxs.forall(i => i >= 0 && i < nf))
      assert(g.map(_.frame_h).distinct.length == g.length) // distinct fingerprints
    }
  }
}
