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

  // ---- hand-built container fixtures: true byte layouts, no codec libs ----

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be32(x: Long): Seq[Byte] =
      Seq(24, 16, 8, 0).map(s => ((x >> s) & 0xff).toByte)
    (Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w.toLong) ++ be32(h.toLong) ++
      Seq[Byte](8, 6, 0, 0, 0)).toArray
  }

  private def le16(x: Int): Seq[Byte] = Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
  private def le32(x: Long): Seq[Byte] =
    Seq(0, 8, 16, 24).map(s => ((x >> s) & 0xff).toByte)

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes.toSeq ++ le16(w) ++ le16(h) ++ Seq[Byte](0, 0, 0)).toArray

  private def bmpBytes(w: Int, h: Int): Array[Byte] =
    ("BM".getBytes.toSeq ++ le32(122) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w.toLong & 0xffffffffL) ++ le32(h.toLong & 0xffffffffL) ++
      le16(1) ++ le16(24) ++ Seq.fill(24)(0.toByte)).toArray

  private def wavBytes(sampleRate: Int, byteRate: Int, dataSize: Int): Array[Byte] =
    ("RIFF".getBytes.toSeq ++ le32(36L + dataSize) ++ "WAVE".getBytes.toSeq ++
      "fmt ".getBytes.toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(sampleRate.toLong) ++ le32(byteRate.toLong) ++ le16(4) ++ le16(16) ++
      "data".getBytes.toSeq ++ le32(dataSize.toLong) ++
      Seq.fill(math.min(dataSize, 8))(0.toByte)).toArray

  private def be16(x: Int): Seq[Byte] = Seq(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)

  /** SOI, an APPn segment, a quant table, then the frame header (`sof` =
    * 0xC0 baseline / 0xC2 progressive) — the minimal real marker stream.
    */
  private def jpegBytes(w: Int, h: Int, sof: Int = 0xc0): Array[Byte] =
    (Seq(0xff, 0xd8).map(_.toByte) ++
      Seq(0xff, 0xe0).map(_.toByte) ++ be16(16) ++ "JFIF".getBytes.toSeq ++
      Seq.fill(10)(0.toByte) ++
      Seq(0xff, 0xdb).map(_.toByte) ++ be16(67) ++ Seq.fill(65)(1.toByte) ++
      Seq(0xff, sof).map(_.toByte) ++ be16(17) ++ Seq[Byte](8) ++
      be16(h) ++ be16(w) ++ Seq[Byte](3) ++ Seq.fill(9)(0.toByte)).toArray

  test("parseHeader: true dimensions from real PNG/GIF/BMP layouts, WAV duration") {
    assert(Multimodal.parseHeader(pngBytes(640, 480)) === Some(("png", 640L, 480L)))
    assert(Multimodal.parseHeader(gifBytes(13, 7)) === Some(("gif", 13L, 7L)))
    assert(Multimodal.parseHeader(bmpBytes(800, 600)) === Some(("bmp", 800L, 600L)))
    // top-down BMPs store a negative height — dimensions are still 600
    assert(Multimodal.parseHeader(bmpBytes(800, -600)) === Some(("bmp", 800L, 600L)))
    // 44.1 kHz stereo 16-bit: byteRate 176400; 352800 data bytes = 2000 ms
    assert(Multimodal.parseHeader(wavBytes(44100, 176400, 352800)) ===
      Some(("wav", 2000L, 44100L)))
    // opaque payloads (word soup, truncated magic) fall back to None
    assert(Multimodal.parseHeader("BMx not a bitmap at all".getBytes) === None)
    assert(Multimodal.parseHeader("alpha beta gamma".getBytes) === None)
    assert(Multimodal.parseHeader(Array[Byte](0x89.toByte, 'P', 'N')) === None)
  }

  private def be32b(x: Long): Seq[Byte] =
    Seq(24, 16, 8, 0).map(s => ((x >> s) & 0xff).toByte)
  private def be64b(x: Long): Seq[Byte] =
    Seq(56, 48, 40, 32, 24, 16, 8, 0).map(s => ((x >> s) & 0xff).toByte)

  /** Minimal ISO-BMFF: an ftyp box then moov > mvhd (v0 or v1). */
  private def mp4Bytes(timescale: Long, duration: Long, v1: Boolean = false): Array[Byte] = {
    val mvhdPayload: Seq[Byte] =
      if (v1)
        Seq[Byte](1, 0, 0, 0) ++ be64b(0) ++ be64b(0) ++ be32b(timescale) ++ be64b(duration)
      else
        Seq[Byte](0, 0, 0, 0) ++ be32b(0) ++ be32b(0) ++ be32b(timescale) ++ be32b(duration)
    val mvhd = be32b(8L + mvhdPayload.length) ++ "mvhd".getBytes.toSeq ++ mvhdPayload
    val moov = be32b(8L + mvhd.length) ++ "moov".getBytes.toSeq ++ mvhd
    val ftyp = be32b(16L) ++ "ftyp".getBytes.toSeq ++ "isom".getBytes.toSeq ++ be32b(0)
    (ftyp ++ moov).toArray
  }

  test("parseHeader: MP4 duration from the ISO-BMFF box walk, v0 and v1 mvhd") {
    // 3000 ticks at 600/s = 5000 ms
    assert(Multimodal.parseHeader(mp4Bytes(600, 3000)) === Some(("mp4", 5000L, 600L)))
    assert(Multimodal.parseHeader(mp4Bytes(1000, 7500, v1 = true)) ===
      Some(("mp4", 7500L, 1000L)))
    // ftyp alone (no moov), zero timescale, malformed box size: all None, no crash
    val ftypOnly = (be32b(16L) ++ "ftyp".getBytes.toSeq ++
      "isom".getBytes.toSeq ++ be32b(0)).toArray
    assert(Multimodal.parseHeader(ftypOnly) === None)
    assert(Multimodal.parseHeader(mp4Bytes(0, 3000)) === None)
    val evil = (be32b(16L) ++ "ftyp".getBytes.toSeq ++ "isom".getBytes.toSeq ++ be32b(0) ++
      be32b(0xfffffff0L) ++ "free".getBytes.toSeq ++ Seq.fill(8)(0.toByte)).toArray
    assert(Multimodal.parseHeader(evil) === None)
  }

  test("parseHeader: JPEG dims from the SOF marker scan, baseline and progressive") {
    assert(Multimodal.parseHeader(jpegBytes(1024, 768)) === Some(("jpeg", 1024L, 768L)))
    assert(Multimodal.parseHeader(jpegBytes(333, 77, sof = 0xc2)) === Some(("jpeg", 333L, 77L)))
    // DHT (C4) must NOT be mistaken for a frame header: a stream whose only
    // Cx marker is a Huffman table yields no dims
    val dht = (Seq(0xff, 0xd8).map(_.toByte) ++
      Seq(0xff, 0xc4).map(_.toByte) ++ be16(5) ++ Seq.fill(3)(0.toByte) ++
      Seq(0xff, 0xd9).map(_.toByte)).toArray
    assert(Multimodal.parseHeader(dht) === None)
    // truncated mid-segment / SOI alone: no crash, no dims
    assert(Multimodal.parseHeader(jpegBytes(64, 64).take(6)) === None)
    assert(Multimodal.parseHeader(Array[Byte](0xff.toByte, 0xd8.toByte)) === None)
  }

  test("parseHeader: malformed WAV chunk sizes terminate instead of looping or crashing") {
    // a chunk declaring size 0xFFFFFFF8 — the Int narrowing that once made
    // the cursor step backwards (infinite loop) or go negative (AIOOBE)
    val evil = ("RIFF".getBytes.toSeq ++ le32(100) ++ "WAVE".getBytes.toSeq ++
      "junk".getBytes.toSeq ++ le32(0xfffffff8L) ++ Seq.fill(24)(0.toByte)).toArray
    assert(Multimodal.parseHeader(evil) === None)
    // size that points just past the buffer: walk stops, no throw
    val past = ("RIFF".getBytes.toSeq ++ le32(100) ++ "WAVE".getBytes.toSeq ++
      "junk".getBytes.toSeq ++ le32(1000) ++ Seq.fill(24)(0.toByte)).toArray
    assert(Multimodal.parseHeader(past) === None)
    // a truncated-but-declared data chunk after a good fmt chunk still
    // yields the declared duration (the pre-guard behavior, preserved)
    assert(Multimodal.parseHeader(wavBytes(44100, 176400, 352800)) ===
      Some(("wav", 2000L, 44100L)))
  }

  test("extractFeatures returns true dimensions for real container payloads") {
    val ds = Seq(
      MediaRecord(0L, "image", pngBytes(1920, 1080)),
      MediaRecord(1L, "image", gifBytes(320, 200)),
      MediaRecord(2L, "audio", wavBytes(8000, 16000, 48000)),
      MediaRecord(3L, "image", "plain words".getBytes)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    assert(f(0).format === "png" && f(0).width === 1920L && f(0).height === 1080L)
    assert(f(1).format === "gif" && f(1).width === 320L && f(1).height === 200L)
    assert(f(2).format === "wav" && f(2).width === 3000L && f(2).height === 8000L)
    // the md5 stub still covers opaque payloads, flagged as such
    val (sw, sh) = Multimodal.decodeStub("plain words".getBytes)
    assert(f(3).format === "unknown" && f(3).width === sw && f(3).height === sh)
  }

  test("extractPixelFeatures: real javax.imageio decode behind the flag, stub fallback visible") {
    // render real images in-memory with the SAME pure-JVM stack the
    // decoder uses, so the pins are exact: a solid-color image's BT.601
    // mean luma is 299R + 587G + 114B per definition
    def img(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, out), s"JDK must ship a $fmt writer")
      out.toByteArray
    }
    val white = img(8, 5, 0xffffff, "png") // luma 255000 exactly
    val red = img(3, 3, 0xff0000, "bmp") // luma 299 * 255 = 76245
    val gray = img(4, 4, 0x808080, "gif") // luma 128000 exactly
    // untrusted-bytes hardening fixture: a real PNG whose IHDR width is
    // patched to claim 0x7fffxxxx pixels — a reader ACCEPTS the bytes but
    // the pixel budget must refuse before any allocation
    val huge = white.clone()
    huge(16) = 0x7f.toByte; huge(17) = 0xff.toByte // IHDR width := 0x7fffxxxx
    val ds = Seq(
      MediaRecord(0L, "image", white),
      MediaRecord(1L, "image", red),
      MediaRecord(2L, "image", gray),
      MediaRecord(3L, "image", "not an image at all".getBytes),
      MediaRecord(4L, "image", huge)).toDS()
    val f = Multimodal.extractPixelFeatures(ds, pixelDecode = true).collect().sortBy(_.doc_id)
    assert(f(0).decoded && f(0).format == "png" && (f(0).width, f(0).height) == ((8L, 5L)))
    assert(f(0).mean_luma_e3 == 255000L, s"white: ${f(0)}")
    assert(f(1).decoded && f(1).format == "bmp" && f(1).mean_luma_e3 == 299L * 255)
    assert(f(2).decoded && f(2).format == "gif")
    // GIF is palettized — the writer may quantize 0x808080, so pin a band
    assert(math.abs(f(2).mean_luma_e3 - 128000L) < 8000L, s"gray gif: ${f(2)}")
    // undecodable bytes fall back to the stub path, visibly — and are
    // NOT flagged oversize (codec absence is its own triage bucket)
    val (sw, sh) = Multimodal.decodeStub("not an image at all".getBytes)
    assert(!f(3).decoded && !f(3).oversize && f(3).format == "unknown")
    assert(f(3).mean_luma_e3 == 0L && (f(3).width, f(3).height) == ((sw, sh)))
    // an oversized-but-real image: reader recognized it, pixel budget
    // refused it BEFORE allocation — visible as oversize=true with the
    // header's CLAIMED dims, distinct from both decoded and unreadable
    assert(!f(4).decoded && f(4).oversize, s"refusal must be visible: ${f(4)}")
    assert(f(4).format == "png" && f(4).height == 5L && f(4).width >= 0x7fff0000L)
    // flag off: NO row real-decodes — byte-identical to the stub/header
    // path, which is what keeps the oracle-pinned default stable
    val off = Multimodal.extractPixelFeatures(ds, pixelDecode = false).collect()
    assert(off.forall(r => !r.decoded && !r.oversize && r.mean_luma_e3 == 0L))
    // the three-state decode directly: refusal is its own constructor
    Multimodal.decodeImage(huge) match {
      case Multimodal.OversizeRefused(fmt, w, h) =>
        assert(fmt == "png" && h == 5L && w >= 0x7fff0000L)
      case other => fail(s"oversized claim must be refused visibly: $other")
    }
    assert(Multimodal.decodeImage("garbage".getBytes) == Multimodal.Unreadable)
  }

  /** Full PCM WAV builder with real sample data, for the sample-decode pins.
    * `claim` overrides the data chunk's declared size (untrusted-header case).
    */
  private def pcmWav(
      bits: Int, channels: Int, rate: Int, data: Seq[Byte],
      fmtTag: Int = 1, claim: Option[Int] = None): Array[Byte] =
    ("RIFF".getBytes.toSeq ++ le32(36L + data.length) ++ "WAVE".getBytes.toSeq ++
      "fmt ".getBytes.toSeq ++ le32(16) ++ le16(fmtTag) ++ le16(channels) ++
      le32(rate.toLong) ++ le32(rate.toLong * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits) ++
      "data".getBytes.toSeq ++ le32(claim.getOrElse(data.length).toLong) ++ data).toArray

  private def s16(xs: Int*): Seq[Byte] =
    xs.flatMap(x => Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte))

  test("decodeWavSamples: exact integer mean/RMS from real PCM bytes, hardened against claims") {
    // 16-bit mono at 1 kHz: samples 0, 1000, -1000, 32767
    //   mean_abs = 34767 div 4 = 8691; rms = isqrt(1075676289 div 4) = 16398
    val mono = pcmWav(16, 1, 1000, s16(0, 1000, -1000, 32767))
    assert(Multimodal.decodeWavSamples(mono) === Some((1000L, 4L, 4L, 8691L, 16398L)))
    // 8-bit unsigned re-centered at 128: bytes 128,138,118,228 → 0,10,-10,100
    //   mean_abs = 120 div 4 = 30; rms = isqrt(10200 div 4) = 50
    val eight = pcmWav(8, 1, 4, Seq(128, 138, 118, 228).map(_.toByte))
    assert(Multimodal.decodeWavSamples(eight) === Some((4L, 1000L, 4L, 30L, 50L)))
    // stereo: 4 samples = 2 frames; duration counts FRAMES, stats count samples
    val stereo = pcmWav(16, 2, 2, s16(100, -100, 300, -300))
    assert(Multimodal.decodeWavSamples(stereo) === Some((2L, 1000L, 4L, 200L, 223L)))
    // a data chunk CLAIMING more bytes than present is clamped, not trusted
    val lying = pcmWav(16, 1, 1000, s16(0, 1000), claim = Some(1 << 30))
    assert(Multimodal.decodeWavSamples(lying) === Some((1000L, 2L, 2L, 500L, 707L)))
    // non-PCM (IEEE float tag 3), non-WAV, and empty-data are all None
    assert(Multimodal.decodeWavSamples(pcmWav(16, 1, 1000, s16(1, 2), fmtTag = 3)).isEmpty)
    assert(Multimodal.decodeWavSamples("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeWavSamples(pcmWav(16, 1, 1000, Seq.empty)).isEmpty)
  }

  test("decodeWavQuality: exact silence/clipping/energy counters, both bit depths") {
    // 8-bit: bytes 128 (s=0, silent), 129 (s=1, silent at the default
    // threshold), 255 (s=127, clip-high rail), 0 (s=-128, clip-low rail),
    // 228 (s=100, plain signal)
    val eight = pcmWav(8, 1, 8000, Seq(128, 129, 255, 0, 228).map(_.toByte))
    // sum|s| = 0+1+127+128+100 = 356; sum s^2 = 0+1+16129+16384+10000 = 42514
    assert(Multimodal.decodeWavQuality(eight) === Some((5L, 2L, 2L, 356L, 42514L, 128L)))
    // 16-bit rails: 32767 and -32768 clip, 1000 does not; silence at 0
    val mono = pcmWav(16, 1, 8000, s16(0, 32767, -32768, 1000))
    val Some((n, sil, clip, sa, sq, pk)) = Multimodal.decodeWavQuality(mono)
    assert((n, sil, clip, pk) === ((4L, 1L, 2L, 32768L)))
    assert(sa === 0L + 32767L + 32768L + 1000L)
    assert(sq === 32767L * 32767L + 32768L * 32768L + 1000L * 1000L)
    // a stricter silence threshold counts the near-zero sample too
    assert(Multimodal.decodeWavQuality(mono, silenceMax = 1000L).get._2 === 2L)
    // non-PCM bytes are None; the frame entry flags them decoded = false
    assert(Multimodal.decodeWavQuality("not audio".getBytes).isEmpty)
    import spark.implicits._
    val frame = Multimodal.audioQualityFrame(
      Seq((1L, eight), (2L, "junk".getBytes)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(frame === Map(1L -> true, 2L -> false))
  }

  test("decodeImageExposure: exact dark/bright/luma counters through the real decoder") {
    import graft.xscale.PerceptualDedup.makeBmp
    // 3x2 gray BMP: grays 5 (dark: luma 5000), 250 (bright: 250000),
    // 30 (exactly AT the dark threshold 30000 — inclusive), 225 (exactly
    // at the bright threshold — inclusive), 100, 101
    val g = Map((0, 0) -> 5, (1, 0) -> 250, (2, 0) -> 30,
      (0, 1) -> 225, (1, 1) -> 100, (2, 1) -> 101)
    val bmp = makeBmp(3, 2, (x, y) => g((x, y)))
    val lumas = g.values.map(_ * 1000L)
    assert(Multimodal.decodeImageExposure(bmp) === Some((
      6L, 2L, 2L, lumas.sum, lumas.map(l => l * l).sum)))
    // thresholds are parameters
    assert(Multimodal.decodeImageExposure(bmp, darkMaxE3 = 4000L).get._2 === 0L)
    assert(Multimodal.decodeImageExposure("not an image".getBytes).isEmpty)
    import spark.implicits._
    val frame = Multimodal.imageExposureFrame(
      Seq((1L, bmp), (2L, "junk".getBytes)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(frame === Map(1L -> true, 2L -> false))
  }

  test("extractAudioFeatures: flag-guarded sample decode, stub fallback byte-stable") {
    val mono = pcmWav(16, 1, 1000, s16(0, 1000, -1000, 32767))
    val ds = Seq(
      MediaRecord(0L, "audio", mono),
      MediaRecord(1L, "audio", wavBytes(44100, 176400, 352800)), // header-only: fmt tag 1 but truncated data
      MediaRecord(2L, "audio", "not audio at all".getBytes)).toDS()
    val f = Multimodal.extractAudioFeatures(ds, audioDecode = true).collect().sortBy(_.doc_id)
    assert(f(0).decoded && f(0).format == "wav" &&
      (f(0).n_samples, f(0).mean_abs, f(0).rms) == ((4L, 8691L, 16398L)))
    assert(f(0).sample_rate == 1000L && f(0).duration_ms == 4L)
    // the 8-byte-data fixture still decodes (4 real samples of silence)
    assert(f(1).decoded && f(1).n_samples == 4L && f(1).rms == 0L)
    // undecodable bytes keep header/stub facts with zeroed sample stats
    assert(!f(2).decoded && f(2).n_samples == 0L && f(2).rms == 0L)
    // flag off: NO sample decode anywhere — the stub/header default stays
    // byte-stable (the pixel-flag pattern)
    val off = Multimodal.extractAudioFeatures(ds, audioDecode = false).collect().sortBy(_.doc_id)
    assert(off.forall(r => !r.decoded && r.n_samples == 0L && r.mean_abs == 0L && r.rms == 0L))
    assert(off(1).format == "wav" && off(1).duration_ms == 2000L && off(1).sample_rate == 44100L)
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

  test("decodeWavUtterances: pauses stay inside, separators split, exact lengths") {
    import PerceptualDedup.makeWav8
    def wav(samples: Seq[Int]) = makeWav8(8000, samples.toArray)
    // [8 silence][5 voiced][3-sample PAUSE][4 voiced][8 silence][2 voiced]
    // -> leading silence yields no utterance; the pause stays INSIDE
    // (utterance length 12 = 5+3+4); the trailing 2-voiced tail counts
    val p = wav(Seq.fill(8)(128) ++ Seq.fill(5)(60) ++ Seq.fill(3)(128) ++
      Seq.fill(4)(60) ++ Seq.fill(8)(128) ++ Seq.fill(2)(60))
    assert(Multimodal.decodeWavUtterances(p) == Some((30L, 2L, 12L)))
    // a 7-sample silent run is UNDER gapMin=8: one unbroken utterance
    val q = wav(Seq.fill(3)(60) ++ Seq.fill(7)(128) ++ Seq.fill(3)(60))
    assert(Multimodal.decodeWavUtterances(q) == Some((13L, 1L, 13L)))
    // all-silence clip: zero utterances
    assert(Multimodal.decodeWavUtterances(wav(Seq.fill(16)(128))) == Some((16L, 0L, 0L)))
    assert(Multimodal.decodeWavUtterances("not audio".getBytes).isEmpty)
    intercept[IllegalArgumentException](
      Multimodal.decodeWavUtterances(p, gapMin = 0))
    // fixture closed form == decoder (the x151 oracle premise): silence
    // only occurs in full 8-sample bands, so utterances are exactly the
    // maximal non-gap band runs x 8
    for (id <- Seq(0L, 7L, 123L)) {
      val gaps = Array.tabulate(20)(b => XHash.h60(s"${id}g$b") % 4 == 0)
      val samples = Array.tabulate(160) { j =>
        if (gaps(j / 8)) 128 else 30 + (XHash.h60(s"${id}u$j") % 90).toInt
      }
      var runs = List.empty[Int]
      var cur = 0
      for (b <- 0 until 20) {
        if (gaps(b)) { if (cur > 0) runs ::= cur; cur = 0 } else cur += 1
      }
      if (cur > 0) runs ::= cur
      val expect = (160L, runs.length.toLong,
        if (runs.isEmpty) 0L else 8L * runs.max)
      assert(Multimodal.decodeWavUtterances(makeWav8(8000, samples)) == Some(expect),
        s"doc $id")
    }
  }

  test("decodeWavUtteranceStats: voiced-core moments, edge silence excluded, pauses inside") {
    import PerceptualDedup.makeWav8
    def wav(samples: Seq[Int]) = makeWav8(8000, samples.toArray)
    // [8 sep][5x(+60)][3-sample pause of 128,129,127][4x(-20 -> byte 108)][8 sep][2x(+7)]
    // -> utt 1 core = 5x60 + pause (0, 1, -1) + 4x(-20): sum = 300+0-80 = 220,
    //    sq = 5*3600 + (0+1+1) + 4*400 = 19602; utt 2: sum 14, sq 98
    val p = wav(Seq.fill(8)(128) ++ Seq.fill(5)(188) ++ Seq(128, 129, 127) ++
      Seq.fill(4)(108) ++ Seq.fill(8)(128) ++ Seq.fill(2)(135))
    val Some((sums, sqs)) = Multimodal.decodeWavUtteranceStats(p)
    assert(sums.toSeq == Seq(220L, 14L) && sqs.toSeq == Seq(19602L, 98L))
    // trailing sub-gap silence stays OUTSIDE the core — NONZERO silent
    // samples (s = +1) so a core that wrongly included them would differ:
    // [3x(+10)][5x(+1)] -> sum 30 (not 35), sq 300 (not 305)
    val q = wav(Seq.fill(3)(138) ++ Seq.fill(5)(129))
    assert(Multimodal.decodeWavUtteranceStats(q)
      .map { case (s, sq) => (s.toSeq, sq.toSeq) } == Some((Seq(30L), Seq(300L))))
    // the EXCERPT invariance this decoder exists for, through real bytes:
    // cutting mid-separator (4 leading silent samples < gapMin) leaves
    // every surviving utterance's core moments bit-exact
    val full = PerceptualDedup.fixtureWavUtt(30L)
    val cut = PerceptualDedup.fixtureWavUtt(30L, uttOff = PerceptualDedup.UttDrop)
    val Some((fs, fq)) = Multimodal.decodeWavUtteranceStats(full)
    val Some((cs, cq)) = Multimodal.decodeWavUtteranceStats(cut)
    assert(fs.length == PerceptualDedup.UttCount &&
      cs.length == PerceptualDedup.UttCount - PerceptualDedup.UttDrop)
    assert(cs.toSeq == fs.drop(PerceptualDedup.UttDrop).toSeq)
    assert(cq.toSeq == fq.drop(PerceptualDedup.UttDrop).toSeq)
    // 16-bit path + non-PCM + invalid gapMin
    val s16 = Seq(0, 500, -500, 0, 0, 0, 0, 0, 0, 0, 0, 700)
      .flatMap(x => Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte))
    val p16 = pcmWav(16, 1, 8000, s16)
    assert(Multimodal.decodeWavUtteranceStats(p16)
      .map { case (s, sq) => (s.toSeq, sq.toSeq) } ==
      Some((Seq(0L, 700L), Seq(500000L, 490000L))))
    assert(Multimodal.decodeWavUtteranceStats("junk".getBytes).isEmpty)
    intercept[IllegalArgumentException](
      Multimodal.decodeWavUtteranceStats(p, gapMin = 0))
  }

  test("decodeWavWindowsUtterances: one pass == decodeWavFrameSums + decodeWavUtteranceStats") {
    import PerceptualDedup.makeWav8
    // a real utterance fixture + a short clip (windows None) + junk
    val clips = Seq(
      PerceptualDedup.fixtureWavUtt(5L),
      PerceptualDedup.fixtureWavUtt(5L, uttOff = 7),
      makeWav8(8000, Array.tabulate(40)(j => 128 + (j % 3))))
    for ((p, i) <- clips.zipWithIndex; nW <- Seq(65, 257)) {
      val Some((ws, us, uq)) = Multimodal.decodeWavWindowsUtterances(p, nW)
      assert(ws.map(_.toSeq) == Multimodal.decodeWavFrameSums(p, nW).map(_.toSeq),
        s"windows clip=$i nW=$nW")
      val Some((es, eq)) = Multimodal.decodeWavUtteranceStats(p)
      assert(us.toSeq == es.toSeq && uq.toSeq == eq.toSeq, s"utterances clip=$i nW=$nW")
    }
    assert(Multimodal.decodeWavWindowsUtterances("junk".getBytes, 65).isEmpty)
  }
}
