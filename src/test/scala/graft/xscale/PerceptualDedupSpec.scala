package graft.xscale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the perceptual-dedup primitives end to end: the BMP/WAV writers
  * against the REAL decoders (javax.imageio, the hardened RIFF walk), the
  * exact-integer downsample, the hash's brightness/gain invariance (the
  * property the operator exists for), the pigeonhole-vs-verify split in
  * the banded pair join, and the closed-form fixtures' equality with what
  * the oracle SQL recomputes.
  */
class PerceptualDedupSpec extends SparkSpec {
  import PerceptualDedup._

  // ---- container writers vs real decoders ----

  test("makeBmp round-trips through javax.imageio: block sums are exactly 1000x gray") {
    // asymmetric gray pins row order (bottom-up write, top-down read) and
    // channel order (equal channels make BGR-vs-RGB invisible; the luma
    // identity 299+587+114=1000 makes the sum exact)
    val g = (x: Int, y: Int) => x * 10 + y
    val Some((w, h, sums, cnts)) = Multimodal.decodeBlockLumaE3(makeBmp(9, 8, g), 9, 8)
    assert(w == 9 && h == 8)
    assert(cnts.forall(_ == 1L))
    for (y <- 0 until 8; x <- 0 until 9)
      assert(sums(y * 9 + x) == 1000L * (x * 10 + y), s"block ($x, $y)")
  }

  test("decodeBlockLumaE3: grid-divisible image aggregates exact 2x2 block sums") {
    // 18x16 image of 2x2-constant blocks must hash identically to the 9x8
    // image of the block values — the downsample-equivalence the dHash
    // convention promises
    val base = (x: Int, y: Int) => ((x * 31 + y * 17) % 200) + 20
    val big = makeBmp(18, 16, (x, y) => base(x / 2, y / 2))
    val small = makeBmp(9, 8, base)
    val Some((_, _, sums, cnts)) = Multimodal.decodeBlockLumaE3(big, 9, 8)
    assert(cnts.forall(_ == 4L))
    for (y <- 0 until 8; x <- 0 until 9)
      assert(sums(y * 9 + x) == 4000L * base(x, y))
    assert(dhashBands(big).get.toSeq == dhashBands(small).get.toSeq)
  }

  test("decodeBlockLumaE3: uneven blocks partition every pixel exactly once") {
    val Some((_, _, _, cnts)) = Multimodal.decodeBlockLumaE3(
      makeBmp(13, 11, (x, y) => (x * 7 + y) % 256), 9, 8)
    assert(cnts.sum == 13L * 11L)
    assert(cnts.forall(_ >= 1L)) // no empty block: w >= bw, h >= bh
  }

  test("dhashBands: hand-computed alternating pattern gives 0x5555 in every band") {
    // g alternates 50/200 by column parity: bit (x, y) = g(x+1) > g(x) is
    // set exactly at even x, so each 16-bit band (two rows of 8 bits) is
    // 0b0101010101010101
    val p = makeBmp(9, 8, (x, _) => if (x % 2 == 0) 50 else 200)
    assert(dhashBands(p).get.toSeq == Seq(0x5555L, 0x5555L, 0x5555L, 0x5555L))
  }

  test("dhashBands: brightness shift is hash-invariant; undecodable/undersized are None") {
    val g = (x: Int, y: Int) => ((x * 53 + y * 29) % 220) + 10
    assert(dhashBands(makeBmp(9, 8, g)).get.toSeq ==
      dhashBands(makeBmp(9, 8, (x, y) => g(x, y) + 16)).get.toSeq)
    assert(dhashBands("not an image".getBytes).isEmpty)
    assert(dhashBands(makeBmp(8, 8, g)).isEmpty) // narrower than the 9-col grid
  }

  test("dhashBandsWide: 8 x 32-bit bands, brightness-invariant, needs a 17x16 image") {
    val g = (x: Int, y: Int) => ((x * 41 + y * 13) % 210) + 15
    val b = dhashBandsWide(makeBmp(17, 16, g)).get
    assert(b.length == 8)
    assert(b.forall(v => v >= 0L && v <= 0xffffffffL))
    assert(b.toSeq == dhashBandsWide(makeBmp(17, 16, (x, y) => g(x, y) + 20)).get.toSeq)
    assert(dhashBandsWide(makeBmp(9, 8, g)).isEmpty)
  }

  test("makeWav8 round-trips through decodeWavFrameSums: exact centered frame sums") {
    // frame-constant levels: frame f sum = 8 * (level - 128); a trailing
    // remainder (3 extra samples) is dropped so frames stay equal-length
    val levels = Array.tabulate(65)(f => 30 + 2 * f)
    val samples = Array.tabulate(65 * 8)(j => levels(j / 8))
    val exact = Multimodal.decodeWavFrameSums(makeWav8(8000, samples), 65).get
    assert(exact.toSeq == levels.map(l => 8L * (l - 128)).toSeq)
    val padded = Multimodal.decodeWavFrameSums(makeWav8(8000, samples ++ Array(255, 255, 255)), 65).get
    assert(padded.toSeq == exact.toSeq)
    assert(Multimodal.decodeWavFrameSums("RIFFnope".getBytes, 65).isEmpty)
    assert(Multimodal.decodeWavFrameSums(makeWav8(8000, Array.fill(64)(100)), 65).isEmpty) // < 1 sample/frame
  }

  test("audioDhashBands: gain shift is hash-invariant, one-frame bump flips <= 2 bits") {
    // cluster 0: docs 0 (base), 1 (+10 gain), 2 (frame-7 bump)
    val b0 = audioDhashBands(fixtureWav(0)).get
    val b1 = audioDhashBands(fixtureWav(1)).get
    val b2 = audioDhashBands(fixtureWav(2)).get
    assert(b0.toSeq == b1.toSeq)
    val ham = b0.zip(b2).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham <= 2, s"bump flipped $ham bits")
  }

  // ---- fixture closed form == real decode path (the oracle premise) ----

  test("fixture BMP/WAV hashed through the REAL decoders equals the closed-form bits") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 123L)) {
      val imgBits = Array.tabulate(64) { i =>
        val (x, y) = (i % 8, i / 8)
        fixtureGray(id, x + 1, y) > fixtureGray(id, x, y)
      }
      assert(dhashBands(fixtureBmp(id)).get.toSeq == bandsFromBits(imgBits).toSeq, s"img doc $id")
      val audBits = Array.tabulate(64)(f => fixtureFrame(id, f + 1) > fixtureFrame(id, f))
      assert(audioDhashBands(fixtureWav(id)).get.toSeq == bandsFromBits(audBits).toSeq, s"wav doc $id")
    }
  }

  test("fixture variants: brightness twin identical, edit twin <= MaxHamming, distinct far") {
    def ham(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val bands = (0L to 4L).map(id => dhashBands(fixtureBmp(id)).get)
    assert(bands(0).toSeq == bands(1).toSeq)
    assert(ham(bands(0), bands(2)) <= MaxHamming)
    assert(ham(bands(0), bands(3)) > MaxHamming)
    assert(ham(bands(0), bands(4)) > MaxHamming)
    assert(ham(bands(3), bands(4)) > MaxHamming)
  }

  // ---- banded pair join: pigeonhole finds, verify rejects ----

  test("bandNearDupPairs: hamming <= 3 pairs surface, band-colliding hamming-4 pairs don't") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(100L, 200L, 300L, 400L)), // base
      (2L, Seq(100L, 200L, 300L, 400L)), // identical (hamming 0)
      (3L, Seq(100L, 200L, 300L, 400L ^ 0x6L)), // hamming 2, bands 0-2 equal
      (4L, Seq(100L, 200L, 300L ^ 0x3L, 400L ^ 0x3L)), // hamming 4, bands 0-1 equal: candidate, REJECTED
      (5L, Seq(900L, 901L, 902L, 903L)) // no shared band
    ).toDF("doc_id", "bands")
    val pairs = bandNearDupPairs(rows).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  // ---- the general media surface (real payloads, not fixtures) ----

  test("imageHashFrame/imageNearDupPairs: undecodable rows flagged and skipped, dups found") {
    import spark.implicits._
    val g = (x: Int, y: Int) => ((x * 53 + y * 29) % 200) + 10
    val media = Seq(
      (1L, makeBmp(9, 8, g)),
      (2L, makeBmp(9, 8, (x, y) => g(x, y) + 16)), // brightness twin of 1
      (3L, makeBmp(9, 8, (x, y) => ((x * 91 + y * 57) % 200) + 10)), // distinct
      (4L, "definitely not an image".getBytes) // undecodable
    ).toDF("doc_id", "payload")
    val hf = imageHashFrame(media).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(hf == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
    val pairs = graft.TrainingData.imageNearDupPairs(media).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("imageNearDupPairs wide: default threshold is MaxHammingWide, pigeonhole guard throws") {
    import spark.implicits._
    // an edit with EXACTLY 5 flipped bits — strictly between the classic
    // (3) and wide (7) thresholds, the case the width-appropriate default
    // exists for (an explicit classic threshold would silently drop it).
    // Base is strictly increasing per row (all 256 bits set); the variant
    // drops the LAST column (which participates in only the final
    // comparison of its row) below its neighbor in 5 rows.
    val g = (x: Int, _: Int) => 10 + 12 * x
    val g2 = (x: Int, y: Int) => if (x == 16 && y < 5) 5 else g(x, y)
    val (ba, bb) = (dhashBandsWide(makeBmp(17, 16, g)).get, dhashBandsWide(makeBmp(17, 16, g2)).get)
    val ham = ba.zip(bb).map { case (p, q) => java.lang.Long.bitCount(p ^ q) }.sum
    assert(ham == 5, s"fixture hamming $ham, expected exactly 5")
    val media = Seq((1L, makeBmp(17, 16, g)), (2L, makeBmp(17, 16, g2))).toDF("doc_id", "payload")
    assert(graft.TrainingData.imageNearDupPairs(media, wide = true)
      .as[(Long, Long)].collect().toSet == Set((1L, 2L)))
    assert(imageNearDupPairs(media, wide = true, maxHamming = MaxHamming)
      .as[(Long, Long)].collect().isEmpty)
    // pigeonhole soundness guard: a threshold >= the band count must throw
    intercept[IllegalArgumentException](imageNearDupPairs(media, maxHamming = 4))
    intercept[IllegalArgumentException](audioNearDupPairs(media, maxHamming = 4))
  }

  test("audioNearDupPairs: gain twin pairs, undecodable skipped") {
    import spark.implicits._
    val media = Seq(
      (1L, fixtureWav(0L)),
      (2L, fixtureWav(1L)), // +10 gain twin
      (3L, fixtureWav(3L)), // distinct content
      (4L, Array[Byte](1, 2, 3))
    ).toDF("doc_id", "payload")
    val pairs = graft.TrainingData.audioNearDupPairs(media).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dhash is exactly resolution-invariant for integer scales through the real decoder") {
    // the x142 claim: a 2x (and 3x) re-render of the same gray function
    // hashes IDENTICALLY — block sums scale by k^2, counts by k^2, and the
    // cross-multiplied comparison cancels the factor; no float drift
    for (id <- 0L to 9L) {
      val base = dhashBands(fixtureBmp(id * 5)).get
      assert(dhashBands(fixtureBmp2x(id * 5)).get.toSeq == base.toSeq, s"2x, img ${id * 5}")
      val bmp3x = makeBmp(27, 24, (x, y) => fixtureGray(id * 5, x / 3, y / 3))
      assert(dhashBands(bmp3x).get.toSeq == base.toSeq, s"3x, img ${id * 5}")
    }
  }

  test("mediaWideFor: BandBoundary as code — classic at the boundary, wide one past it") {
    assert(!mediaWideFor(BandBoundary))
    assert(mediaWideFor(BandBoundary + 1))
    assert(!mediaWideFor(0L))
  }

  test("audioDhashBandsWide: 8 x 32-bit bands, gain-invariant, needs >= 257 samples") {
    // 514 samples, level varies per 2-sample wide-frame — closed-form
    // bits survive the decoder exactly like the classic form's
    def wav(off: Int) = makeWav8(8000,
      Array.tabulate(AudioFramesWide * 2)(j => 30 + (j / 2 * 37) % 181 + off))
    val b = audioDhashBandsWide(wav(0)).get
    assert(b.length == BandsWide)
    assert(b.forall(v => v >= 0 && v <= 0xffffffffL), "32-bit band values")
    assert(audioDhashBandsWide(wav(10)).get.toSeq == b.toSeq, "gain-invariant")
    // a clip shorter than the wide frame count has no wide hash
    assert(audioDhashBandsWide(makeWav8(8000, Array.fill(256)(100))).isEmpty)
    // the same clip still hashes CLASSIC (65 frames)
    assert(audioDhashBands(makeWav8(8000, Array.fill(256)(100))).isDefined)
  }

  test("audioNearDupPairs wide: gain twin pairs at the wide threshold, width-resolved default") {
    import spark.implicits._
    def wav(seed: Int, off: Int) = makeWav8(8000,
      Array.tabulate(AudioFramesWide * 2)(j => 30 + (j / 2 * 37 + seed * 53) % 181 + off))
    val media = Seq(
      (1L, wav(0, 0)),
      (2L, wav(0, 10)), // re-gain twin: hamming 0 wide
      (3L, wav(7, 0))   // distinct content
    ).toDF("doc_id", "payload")
    assert(graft.TrainingData.audioNearDupPairs(media, wide = true)
      .as[(Long, Long)].collect().toSet == Set((1L, 2L)))
    // pigeonhole guard holds per width
    intercept[IllegalArgumentException](
      audioNearDupPairs(media, wide = true, maxHamming = BandsWide))
  }

  test("mediaHashFrame: modality-detected, disjoint candidate spaces, cross-modal never pairs") {
    import spark.implicits._
    val media = Seq(
      (1L, fixtureBmp(0L)),          // image, cluster 0
      (2L, fixtureBmp(1L)),          // its brightness twin
      (3L, fixtureWav(0L)),          // audio, cluster 0 — same closed-form
      (4L, fixtureWav(1L)),          // content FAMILY as the images
      (5L, "neither".getBytes)       // no reader accepts it
    ).toDF("doc_id", "payload")
    val hf = mediaHashFrame(media).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(hf(1L) == ((true, "img")) && hf(2L) == ((true, "img")))
    assert(hf(3L) == ((true, "aud")) && hf(4L) == ((true, "aud")))
    assert(hf(5L)._1 == false)
    // pairs form WITHIN a modality only — even if an image band value
    // happened to collide with an audio one, `mod` keys them apart
    val pairs = graft.TrainingData.mediaNearDupPairs(media)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("small media under wide fall back to classic in width-suffixed spaces — recall stays on") {
    import spark.implicits._
    // a wide-width run (corpus past BandBoundary) containing THUMBNAILS:
    // 9x8 images and 520-sample clips can't fill the 17x16 / 257-frame
    // wide grids — they must still dedup among themselves (classic hash,
    // img16/aud16 spaces) rather than silently dropping out as
    // undecodable
    val media = Seq(
      (1L, fixtureBmpWide(0L)),            // wide-sized image
      (2L, fixtureBmpWide(1L)),            // its brightness twin (wide pair)
      (3L, fixtureBmp(10L)),               // 9x8 thumbnail...
      (4L, fixtureBmp(11L)),               // ...and its brightness twin
      // 200-sample clips: enough for the classic 65 frames, short of the
      // wide 257 (the 520-sample fixtureWav clears BOTH grids)
      (5L, makeWav8(8000, Array.tabulate(200)(j => 30 + (j * 37) % 181))),
      (6L, makeWav8(8000, Array.tabulate(200)(j => 40 + (j * 37) % 181))),
      (7L, "junk".getBytes)                // truly undecodable
    ).toDF("doc_id", "payload")
    val hf = mediaHashFrame(media, wide = true).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(hf(1L) == ((true, "img")) && hf(3L) == ((true, "img16")))
    assert(hf(5L) == ((true, "aud16")) && hf(7L)._1 == false)
    // all three pairs surface; the width-suffixed spaces never meet the
    // wide ones, and the per-row threshold clamp keeps the classic rows
    // at hamming<=3 even though the wide default is 7
    val pairs = mediaNearDupPairs(media, wide = true)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L), (5L, 6L)))
  }

  test("admitMediaCompare: band-width mismatch rejects loudly, never silently zero-recall") {
    import spark.implicits._
    // craft a candidate collision across widths: state band (j=0, bv=5)
    // meets a classic batch band (j=0, bv=5) — the verify must RAISE, not
    // quietly drop the pair
    val state = Seq((10L, Seq(5L, 6L, 7L, 8L, 9L, 10L, 11L, 12L)))
      .toDF("cv_id", "bands")
    val batch = Seq((20L, Seq(5L, 6L, 7L, 8L))).toDF("doc_id", "bands")
    val e = intercept[Exception](
      admitMediaCompare(state, batch).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("band-width mismatch")), e.getMessage)
  }
}
