package graft.xscale

import org.apache.spark.sql.graftnative
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests over RANDOM word-soup documents: the native expressions
  * must agree with independent slow Scala references (sliding/groupBy
  * collections code — a different code path from both the codegen Java and
  * the DuckDB oracles), and chunking must tile for arbitrary (window,
  * stride) choices, not just the x36 defaults.
  */
class XScalePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val genWord = Gen.oneOf("a", "bb", "ccc", "dd", "e", "xy", "zw")
  private val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, genWord)
    sep <- Gen.oneOf(" ", "  ", "\t") // runs of whitespace must not matter
  } yield ws.mkString(sep)

  // ---- slow references (Scala collections, no shared code) ----

  private def refRepetition(text: String): (Long, Long, Long, Long, Long, Long) = {
    val words = text.split("\\s+", -1)
    val lens = words.map(w => w.codePointCount(0, w.length).toLong)
    val totc = lens.sum
    def top(n: Int): Long =
      if (words.length < n) 0L
      else words.sliding(n).toSeq.zipWithIndex
        .groupBy(_._1.mkString(" "))
        .map { case (_, occ) => occ.length.toLong * occ.head._1.map(w => w.codePointCount(0, w.length).toLong).sum }
        .max
    def cov(n: Int): Long =
      if (words.length < n) 0L
      else {
        val grams = words.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val covered = Array.fill(words.length)(false)
        grams.zipWithIndex.foreach { case (g, i) =>
          if (counts(g) >= 2) (i until i + n).foreach(covered(_) = true)
        }
        covered.zip(lens).collect { case (true, l) => l }.sum
      }
    (totc, top(2), top(3), top(4), cov(5), cov(6))
  }

  private def refWindows(text: String, k: Int): Seq[Long] = {
    val words = text.split("\\s+", -1)
    if (words.length < k) Seq.empty
    else words.sliding(k).map(g => XHash.h60(g.mkString(" "))).toSeq
  }

  test("RepetitionMetrics == slow reference on random texts") {
    val texts = samples(genText, 60).distinct
    val native = texts.toDF("text")
      .select(col("text"), graftnative.api.repetitionMetrics(col("text")).as("m"))
      .selectExpr("text", "m.totc", "m.top2", "m.top3", "m.top4", "m.cov5", "m.cov6")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect()
    native.foreach { case (t, totc, t2, t3, t4, c5, c6) =>
      assert((totc, t2, t3, t4, c5, c6) == refRepetition(t), s"text=<$t>")
    }
  }

  test("WindowHash60 == slow reference on random texts and k") {
    for (k <- Seq(1, 2, 3, 5)) {
      val texts = samples(genText, 40).distinct
      val native = texts.toDF("text")
        .select(col("text"), graftnative.api.windowHash60(col("text"), k).as("h"))
        .as[(String, Seq[Long])].collect()
      native.foreach { case (t, hs) =>
        assert(hs == refWindows(t, k), s"k=$k text=<$t>")
      }
    }
  }

  test("chunkDocs tiles for arbitrary (window, stride)") {
    val genWS = for {
      w <- Gen.chooseNum(1, 12)
      s <- Gen.chooseNum(1, w)
    } yield (w, s)
    val texts = samples(genText, 25).distinct.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = texts.toDF("doc_id", "text")
    for ((w, s) <- samples(genWS, 8).distinct) {
      val ch = DataPrep.chunkDocs(docs, w, s)
        .select("doc_id", "chunk_id", "start_tok", "n_tok")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1)
      val nws = texts.map { case (id, t) => id -> t.split("\\s+", -1).length.toLong }.toMap
      for ((id, rows) <- ch) {
        val sorted = rows.sortBy(_._2)
        assert(sorted.head._3 == 1L) // first chunk starts at token 1
        assert(sorted.last._3 + sorted.last._4 - 1 == nws(id)) // last ends at nw
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._3 - a._3 == s) // exact stride spacing
          case _ =>
        }
        assert(sorted.forall(r => r._4 >= 1 && r._4 <= w))
      }
      assert(ch.keySet == texts.map(_._1).toSet)
    }
  }

  test("parseHeader roundtrips arbitrary dimensions through real container layouts") {
    // byte-layout encoders independent of the parser (same layouts the
    // MultimodalSpec fixtures use, here driven by random dimensions)
    def be32(x: Long): Seq[Byte] = Seq(24, 16, 8, 0).map(s => ((x >> s) & 0xff).toByte)
    def le16(x: Int): Seq[Byte] = Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
    def le32(x: Long): Seq[Byte] = Seq(0, 8, 16, 24).map(s => ((x >> s) & 0xff).toByte)
    def png(w: Long, h: Long) =
      (Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++ Seq[Byte](8, 6, 0, 0, 0)).toArray
    def gif(w: Int, h: Int) =
      ("GIF87a".getBytes.toSeq ++ le16(w) ++ le16(h) ++ Seq[Byte](0, 0, 0)).toArray
    def bmp(w: Int, h: Int) =
      ("BM".getBytes.toSeq ++ le32(122) ++ le32(0) ++ le32(54) ++ le32(40) ++
        le32(w.toLong & 0xffffffffL) ++ le32(h.toLong & 0xffffffffL) ++
        le16(1) ++ le16(24) ++ Seq.fill(24)(0.toByte)).toArray
    val genDim = Gen.chooseNum(0, Int.MaxValue)
    for (Seq(w, h) <- samples(Gen.listOfN(2, genDim), 40)) {
      assert(Multimodal.parseHeader(png(w.toLong, h.toLong)) === Some(("png", w.toLong, h.toLong)))
      assert(Multimodal.parseHeader(gif(w & 0xffff, h & 0xffff)) ===
        Some(("gif", (w & 0xffff).toLong, (h & 0xffff).toLong)))
      // BMP height may legally be negative (top-down); dimensions come
      // back as magnitudes
      assert(Multimodal.parseHeader(bmp(w, -h)) ===
        Some(("bmp", math.abs(w).toLong, math.abs(h).toLong)))
    }
    // WAV: duration must equal dataSize * 1000 / byteRate for random rates
    val genRate = Gen.chooseNum(1, 4000000)
    for (Seq(rate, data) <- samples(Gen.listOfN(2, genRate), 20)) {
      val bytes = ("RIFF".getBytes.toSeq ++ le32(36L + data) ++ "WAVE".getBytes.toSeq ++
        "fmt ".getBytes.toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
        le32(8000L) ++ le32(rate.toLong) ++ le16(4) ++ le16(16) ++
        "data".getBytes.toSeq ++ le32(data.toLong)).toArray
      assert(Multimodal.parseHeader(bytes) ===
        Some(("wav", data.toLong * 1000L / rate, 8000L)))
    }
  }

  // slow reference for x51: same integer arithmetic, Scala collections
  private def refDsir(
      docs: Seq[(Long, String, Boolean)], buckets: Int): Map[Long, (Long, Long)] = {
    val feats = docs.flatMap { case (id, text, t) =>
      (refWindows(text, 1) ++ refWindows(text, 2)).map(h => (id, t, h % buckets))
    }
    val ct = feats.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = feats.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tAll = ct.values.sum
    val rAll = cr.values.sum
    def w(b: Long): Long = {
      val ratio = ((ct.getOrElse(b, 0L) + 1) * 1000000L) / (cr.getOrElse(b, 0L) + 1)
      val scale = ((rAll + buckets) * 1000000L) / (tAll + buckets)
      ratio * scale / 1000000L
    }
    feats.filterNot(_._2).groupBy(_._1).map { case (id, fs) =>
      val sw = fs.map(f => w(f._3)).sum
      id -> (fs.size.toLong, sw / fs.size)
    }
  }

  test("dsirWeights == slow reference on random corpora and target splits") {
    val genDoc = for { t <- genText; isT <- Gen.oneOf(true, false) } yield (t, isT)
    for ((corpus, i) <- samples(Gen.listOfN(12, genDoc), 8).zipWithIndex) {
      val docs = corpus.zipWithIndex.map { case ((t, isT), id) => (id.toLong, t, isT) }
      val buckets = Seq(7, 64, 512)(i % 3) // non-power-of-two must work too
      val df = docs.map { case (id, t, isT) => (id, s"s${id % 3}", isT, t) }
        .toDF("doc_id", "source", "is_t", "text")
      val got = DataPrep.dsirWeights(df, col("is_t"), buckets)
        .select("doc_id", "n_feat", "score_e6")
        .as[(Long, Long, Long)].collect()
        .map { case (id, nf, sc) => id -> (nf, sc) }.toMap
      assert(got === refDsir(docs, buckets), s"sample $i buckets=$buckets")
    }
  }

  /** Sequential BPE reference: same defined semantics (frequency-weighted
    * word-type vocab; winner = max count, ties lexicographic; padded
    * String.replace merging — the JVM's non-overlapping left-to-right scan,
    * the exact contract bpeTrain documents) but pure Scala collections,
    * no Spark in the loop.
    */
  private def refBpe(texts: Seq[String], merges: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[String, Long] = texts
      .flatMap(_.toLowerCase.split("\\s+", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => w.toCharArray.mkString(" ") -> f }
      .groupBy(_._1).view.mapValues(_.values.sum).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= merges && !done) {
      val pairCounts = vocab.toSeq.flatMap { case (sym, f) =>
        val ws = sym.split(" ")
        ws.zip(ws.drop(1)).map { case (a, b) => (s"$a $b", f) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.isEmpty) done = true
      else {
        val (pair, cnt) = pairCounts.toSeq.minBy { case (p, c) => (-c, p) }
        val merged = pair.replace(" ", "")
        out += ((r.toLong, pair, merged, cnt))
        vocab = vocab.toSeq
          .map { case (sym, f) => (s" $sym ".replace(s" $pair ", s" $merged ").trim, f) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        r += 1
      }
    }
    out.toSeq
  }

  test("bpeTrain == sequential reference on random corpora") {
    for ((texts, i) <- samples(Gen.listOfN(12, genText), 6).zipWithIndex) {
      val df = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val rounds = Seq(2, 4, 6)(i % 3)
      assert(TextAnalysis.bpeTrain(df, rounds) === refBpe(texts, rounds), s"sample $i")
    }
  }

  test("minhashPairsSigs == minhashPairs on random corpora (signature-currency parity)") {
    // The sidecar path (dedupSignatures → element_at band keys) must emit
    // the exact pair stream the text path (withSignature sig0..sigK
    // columns) emits — for arbitrary corpora, not just the fixtures. Near
    // pairs are forced by appending one token to a copy of every third doc.
    for ((texts, i) <- samples(Gen.listOfN(14, genText), 4).zipWithIndex) {
      val base = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
      val nears = base.collect { case (id, t) if id % 3 == 0 => (id + 1000L, s"$t zq") }
      val df = (base ++ nears).toDF("doc_id", "text")
      def key(r: (Long, Long, Long)) = r
      val viaText = Dedup.minhashPairs(df)
        .select("doc_id_a", "doc_id_b", "n_match")
        .as[(Long, Long, Long)].collect().map(key).toSet
      val viaSigs = Dedup.minhashPairsSigs(Dedup.dedupSignatures(df))
        .select("doc_id_a", "doc_id_b", "n_match")
        .as[(Long, Long, Long)].collect().map(key).toSet
      assert(viaSigs === viaText, s"sample $i")
      // the planted near pairs guarantee the comparison is not vacuous
      assert(viaText.nonEmpty, s"sample $i produced no pairs")
    }
  }

  // ---- x151 utterance segmentation vs an independent reference ----

  /** Independent sequential segmenter, expressed the OPPOSITE way from the
    * production decoder's streaming state machine: mark every maximal
    * silent run of length >= gapMin as a SEPARATOR, split the index range
    * on separator positions, and count/measure the remaining maximal
    * intervals that contain at least one voiced sample. No shared code,
    * no shared traversal shape.
    */
  private def refUtterances(
      samples: Array[Long], silenceMax: Long, gapMin: Int): (Long, Long, Long) = {
    val n = samples.length
    val silent = samples.map(s => math.abs(s) <= silenceMax)
    val isSep = Array.fill(n)(false)
    var i = 0
    while (i < n) {
      if (silent(i)) {
        var j = i
        while (j < n && silent(j)) j += 1
        if (j - i >= gapMin) (i until j).foreach(isSep(_) = true)
        i = j
      } else i += 1
    }
    var utt = 0L
    var longest = 0L
    i = 0
    while (i < n) {
      if (!isSep(i)) {
        var j = i
        while (j < n && !isSep(j)) j += 1
        if ((i until j).exists(k => !silent(k))) {
          utt += 1
          if (j - i > longest) longest = j - i
        }
        i = j
      } else i += 1
    }
    (n.toLong, utt, longest)
  }

  /** Minimal 16-bit mono PCM WAV writer, local to this spec (the main
    * source only ships the 8-bit form) — exercises the le16 sample path.
    */
  private def wav16(samples: Seq[Int]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + 2 * n)
    def le16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
    def tag(o: Int, s: String): Unit = s.indices.foreach(j => out(o + j) = s(j).toByte)
    tag(0, "RIFF"); le32(4, 36 + 2 * n); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, 2 * n)
    samples.zipWithIndex.foreach { case (s, j) => le16(44 + 2 * j, s & 0xffff) }
    out
  }

  test("x151 utterances: arbitrary-alignment silence agrees with the independent segmenter") {
    // The registered fixture's silence falls in full 8-sample bands
    // (structural exactness — documented on decodeWavUtterances), so the
    // oracle alone can't catch an off-by-one at a silence boundary. Here
    // run lengths are 1..12 — NEVER band-aligned by construction — and
    // every (gapMin, silenceMax) combination must agree with the
    // reference at both bit depths, including runs that straddle the
    // clip's start and end.
    val genRun: Gen[List[Int]] = for {
      silent <- Gen.oneOf(true, false)
      len <- Gen.chooseNum(1, 12)
      base <- if (silent) Gen.chooseNum(-1, 1) else Gen.chooseNum(2, 125)
      sign <- Gen.oneOf(1, -1)
    } yield List.fill(len)(if (silent) base else sign * base)
    val genClip: Gen[List[Int]] = for {
      nRuns <- Gen.chooseNum(1, 16)
      runs <- Gen.listOfN(nRuns, genRun)
    } yield runs.flatten
    for {
      clip <- samples(genClip, 50)
      gapMin <- Seq(1, 2, 5, 8)
      silenceMax <- Seq(0L, 1L, 3L)
    } {
      val ref = refUtterances(clip.map(_.toLong).toArray, silenceMax, gapMin)
      val got8 = Multimodal.decodeWavUtterances(
        PerceptualDedup.makeWav8(8000, clip.map(_ + 128).toArray), silenceMax, gapMin)
      assert(got8 == Some(ref), s"8-bit gapMin=$gapMin silenceMax=$silenceMax clip=$clip")
      val got16 = Multimodal.decodeWavUtterances(wav16(clip), silenceMax, gapMin)
      assert(got16 == Some(ref), s"16-bit gapMin=$gapMin silenceMax=$silenceMax clip=$clip")
    }
  }

  /** Independent reference for the x153 voiced-core moments — the
    * OPPOSITE formulation again: split the sample array on separator
    * runs, slice each surviving segment to [first voiced, last voiced],
    * and fold the slice's moments. No shared traversal.
    */
  private def refUtteranceStats(
      samples: Array[Long], silenceMax: Long, gapMin: Int): (Seq[Long], Seq[Long]) = {
    val n = samples.length
    val silent = samples.map(s => math.abs(s) <= silenceMax)
    val isSep = Array.fill(n)(false)
    var i = 0
    while (i < n) {
      if (silent(i)) {
        var j = i
        while (j < n && silent(j)) j += 1
        if (j - i >= gapMin) (i until j).foreach(isSep(_) = true)
        i = j
      } else i += 1
    }
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sqs = scala.collection.mutable.ArrayBuffer.empty[Long]
    i = 0
    while (i < n) {
      if (!isSep(i)) {
        var j = i
        while (j < n && !isSep(j)) j += 1
        val voicedIdx = (i until j).filter(k => !silent(k))
        if (voicedIdx.nonEmpty) {
          val core = (voicedIdx.head to voicedIdx.last).map(samples)
          sums += core.sum
          sqs += core.map(s => s * s).sum
        }
        i = j
      } else i += 1
    }
    (sums.toSeq, sqs.toSeq)
  }

  test("x153 voiced-core moments: arbitrary-alignment silence agrees with the reference") {
    // same never-band-aligned clip generator as the x151 property; the
    // silent runs carry NONZERO values (-1..1) so a core that wrongly
    // included or excluded edge silence would change a moment
    val genRun: Gen[List[Int]] = for {
      silent <- Gen.oneOf(true, false)
      len <- Gen.chooseNum(1, 12)
      base <- if (silent) Gen.chooseNum(-1, 1) else Gen.chooseNum(2, 125)
      sign <- Gen.oneOf(1, -1)
    } yield List.fill(len)(if (silent) base else sign * base)
    val genClip: Gen[List[Int]] = for {
      nRuns <- Gen.chooseNum(1, 16)
      runs <- Gen.listOfN(nRuns, genRun)
    } yield runs.flatten
    for {
      clip <- samples(genClip, 40)
      gapMin <- Seq(1, 2, 5, 8)
      silenceMax <- Seq(0L, 1L, 3L)
    } {
      val ref = refUtteranceStats(clip.map(_.toLong).toArray, silenceMax, gapMin)
      val got = Multimodal.decodeWavUtteranceStats(
        PerceptualDedup.makeWav8(8000, clip.map(_ + 128).toArray), silenceMax, gapMin)
        .map { case (s, q) => (s.toSeq, q.toSeq) }
      assert(got == Some(ref), s"gapMin=$gapMin silenceMax=$silenceMax clip=$clip")
      // and the one-pass combined decoder agrees sample-for-sample
      val comb = Multimodal.decodeWavWindowsUtterances(
        PerceptualDedup.makeWav8(8000, clip.map(_ + 128).toArray), 65, silenceMax, gapMin)
        .map { case (_, s, q) => (s.toSeq, q.toSeq) }
      assert(comb == Some(ref), s"combined gapMin=$gapMin silenceMax=$silenceMax")
    }
  }

  test("vocabGrowth conserves docs, tokens and vocabulary for arbitrary phase counts") {
    for ((texts, i) <- samples(Gen.listOfN(15, genText), 6).zipWithIndex) {
      val phases = Seq(1, 3, 10)(i % 3)
      val df = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val rows = TextAnalysis.vocabGrowth(df, phases)
        .select("phase", "n_docs", "n_tok", "new_terms", "cum_vocab")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(rows.map(_._2).sum === texts.length.toLong)
      assert(rows.map(_._3).sum === texts.map(_.split("\\s+", -1).length.toLong).sum)
      val vocab = texts.flatMap(_.split("\\s+", -1)).distinct.length.toLong
      assert(rows.map(_._4).sum === vocab)
      assert(rows.last._5 === vocab)
      // cumulative is the running sum and phases stay inside [0, phases)
      rows.scanLeft(0L)((a, r) => a + r._4).tail.zip(rows.map(_._5))
        .foreach { case (e, g) => assert(g === e) }
      assert(rows.forall(r => r._1 >= 0 && r._1 < phases))
    }
  }

  test("x154 per-frame tile moments: AVI walk == extractAviFrames + imageio on random clips") {
    // THREE independent code paths must agree on random geometry: the
    // direct DIB walk (decodeAviFrameTileStats — bottom-up rows mapped in
    // place), the real container surgery + javax.imageio route
    // (extractAviFrames builds a standalone BMP per frame, the image
    // tile decoder reads it back), and the combined one-pass decoder.
    // Random non-tile-aligned sizes exercise the dropped partial edge
    // tiles; the asymmetric per-pixel gray would expose any row-order or
    // channel-order slip as a different moment.
    val gen: Gen[(Int, Int, Int, Int)] = for {
      w <- Gen.chooseNum(4, 37)
      h <- Gen.chooseNum(4, 29)
      nf <- Gen.chooseNum(1, 4)
      tile <- Gen.oneOf(3, 5, 8)
    } yield (w, h, nf, tile)
    for (((w, h, nf, tile), i) <- samples(gen, 25).zipWithIndex) {
      def g(f: Int, x: Int, y: Int) = (x * 31 + y * 17 + f * 57 + i * 13) % 251
      val avi = PerceptualDedup.makeAvi(w, h, nf, g)
      val got = Multimodal.decodeAviFrameTileStats(avi, tile)
      if (w / tile == 0 || h / tile == 0) assert(got.isEmpty, s"w=$w h=$h tile=$tile")
      else {
        val Some((tx, ty, fs, fq)) = got
        assert(tx == w / tile && ty == h / tile && fs.length == nf)
        val frames = Multimodal.extractAviFrames(
          Seq((1L, avi)).toDF("doc_id", "payload"))
          .orderBy("frame_idx").select("payload").as[Array[Byte]].collect()
        assert(frames.length == nf)
        frames.zipWithIndex.foreach { case (bmp, f) =>
          val Some((rtx, rty, rs, rq)) = Multimodal.decodeImageTileStats(bmp, tile)
          assert(rtx == tx && rty == ty)
          assert(fs(f).sameElements(rs) && fq(f).sameElements(rq),
            s"f=$f w=$w h=$h tile=$tile")
        }
        val Some((cs, cq, ctx, cty, cfs, cfq)) =
          Multimodal.decodeAviFrameStatsTiles(avi, tile)
        val Some((_, _, ss, sq)) = Multimodal.decodeAviFrameStats(avi)
        assert(cs.sameElements(ss) && cq.sameElements(sq) && ctx == tx && cty == ty)
        assert(cfs.indices.forall(f =>
          cfs(f).sameElements(fs(f)) && cfq(f).sameElements(fq(f))))
      }
    }
  }

  test("x156 scaled tile moments: simulated canonical downscale == imageio on a materialized downscale") {
    // THE x156 exactness contract: decodeImageBlocksTilesScales' scaled
    // pass must be BIT-IDENTICAL to actually materializing the canonical
    // k-box downscale (per-channel round-half-up integer average) as a
    // real BMP and decoding its tiles through javax.imageio — i.e. the
    // simulation and an adversary's canonical thumbnailer agree on every
    // moment. Random DISTINCT per-channel content exercises the channel
    // rounding (a luma-first slip would differ); random non-aligned
    // sizes exercise the dropped remainder rows/cols and partial tiles.
    // The native-tile and grid halves are pinned against the existing
    // decoders in the same pass.
    def makeRgbBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val dataSize = rowSize * h
      val out = new Array[Byte](54 + dataSize)
      def le16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
      out(0) = 'B'.toByte; out(1) = 'M'.toByte
      le32(2, 54 + dataSize); le32(10, 54)
      le32(14, 40); le32(18, w); le32(22, h)
      le16(26, 1); le16(28, 24); le32(30, 0); le32(34, dataSize)
      le32(38, 2835); le32(42, 2835)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = px(x, y)
          val o = 54 + (h - 1 - y) * rowSize + x * 3
          out(o) = (b & 0xff).toByte; out(o + 1) = (g & 0xff).toByte
          out(o + 2) = (r & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    val gen: Gen[(Int, Int, Int, Int)] = for {
      w <- Gen.chooseNum(8, 61)
      h <- Gen.chooseNum(8, 53)
      k <- Gen.oneOf(2, 3, 4, 5)
      tile <- Gen.oneOf(3, 8)
    } yield (w, h, k, tile)
    for (((w, h, k, tile), i) <- samples(gen, 30).zipWithIndex) {
      def ch(x: Int, y: Int) =
        ((x * 37 + y * 11 + i * 7) % 251, (x * 13 + y * 29 + i * 3) % 251,
          (x * 5 + y * 41 + i * 17) % 251)
      val bmp = makeRgbBmp(w, h, ch)
      val wk = w / k
      val hk = h / k
      val got = Multimodal.decodeImageTileStatsScaled(bmp, tile, k)
      if (wk / tile <= 0 || hk / tile <= 0) assert(got.isEmpty, s"w=$w h=$h k=$k tile=$tile")
      else {
        // slow reference: materialize the canonical downscale, decode it
        val down = makeRgbBmp(wk, hk, (u, v) => {
          var sr = 0L; var sg = 0L; var sb = 0L
          var dy = 0
          while (dy < k) {
            var dx = 0
            while (dx < k) {
              val (r, g, b) = ch(u * k + dx, v * k + dy)
              sr += r; sg += g; sb += b
              dx += 1
            }
            dy += 1
          }
          val div = k.toLong * k
          val half = div / 2
          (((sr + half) / div).toInt, ((sg + half) / div).toInt, ((sb + half) / div).toInt)
        })
        val Some((rtx, rty, rs, rq)) = Multimodal.decodeImageTileStats(down, tile)
        val Some((gtx, gty, gs, gq)) = got
        assert(gtx == rtx && gty == rty, s"w=$w h=$h k=$k tile=$tile")
        assert(gs.sameElements(rs) && gq.sameElements(rq), s"w=$w h=$h k=$k tile=$tile")
      }
      // the native-tile and grid halves of the combined pass reproduce
      // the existing decoders bit-exact on the same bytes
      if (w >= 9 && h >= 8) {
        val Some((cgs, cgc, ctx, cty, cts, ctq, _)) =
          Multimodal.decodeImageBlocksTilesScales(bmp, 9, 8, tile, Seq(k))
        val Some((egs, egc, etx, ety, ets, etq)) =
          Multimodal.decodeImageBlocksTiles(bmp, 9, 8, tile)
        assert(cgs.sameElements(egs) && cgc.sameElements(egc))
        assert(ctx == etx && cty == ety)
        assert(cts.sameElements(ets) && ctq.sameElements(etq))
      }
    }
  }
}
