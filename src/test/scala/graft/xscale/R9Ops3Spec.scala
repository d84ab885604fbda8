package graft.xscale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics tests for the round-9 closing operators: embedding anisotropy
  * (x124), intra-doc chunk divergence (x125), dedup length bias (x126),
  * dedup × filter stage overlap (x127), dedup signal agreement (x128),
  * simhash threshold sweep (x129), token-length profile (x130), pairwise
  * source TV matrix (x131), token-distribution diversity (x132), near-dup
  * split leakage (x133), corpus shuffle audit (x134), label separation
  * (x135).
  */
class R9Ops3Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("x124 anisotropy: collapsed cone scores 1e6, orthogonal one-hots score 1e6/n") {
    // label 0: four IDENTICAL one-hot vectors (a fully collapsed cone)
    // label 1: four ORTHOGONAL one-hot vectors (maximally spread)
    def oneHot(i: Int): Seq[Float] = Seq.tabulate(4)(j => if (j == i) 1.0f else 0.0f)
    val emb = (
      (0 until 4).map(k => (k.toLong, oneHot(0), 0)) ++
        (0 until 4).map(k => (4L + k, oneHot(k), 1))
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.anisotropy(emb)
      .select("label", "n_vecs", "anis_e6").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    val byLabel = out.map(r => r._1 -> r).toMap
    assert(byLabel(0L) == ((0L, 4L, 1000000L)), s"collapsed: ${byLabel(0L)}")
    assert(byLabel(1L) == ((1L, 4L, 250000L)), s"orthogonal: ${byLabel(1L)}")
    // overall row: all 8 vectors; 5 vecs share dim 0 → A = 5e12·5 + 3·1e12... recount:
    // dims sums = [5,1,1,1]·1e6 → A = (25+1+1+1)·1e12, B = 8·1e12, n = 8
    assert(byLabel(-1L) == ((-1L, 8L, 1000000L * 28 / (8 * 8))), s"overall: ${byLabel(-1L)}")
  }

  test("x124 anisotropy: fixture rows match an exact BigInt recount per label") {
    val emb = graft.query.Registry.table(spark, sf, "embeddings")
    val out = Similarity.anisotropy(emb)
      .select("label", "n_vecs", "anis_e6").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rows = emb.select(col("label").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (l, v) => (l, v.map(x => math.floor(x * 1e6).toLong)) }
    def score(vs: Seq[Seq[Long]]): (Long, Long) = {
      val dims = vs.head.length
      val s = (0 until dims).map(j => BigInt(vs.map(_(j)).sum))
      val a = s.map(x => x * x).sum
      val b = vs.flatten.map(x => BigInt(x) * x).sum
      (vs.length.toLong, (BigInt(1000000) * a / (BigInt(vs.length) * b)).toLong)
    }
    rows.groupBy(_._1).foreach { case (l, g) =>
      assert(out(l) == score(g.map(_._2).toSeq), s"label $l")
    }
    assert(out(-1L) == score(rows.map(_._2).toSeq), "overall row")
    // bounds: Cauchy–Schwarz caps at 1e6
    out.values.foreach { case (_, anis) => assert(anis >= 0 && anis <= 1000000L) }
  }

  test("x125 chunk divergence: identical chunks score 0, a concat seam scores higher") {
    val coherent = Seq.fill(56)("w").mkString(" ") // 2 chunks, both all-"w"
    val seam = ((1 to 24).map(i => s"alpha$i") ++ (25 to 56).map(i => s"beta$i")).mkString(" ")
    val short = "just five tokens right here" // 1 chunk → no pairs → absent
    val docs = Seq(
      (1L, "coh", coherent), (2L, "mix", seam), (3L, "tiny", short))
      .toDF("doc_id", "source", "text")
    val out = DataPrep.chunkDivergence(docs)
      .select("source", "n_docs_mc", "n_mixed", "mixed_e6", "n_pairs", "mean_div_e6")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains("tiny"), "single-chunk docs have no pairs and no row")
    assert(out("coh") == (("coh", 1L, 0L, 0L, 1L, 0L)), s"coherent: ${out("coh")}")
    val mix = out("mix")
    assert(mix._2 == 1L && mix._5 == 1L && mix._6 > 0L, s"seam diverges: $mix")
    assert((mix._3 == 1L) == (mix._6 >= DataPrep.DivergeE6))
  }

  test("x125 chunk divergence: fixture pair counts match the chunk-count recount") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = DataPrep.chunkDivergence(docs)
      .select("source", "n_docs_mc", "n_pairs").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val nc = DataPrep.chunkDocs(docs).groupBy("doc_id").agg(count(lit(1)).as("nc"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .filter(col("nc") >= 2)
      .groupBy("source")
      .agg(count(lit(1)).as("n_mc"), sum(expr("nc * (nc - 1) div 2")).as("pairs"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == nc.keySet)
    nc.foreach { case (s, v) => assert(out(s) == v, s"source $s") }
  }

  test("x126 dedup length bias: exact counts, masses and bias on a planted frame") {
    val docs = Seq(
      (1L, "A", "x y z"), // kept (owner of the x-y-z group)
      (2L, "A", "x y z"), // dropped, internal
      (3L, "A", "a b c d e f"), // kept, unique
      (4L, "B", "x y z"), // dropped, external (owner is doc 1 in A)
      (5L, "B", "p q r s")) // kept, unique
      .toDF("doc_id", "source", "text")
    val out = Dedup.dedupLengthBias(docs)
      .select("source", "n_kept", "n_dropped", "tok_kept", "tok_dropped",
        "kept_mean_e6", "dropped_mean_e6", "bias_e6")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 2L, 1L, 9L, 3L, 4500000L, 3000000L,
      1000000L * 3 * 2 / (1 * 9))), s"A: ${out("A")}")
    assert(out("B") == (("B", 1L, 1L, 4L, 3L, 4000000L, 3000000L,
      1000000L * 3 * 1 / (1 * 4))), s"B: ${out("B")}")
  }

  test("x127 stage overlap: cells partition the corpus and threshold extremes behave") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
      .select("doc_id", "source", "text", "n_chars")
    val out = Dedup.stageOverlap(docs)
      .select("source", "n_docs", "drop_dedup", "drop_filter", "drop_both",
        "only_dedup", "only_filter", "n_survive", "subsume_e6")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (s, n, dd, df, both, od, of, surv, sub) =>
      assert(both + od + of + surv == n, s"cells partition at $s")
      assert(dd == both + od && df == both + of, s"marginals at $s")
      if (dd == 0) assert(sub == 0L, s"sentinel at $s")
      else assert(sub == 1000000L * both / dd, s"subsume formula at $s")
    }
    // dedup marginal must equal the dedup's own accounting, threshold-free
    val bias = Dedup.dedupLengthBias(docs)
      .select("source", "n_dropped").as[(String, Long)].collect().toMap
    out.foreach { case (s, _, dd, _, _, _, _, _, _) => assert(dd == bias(s), s"dedup leg at $s") }
    // thr = 0 → nothing filtered; thr > 1e4 → everything filtered
    Dedup.stageOverlap(docs, 0L).select("drop_filter").as[Long].collect()
      .foreach(v => assert(v == 0L))
    val all = Dedup.stageOverlap(docs, 10001L)
      .select("n_docs", "drop_filter").as[(Long, Long)].collect()
    all.foreach { case (n, df) => assert(df == n) }
  }

  test("x128 signal agreement: planted text-only / emb-only / both pairs land in their cells") {
    def oneHot(i: Int): Seq[Float] = Seq.tabulate(4)(j => if (j == i) 1.0f else 0.0f)
    // ids start at 0: the k-means quantizer seeds from vec_id < nc
    val docs = Seq(
      (0L, "apple banana cherry date elderberry fig"),
      (1L, "apple banana cherry date elderberry fig"), // text dup of 0
      (2L, "quantum flux capacitor neutrino entangles boson"),
      (3L, "grilled paneer skewers rest beside tamarind chutney"),
      (4L, "violin sonata crescendos through the midnight hall"),
      (5L, "violin sonata crescendos through the midnight hall")) // text dup of 4
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, oneHot(0), 0), (1L, oneHot(0), 0), // emb dup pair (0,1) → BOTH
      (2L, oneHot(1), 0), (3L, oneHot(1), 0), // emb dup pair (2,3) → emb-only
      (4L, oneHot(2), 0), (5L, oneHot(3), 0)) // orthogonal → text-only (4,5)
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.signalAgreement(docs, emb, nc = 1)
      .select("n_ids", "n_pairs_text", "n_pairs_emb", "n_both",
        "only_text", "only_emb", "n_union", "jaccard_e6")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((6L, 2L, 2L, 1L, 1L, 1L, 3L, 1000000L / 3)), s"cells: $out")
  }

  test("x128 signal agreement: fixture identities hold and ids cover the embedded set") {
    val out = graft.query.Registry.queries("x128_signal_agreement")(spark, sf)
      .select("n_ids", "n_pairs_text", "n_pairs_emb", "n_both",
        "only_text", "only_emb", "n_union", "jaccard_e6")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nIds, t, e, both, ot, oe, u, j) = out
    assert(nIds == graft.query.Registry.table(spark, sf, "embeddings").count())
    assert(ot == t - both && oe == e - both)
    assert(u == t + e - both)
    assert(j == (if (u == 0) 0L else 1000000L * both / u))
  }

  test("x129 threshold sweep: cumulative, zero-completed, endpoints match the dedup run") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = Dedup.simhashThresholdSweep(docs)
      .select("thr", "n_pairs", "n_docs").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L to 8L), "full zero-completed grid")
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2 && a._3 <= b._3, s"cumulative: $a -> $b")
      case _ =>
    }
    val pairs = Dedup.simhashPairs(docs)
    assert(out.last._2 == pairs.count(), "thr=8 pairs == the x04 dedup run")
    val touched = pairs.select(col("doc_id_a").as("id"))
      .unionByName(pairs.select(col("doc_id_b").as("id"))).distinct().count()
    assert(out.last._3 == touched, "thr=8 docs == distinct pair endpoints")
    // per-threshold docs equal a direct recount at thr=4
    val t4 = pairs.filter(col("hamming") <= 4)
    val t4docs = t4.select(col("doc_id_a").as("id"))
      .unionByName(t4.select(col("doc_id_b").as("id"))).distinct().count()
    assert(out(4) == ((4L, t4.count(), t4docs)), s"thr=4 recount: ${out(4)}")
  }

  test("x130 token profile: exact geometry on a planted frame, fixture mass recounts") {
    val docs = Seq(
      (1L, "A", "ab cd"), // 2 tokens, mass 4, mean 2e6, max 2
      (2L, "A", "x"), // 1 token, mass 1
      (3L, "B", "aaaaaaaaaaaaaaaaaaaa 12345 zz")) // 20-char long tok + numeric
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.tokenLengthProfile(docs)
      .select("source", "n_tok", "char_mass", "mean_len_e6", "max_len",
        "n_long", "long_share_e6", "n_num", "num_share_e6")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 3L, 5L, 5000000L / 3, 2L, 0L, 0L, 0L, 0L)), s"A: ${out("A")}")
    assert(out("B") == (("B", 3L, 27L, 9000000L, 20L, 1L, 1000000L / 3, 1L,
      1000000L / 3)), s"B: ${out("B")}")
    // fixture: per-source token count and char mass match an explode recount
    val real = graft.query.Registry.table(spark, sf, "documents")
    val got = TextAnalysis.tokenLengthProfile(real)
      .select("source", "n_tok", "char_mass").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rec = real.select(col("source"), explode(XText.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source").agg(count(lit(1)).as("n"), sum(length(col("w"))).as("m"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == rec.keySet)
    rec.foreach { case (s, v) => assert(got(s) == v, s"recount at $s") }
  }

  test("x131 TV matrix: identical sources 0, disjoint 1e6, full grid, symmetric recount") {
    val docs = Seq(
      (1L, "twin1", "alpha beta gamma alpha"),
      (2L, "twin2", "alpha beta gamma alpha"), // identical distribution → TV 0
      (3L, "other", "delta epsilon zeta eta")) // disjoint vocabulary → TV 1e6
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceTvMatrix(docs)
      .select("source_a", "source_b", "n_a", "n_b", "n_shared", "tv_e6")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 3, "full |S|(|S|-1)/2 grid")
    assert(out(("twin1", "twin2"))._6 == 0L, "identical distributions")
    assert(out(("other", "twin1"))._6 == 1000000L && out(("other", "twin1"))._5 == 0L,
      "disjoint vocabularies score exactly 1e6 with zero shared terms")
    // fixture: every pair bounded, grid complete, and one cell BigInt-recounted
    val real = graft.query.Registry.table(spark, sf, "documents")
    val m = TextAnalysis.sourceTvMatrix(real)
      .select("source_a", "source_b", "n_a", "n_b", "tv_e6")
      .as[(String, String, Long, Long, Long)].collect()
    val nSrc = real.select("source").distinct().count()
    assert(m.length == nSrc * (nSrc - 1) / 2)
    m.foreach { case (a, b, _, _, tv) => assert(a < b && tv >= 0 && tv <= 1000000L) }
    val (sa, sb) = (m.head._1, m.head._2)
    val counts = real.filter(col("source").isin(sa, sb))
      .select(col("source"), explode(XText.words(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val ca = counts.filter(_._1 == sa).map(r => r._2 -> r._3).toMap
    val cb = counts.filter(_._1 == sb).map(r => r._2 -> r._3).toMap
    val (na, nb) = (BigInt(ca.values.sum), BigInt(cb.values.sum))
    val num = (ca.keySet ++ cb.keySet).toSeq
      .map(w => (BigInt(ca.getOrElse(w, 0L)) * nb - BigInt(cb.getOrElse(w, 0L)) * na).abs)
      .sum
    val want = (BigInt(1000000) * num / (2 * na * nb)).toLong
    assert(m.head._5 == want, s"BigInt recount of ($sa, $sb)")
  }

  test("x132 token diversity: uniform = full vocab, degenerate = 1, fixture recount") {
    val docs = Seq(
      (1L, "uniform", "a b c d"), // 4 types, each once → eff_vocab 4, coll 25%
      (2L, "degen", "z z z z z")) // one type → eff 1, coll 1e6
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.tokenDiversity(docs)
      .select("source", "n_tokens", "n_terms", "coll_e6", "eff_vocab")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("uniform") == (("uniform", 4L, 4L, 250000L, 4L)), s"${out("uniform")}")
    assert(out("degen") == (("degen", 5L, 1L, 1000000L, 1L)), s"${out("degen")}")
    // fixture: exact BigInt recount per source + eff_vocab <= n_terms
    val real = graft.query.Registry.table(spark, sf, "documents")
    val got = TextAnalysis.tokenDiversity(real)
      .select("source", "n_tokens", "n_terms", "coll_e6", "eff_vocab")
      .as[(String, Long, Long, Long, Long)].collect()
    val counts = real.select(col("source"), explode(XText.words(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect().groupBy(_._1)
    got.foreach { case (s, n, t, coll, eff) =>
      val cs = counts(s).map(_._3)
      val (nn, c2) = (BigInt(cs.sum), cs.map(c => BigInt(c) * c).sum)
      assert(n == nn && t == cs.length, s"counts at $s")
      assert(coll == (BigInt(1000000) * c2 / (nn * nn)).toLong, s"coll at $s")
      assert(eff == (nn * nn / c2).toLong && eff <= t, s"eff at $s")
    }
  }

  test("x133 near-dup leakage: planted eval twin of a train doc is caught, clean corpus zeros") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    // find one train doc and re-post its text under an id that lands in an
    // eval bucket — a paraphrase-free worst case the exact legs also catch,
    // but here it must surface through the SIMHASH pair machinery
    val sp = DataPrep.splitAssign(docs.select("doc_id", "text"))
    val trainText = sp.filter(col("split") === "train")
      .orderBy("doc_id").select("text").as[String].head()
    val evalId = sp.filter(col("split") =!= "train")
      .orderBy("doc_id").select("doc_id").as[Long].head()
    // baseline leak on the raw corpus, then with the planted twin REPLACING
    // the eval doc's text (same id → same split assignment)
    val base = DataPrep.neardupLeakage(docs)
      .select("split", "n_docs", "n_pairs", "n_leaky", "leak_e6")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(base.keySet == Set("val", "test"), "zero-completed eval splits")
    base.values.foreach { case (_, nd, np, nl, le) =>
      assert(nd > 0 && np >= nl && nl >= 0 && le == 1000000L * nl / nd)
    }
    val planted = docs.withColumn("text",
      when(col("doc_id") === evalId, lit(trainText)).otherwise(col("text")))
    val evalSplit = DataPrep.splitAssign(docs.filter(col("doc_id") === evalId))
      .select("split").as[String].head()
    val after = DataPrep.neardupLeakage(planted)
      .select("split", "n_leaky").as[(String, Long)].collect().toMap
    assert(after(evalSplit) >= base(evalSplit)._4.max(1L),
      s"planted twin in $evalSplit must be leaky: base=${base(evalSplit)._4} after=${after(evalSplit)}")
  }

  test("x134 shuffle audit: sequential writes score clumped, interleaved writes near baseline") {
    // one shard (ShardN buckets but ids chosen so order is controlled within
    // each); 40 docs, 2 sources — sequential = AAAA...BBBB, interleaved = ABAB...
    val seqDocs = (0 until 40).map(i =>
      (i.toLong, if (i < 20) "A" else "B", s"doc $i tokens here")).toDF("doc_id", "source", "text")
    val intDocs = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "A" else "B", s"doc $i tokens here")).toDF("doc_id", "source", "text")
    def global(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val rows = DataPrep.shuffleAudit(df)
        .select("n_adj", "same_adj", "base_e6").as[(Long, Long, Long)].collect()
      (rows.map(_._1).sum, rows.map(_._2).sum, rows.head._3)
    }
    val (na1, sa1, b1) = global(seqDocs)
    val (na2, sa2, b2) = global(intDocs)
    assert(b1 == 500000L && b2 == 500000L, "50/50 mixture baseline is 0.5")
    // same docs, same shard layout → same adjacency slots; only order differs
    assert(na1 == na2)
    assert(sa1 > sa2, s"sequential ($sa1/$na1) must clump more than interleaved ($sa2/$na2)")
    // fixture invariants: every shard row internally consistent
    val real = graft.query.Registry.table(spark, sf, "documents")
    DataPrep.shuffleAudit(real)
      .select("shard", "n_docs", "n_adj", "same_adj", "same_e6", "base_e6", "ratio_e6")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .foreach { case (sh, nd, na, sa, se, be, re) =>
        assert(na == nd - 1, s"adjacency slots at shard $sh")
        assert(sa <= na && se == (if (na == 0) 0L else 1000000L * sa / na))
        assert(be > 0 && re == 1000000L * se / be)
      }
    // the shardN knob (file-count-tracking fan-out at scale): more shards
    // partition the same docs — adjacency slots = n - shards, baseline
    // unchanged (it is a property of the source mixture, not the layout)
    val wide = DataPrep.shuffleAudit(real, shardN = 64L)
      .select("n_docs", "n_adj", "base_e6").as[(Long, Long, Long)].collect()
    val narrow = DataPrep.shuffleAudit(real, shardN = 4L)
      .select("n_docs", "n_adj", "base_e6").as[(Long, Long, Long)].collect()
    assert(wide.length > narrow.length && narrow.length == 4)
    assert(wide.map(_._1).sum == narrow.map(_._1).sum, "same corpus either way")
    assert(wide.head._3 == narrow.head._3, "baseline is layout-independent")
    Seq(wide, narrow).foreach(rows =>
      assert(rows.map(_._2).sum == rows.map(_._1).sum - rows.length,
        "adjacency slots = n_docs - shards"))
  }

  test("x135 label separation: perfect separation, no separation, fixture BigInt recount") {
    def oneHot(i: Int): Seq[Float] = Seq.tabulate(4)(j => if (j == i) 1.0f else 0.0f)
    // perfect: each label collapsed on its own orthogonal point → W = 0,
    // B > 0 → eta2 = 1e6 exactly, fisher sentinel 0
    val perfect = (0 until 8).map(k => (k.toLong, oneHot(k % 2), k % 2))
      .toDF("vec_id", "embedding", "label")
    val p = Similarity.labelSeparation(perfect)
      .select("n_vecs", "n_labels", "eta2_e6", "fisher_e6")
      .as[(Long, Long, Long, Long)].head()
    assert(p == ((8L, 2L, 1000000L, 0L)), s"perfect: $p")
    // none: identical vectors under different labels → B = 0 → eta2 = 0
    val none = (0 until 8).map(k => (k.toLong, oneHot(0), k % 2))
      .toDF("vec_id", "embedding", "label")
    val n = Similarity.labelSeparation(none)
      .select("eta2_e6", "fisher_e6").as[(Long, Long)].head()
    assert(n == ((0L, 0L)), s"none: $n")
    // fixture: exact BigInt recount of eta2/fisher through the same floors
    val emb = graft.query.Registry.table(spark, sf, "embeddings")
    val got = Similarity.labelSeparation(emb)
      .select("n_vecs", "n_labels", "eta2_e6", "fisher_e6")
      .as[(Long, Long, Long, Long)].head()
    val rows = emb.select(col("label").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (l, v) => (l, v.map(x => math.floor(x * 1e6).toLong)) }
    val dims = rows.head._2.length
    def ssq(vs: Seq[Seq[Long]]): BigInt =
      (0 until dims).map(j => { val s = BigInt(vs.map(_(j)).sum); s * s }).sum
    val byLabel = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val sumTerm = byLabel.values.map(vs => ssq(vs) / vs.length).sum
    val tAll = rows.flatMap(_._2).map(x => BigInt(x) * x).sum
    val b = (sumTerm - ssq(rows.map(_._2).toSeq) / rows.length).max(BigInt(0))
    val w = tAll - sumTerm
    assert(got._1 == rows.length && got._2 == byLabel.size)
    assert(got._3 == (BigInt(1000000) * b / (b + w)).toLong, "eta2 recount")
    assert(got._4 == (if (w == 0) 0L else (BigInt(1000000) * b / w).toLong), "fisher recount")
  }

  test("x136 LSH bucket health: identities hold and pair mass matches the real candidate join") {
    val emb = graft.query.Registry.table(spark, sf, "embeddings")
    val out = Similarity.lshBucketHealth(emb)
      .select("tbl", "n_vecs", "n_buckets", "max_occ", "max_share_e6",
        "mean_occ_e6", "sum_pairs")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val n = emb.count()
    assert(out.map(_._1).toSeq == (0L until Similarity.NL.toLong), "one row per table")
    out.foreach { case (t, nv, nb, mx, ms, mo, sp) =>
      assert(nv == n, s"every vector bucketed in table $t")
      assert(nb >= 1 && nb <= (1L << Similarity.NP), s"bucket count bounded at $t")
      assert(mx <= nv && ms == 1000000L * mx / nv)
      assert(mo == BigInt(1000000L * nv / nb).toLong)
      assert(sp >= (mx * (mx - 1)) / 2, s"pair mass at least the hot bucket's at $t")
    }
    // the table-0 pair mass equals the REAL candidate count of a
    // within-bucket self-join on the same bucket expression
    val b0 = Similarity.withNorm(emb)
      .select(col("vec_id"), Similarity.bucketT(col("v"), 0).as("bkt"))
    val realPairs = b0.as("x").join(b0.as("y"),
      expr("x.bkt = y.bkt AND x.vec_id < y.vec_id")).count()
    assert(out.head._7 == realPairs, "sum_pairs == materialized candidate join size")
  }

  test("x126 dedup length bias: fixture masses conserve and dup-free sources are sentinel-0") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
      .select("doc_id", "source", "text")
    val out = Dedup.dedupLengthBias(docs)
      .select("source", "n_kept", "n_dropped", "tok_kept", "tok_dropped", "bias_e6")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val totals = docs.select(col("source"),
        size(XText.words(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_tok").as("tok"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.map(_._1).toSet == totals.keySet)
    out.foreach { case (s, nk, nd, tk, td, bias) =>
      assert((nk + nd, tk + td) == totals(s), s"conservation at $s")
      assert(nk >= 1, s"every source keeps at least one doc: $s")
      if (nd == 0) assert(bias == 0L, s"sentinel at $s")
    }
  }
}
