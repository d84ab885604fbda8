package graft.xscale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics tests for the round-9 operators: the dedup cascade waterfall
  * (x99), the banded filter sweep (x100), curriculum phases (x101), the
  * OOV-rate audit (x102) and winnowing fingerprints (x103).
  */
class R9OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("x99 cascade: waterfall identity and stage consistency with its components") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = Dedup.dedupCascade(docs)
      .select("source", "n_docs", "removed_exact", "removed_near", "n_final")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // per-source identity: the waterfall must account for every doc
    out.foreach { case (_, n, re, rn, fin) =>
      assert(re >= 0 && rn >= 0 && fin >= 0)
      assert(n == re + rn + fin)
    }
    // totals must equal the components computed independently
    val total = docs.count()
    val exact = Dedup.dedupExact(docs)
    val nExact = exact.count()
    val pairs = Dedup.simhashPairs(exact)
      .select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    val nFinal = DedupClusters.dedupByPairs(exact, pairs).count()
    assert(out.map(_._2).sum == total)
    assert(out.map(_._3).sum == total - nExact)
    assert(out.map(_._5).sum == nFinal)
  }

  test("x100 sweep: full grid, anchored at zero threshold, monotone non-increasing") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = TextAnalysis.filterSweep(docs)
      .select("source", "thr_e4", "kept_docs", "kept_tok", "kept_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    val bySource = out.groupBy(_._1)
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource.keySet == totals.keySet)
    bySource.foreach { case (src, rows) =>
      // complete grid, one row per threshold
      assert(rows.map(_._2).sorted.toSeq ==
        (0 until TextAnalysis.SweepBands).map(_ * TextAnalysis.SweepStepE4))
      // threshold 0 keeps everything (scores are non-negative)
      val at0 = rows.find(_._2 == 0L).get
      assert(at0._3 == totals(src) && at0._5 == 1000000L)
      // kept mass never increases as the threshold rises
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(hi._3 <= lo._3 && hi._4 <= lo._4 && hi._5 <= lo._5)
        case _ =>
      }
    }
  }

  test("x101 phases: partition the corpus, near-equal sizes, quality monotone by phase") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = TextAnalysis.curriculumPhases(docs)
      .select("phase", "source", "n_docs", "mean_score_e4")
      .as[(Long, String, Long, Long)].collect()
    val total = docs.count()
    assert(out.map(_._3).sum == total)
    val perPhase = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perPhase.keySet == (1L to TextAnalysis.CurriculumPhases).toSet)
    // NTILE: phase sizes differ by at most 1
    assert(perPhase.values.max - perPhase.values.min <= 1)
    // easy-first: corpus-wide mean quality never rises with the phase index
    val phaseMean = out.groupBy(_._1).view
      .mapValues(rs => rs.map(r => r._3 * r._4).sum.toDouble / rs.map(_._3).sum).toMap
    (1L until TextAnalysis.CurriculumPhases).foreach { p =>
      assert(phaseMean(p) >= phaseMean(p + 1))
    }
  }

  test("x101 thresholds path: same partition property, sizes near the NTILE split") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    // full sample => thresholds are true quantiles, phases near-equal
    val out = TextAnalysis.curriculumByThresholds(docs, sampleFraction = 1.0)
      .select("phase", "n_docs").as[(Long, Long)].collect()
    val total = docs.count()
    assert(out.map(_._2).sum == total)
    val perPhase = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val ideal = total.toDouble / TextAnalysis.CurriculumPhases
    perPhase.values.foreach(n => assert(math.abs(n - ideal) <= ideal * 0.5))
  }

  test("x102 oov: rates are consistent, and a train-df>=2 word is never OOV") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = DataPrep.oovRate(docs)
      .select("split", "source", "n_tok", "n_oov", "oov_e6")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (split, _, n, oov, e6) =>
      assert(split == "val" || split == "test")
      assert(oov <= n && e6 == 1000000L * oov / n)
    }
    // synthetic corpus words are drawn from a tiny shared vocabulary, so
    // every one passes the train-df gate: corpus-level OOV must be zero
    // (a nonzero value here would mean the vocab rule leaked train tokens)
    assert(out.map(_._4).sum == 0L)
  }

  test("x103 winnow matches a sequential reference, window guarantee holds") {
    // real docs + planted SHORT docs (fewer grams than the window): two
    // identical 5-word docs must still fingerprint and be seen as shared
    val shorts = Seq(
      (900001L, "alpha beta gamma delta epsilon"),
      (900002L, "alpha beta gamma delta epsilon"),
      (900003L, "one two three"), // exactly one gram at k=3
      (900004L, "lone pair")) // 0 grams (shorter than k)
      .toDF("doc_id", "text")
    val docs = graft.query.Registry.table(spark, sf, "documents")
      .filter(col("doc_id") < 40).select("doc_id", "text")
      .unionByName(shorts)
    val k = TextAnalysis.WinnowK
    val w = TextAnalysis.WinnowW
    // sequential reference: positional k-gram 40-bit hashes, rightmost-min
    // per window, distinct (hash, pos)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val ref = docs.select("doc_id", "text").as[(Long, String)].collect().map {
      case (id, text) =>
        val ws = text.split("\\s+")
        val grams =
          if (ws.length < k) Array.empty[Long]
          else (0 to ws.length - k).map(i => h60(ws.slice(i, i + k).mkString(" ")) & ((1L << 40) - 1)).toArray
        val sel = scala.collection.mutable.Set.empty[(Long, Int)]
        // full windows; a short doc (1..w-1 grams) gets ONE window of all
        // its grams — the engine's least(w, ng) rule
        val ends =
          if (grams.length >= w) (w - 1) until grams.length
          else if (grams.nonEmpty) Seq(grams.length - 1)
          else Seq.empty
        for (end <- ends) {
          val win = math.max(0, end - w + 1) to end
          // min hash, ties to the RIGHTMOST position
          val best = win.minBy(p => (grams(p), -p))
          sel += ((grams(best), best + 1))
        }
        // window guarantee: every window contains a selected position
        for (end <- ends) {
          val win = (math.max(0, end - w + 1) to end).map(p => (grams(p), p + 1))
          assert(win.exists(sel.contains), s"doc $id window at $end uncovered")
        }
        id -> (grams.length.toLong, sel.size.toLong)
    }.toMap
    val out = TextAnalysis.winnowFingerprints(docs)
      .select("doc_id", "n_grams", "n_fp", "n_shared_fp")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == ref.size)
    out.foreach { case (id, ng, nf, _) =>
      assert((ng, nf) == ref(id), s"doc $id: engine ($ng,$nf) != reference ${ref(id)}")
    }
    // the identical short docs fingerprint AND see each other as shared
    val shortRows = out.filter(r => r._1 == 900001L || r._1 == 900002L)
    assert(shortRows.forall(r => r._3 == 1L && r._4 == 1L),
      s"identical short docs must share their one fingerprint: ${shortRows.toSeq}")
  }

  test("x104 quantiles: exact rank rule matches a sorted-array reference; approx brackets it") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val ref = docs
      .select(col("source"), size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
      .as[(String, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val out = TextAnalysis.lengthQuantiles(docs)
      .select("source", "n_docs", "p25_tok", "p50_tok", "p90_tok", "p99_tok", "max_tok")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == ref.keySet)
    out.foreach { case (src, n, p25, p50, p90, p99, mx) =>
      val sorted = ref(src)
      assert(n == sorted.length && mx == sorted.last)
      def pick(q: Long) = sorted(((q * n + 99) / 100 - 1).toInt)
      assert(p25 == pick(25) && p50 == pick(50) && p90 == pick(90) && p99 == pick(99))
      assert(p25 <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
    // the approx path must agree on counts/max and stay inside the range
    val approx = TextAnalysis.lengthQuantilesApprox(docs)
      .select("source", "n_docs", "max_tok").as[(String, Long, Long)].collect()
    approx.foreach { case (src, n, mx) =>
      assert(n == ref(src).length && mx == ref(src).last)
    }
  }

  test("x105 cross-source near-dup: symmetric-normalized, totals match the pair list") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
      .select("doc_id", "source", "text")
    val out = Dedup.crossSourceNearDup(docs)
      .select("source_a", "source_b", "n_pairs")
      .as[(String, String, Long)].collect()
    assert(out.nonEmpty)
    // normalized ordering and total conservation vs the raw pair list
    out.foreach { case (a, b, n) => assert(a <= b && n > 0) }
    val totalPairs = Dedup.simhashPairs(docs).count()
    assert(out.map(_._3).sum == totalPairs)
  }

  test("x106 norm audit: planted zero and constant vectors are counted, envelope holds") {
    val emb = graft.query.Registry.table(spark, sf, "embeddings")
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    // plant one zero vector and one constant vector on fresh vec_ids that
    // alias to existing docs' ids modulo nothing — use two real doc ids
    val ids = docs.select("doc_id").as[Long].orderBy("doc_id").take(2)
    val zeroRow = Seq((ids(0), Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val constRow = Seq((ids(1), Array.fill(dim)(0.5f))).toDF("vec_id", "embedding")
    // plus one ORPHAN vector whose vec_id maps to no document — it must
    // surface under "(unmapped)", not silently vanish from the QA gate
    val orphanRow = Seq((77777777L, Array.fill(dim)(0.25f))).toDF("vec_id", "embedding")
    val aug = emb.filter(!col("vec_id").isin(ids: _*))
      .select("vec_id", "embedding").unionByName(zeroRow).unionByName(constRow)
      .unionByName(orphanRow)
    val out = Similarity.embNormAudit(aug, docs)
      .select("source", "n_vecs", "n_zero", "n_const", "min_norm_e6", "max_norm_e6", "sum_norm_e6")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 1L, "exactly the planted zero vector")
    // zero + planted 0.5-vector + the orphan 0.25-vector are constant-dim
    assert(out.map(_._4).sum == 3L, "all three planted vectors are constant-dim")
    val unmapped = out.filter(_._1 == "(unmapped)")
    assert(unmapped.length == 1 && unmapped.head._2 == 1L,
      s"orphan vector must be reported under (unmapped): ${out.map(_._1).toSeq}")
    out.foreach { case (_, n, nz, _, mn, mx, sm) =>
      assert(mn <= mx && sm >= mx && n > 0 && (nz == 0L || mn == 0L))
    }
  }

  test("x107 phase packing: conserves the curriculum's per-phase mass, packs are bounded") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = DataPrep.phasePacking(docs)
      .select("phase", "n_docs", "sum_tok", "n_packs", "fill_e6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // phases partition the corpus, matching x101's totals exactly
    val cur = TextAnalysis.curriculumPhases(docs)
      .groupBy("phase")
      .agg(sum("n_docs").as("d"), sum("sum_tok").as("t"))
      .select("phase", "d", "t").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == cur.toSeq)
    out.foreach { case (_, nd, st, np, fill) =>
      // a pack holds at least one doc, so 1 <= packs <= docs
      assert(np >= 1 && np <= nd)
      // fill ratio consistent with its definition
      assert(fill == 1000000L * st / (np * DataPrep.PackBudget))
    }
    // the thresholds path conserves the same corpus totals
    val auto = DataPrep.phasePackingByThresholds(docs, sampleFraction = 1.0)
      .select("n_docs", "sum_tok").as[(Long, Long)].collect()
    assert(auto.map(_._1).sum == out.map(_._2).sum)
    assert(auto.map(_._2).sum == out.map(_._3).sum)
  }

  test("x108 coverage: bounded, and a train-replicated eval doc is fully covered") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = DataPrep.ngramCoverage(docs)
      .select("split", "source", "n_grams", "n_covered", "cov_e6")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (split, _, n, cov, e6) =>
      assert(split == "val" || split == "test")
      assert(cov <= n && e6 == 1000000L * cov / n)
    }
    // synthetic fixture: all docs draw from one shared tiny vocabulary, so
    // held-out 3-gram coverage should be substantial but the audit must
    // not report trivially-full coverage everywhere (distinct grams exist)
    assert(out.exists(_._5 > 500000L))
    // planted check: an eval doc whose text IS a train doc's text must be
    // 100% covered
    val train = docs.withColumn("split", DataPrep.splitCol)
      .filter(col("split") === "train").select("doc_id", "text").limit(1).collect()(0)
    // one job: find an unused id that hashes outside train
    val evalId = spark.range(9000001L, 9002000L).select(col("id").as("doc_id"))
      .withColumn("split", DataPrep.splitCol)
      .filter(col("split") =!= "train")
      .select("doc_id").as[Long].head()
    val planted = docs.select("doc_id", "source", "text", "lang", "n_chars")
      .unionByName(
        Seq((evalId, "planted", train.getString(1), "en", 1L))
          .toDF("doc_id", "source", "text", "lang", "n_chars"))
    val row = DataPrep.ngramCoverage(planted)
      .filter(col("source") === "planted")
      .select("n_covered", "n_grams").as[(Long, Long)].collect()
    assert(row.nonEmpty)
    row.foreach { case (cov, n) =>
      assert(n > 0 && cov == n, "train-replicated doc not fully covered")
    }
  }

  test("x109 lexical profile: invariants hold and match a driver-side recount") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = TextAnalysis.lexicalProfile(docs)
      .select("source", "n_tok", "n_types", "ttr_e6", "n_hapax", "hapax_e6")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, nt, ty, ttr, hx, he) =>
      assert(ty <= nt && hx <= ty)
      assert(ttr == 1000000L * ty / nt && he == 1000000L * hx / ty)
    }
    // exact recount for one source, sequentially
    val src = out.head._1
    val words = docs.filter(col("source") === src)
      .select("text").as[String].collect()
      .flatMap(_.split("\\s+"))
    val counts = words.groupBy(identity).view.mapValues(_.length)
    val row = out.find(_._1 == src).get
    assert(row._2 == words.length.toLong)
    assert(row._3 == counts.size.toLong)
    assert(row._5 == counts.values.count(_ == 1).toLong)
  }

  test("x110 label noise: planted mislabel is the suspect, isolated vectors are counted") {
    // cluster A at (1,0): vecs 0-2 labeled 0, vec 3 sits IN cluster A but
    // carries label 1 (the mislabel); cluster B at (0,1): vecs 4-5 labeled 1
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.99f, 0.01f), 0),
      (2L, Array(0.98f, 0.02f), 0),
      (3L, Array(0.97f, 0.03f), 1),
      (4L, Array(0f, 1f), 1),
      (5L, Array(0.01f, 0.99f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAgreement(Similarity.knnBrute(emb, lit(true), 2), emb)
      .select("label", "n_vecs", "n_isolated", "sum_k", "sum_same", "n_suspect", "agree_e6")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val l0 = out(0); val l1 = out(1)
    // label 0: three vectors, each with both top-2 neighbors inside cluster A;
    // vec 3 (label 1) can appear in shortlists but the QUERIES of label 0 see
    // at most one cross-label vote each — never a strict majority against
    assert(l0._2 == 3L && l0._3 == 0L && l0._6 == 0L)
    // label 1: vec 3's top-2 are cluster-A docs (label 0) -> the one suspect;
    // vecs 4/5 see each other first -> not suspects
    assert(l1._2 == 3L && l1._6 == 1L)
    // vote accounting: every edge of the graph is one vote
    assert(out.map(_._4).sum == 12L) // 6 queries x k=2
    // agreement ratio is exact integer division of the vote counts
    out.foreach { r => assert(r._7 == 1000000L * r._5 / r._4) }
    // a query missing from the graph entirely is isolated, never dropped
    val partial = Similarity.knnBrute(emb, col("vec_id") =!= 5L, 2)
    val iso = Similarity.knnLabelAgreement(partial, emb)
      .select("label", "n_isolated").as[(Long, Long)].collect().toMap
    assert(iso(1L) == 1L && iso(0L) == 0L)
    // real fixture over the production LSH graph: totals account for
    // every vector and every edge, ratios stay in [0, 1e6]
    val e500 = spark.read.parquet(s"$sf/embeddings.parquet")
    val g = Similarity.knnLsh(e500, lit(true))
    val nEdges = g.count()
    val dist = Similarity.knnLabelAgreement(g, e500)
      .select("n_vecs", "sum_k", "agree_e6").as[(Long, Long, Long)].collect()
    assert(dist.map(_._1).sum == e500.count())
    assert(dist.map(_._2).sum == nEdges)
    dist.foreach(r => assert(r._3 >= 0L && r._3 <= 1000000L))
  }

  test("x111 charset audit: planted dirty docs are counted, diversity matches a recount") {
    val docs = Seq(
      (0L, "clean ascii text here", "s1"),
      (1L, "café naïve résumé", "s1"), // non-ascii, no repl
      (2L, "lost � bytes � here", "s1"), // U+FFFD (also non-ascii)
      (3L, "binary\u0000junk\u0007in text", "s2"), // control chars
      (4L, "aaaaaaaaaaaaaaaaaaaa", "s2"), // char spam: collision -> 1e6
      (5L, "x", "s2")) // degenerate n<2 pins to 1e6
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.charsetAudit(docs)
      .select("source", "n_docs", "n_nonascii_docs", "n_ctrl_docs", "n_repl_docs",
        "nonascii_chars", "min_coll_e6", "max_coll_e6", "sum_coll_e6")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    val s1 = out(0); val s2 = out(1)
    assert(s1._2 == 3L && s1._3 == 2L && s1._4 == 0L && s1._5 == 1L)
    assert(s1._6 == 4L + 2L) // 4 accented chars + 2 replacement chars
    assert(s2._2 == 3L && s2._3 == 0L && s2._4 == 1L && s2._5 == 0L)
    // the char-spam doc and the 1-char doc both pin the max at exactly 1e6
    assert(s2._8 == 1000000L)
    // per-doc collision recount, driver-side, for every planted doc
    val perDoc = docs.select(col("doc_id"),
        org.apache.spark.sql.graftnative.api.charProfile(col("text")).as("p"))
      .select(col("doc_id"), col("p.n_cp"), col("p.coll_num"))
      .as[(Long, Long, Long)].collect()
    perDoc.foreach { case (id, nCp, coll) =>
      val t = docs.filter(col("doc_id") === id).select("text").as[String].head()
      val counts = t.codePoints().toArray.groupBy(identity).map(_._2.length.toLong)
      assert(nCp == t.codePoints().count())
      assert(coll == counts.map(c => c * (c - 1)).sum)
    }
    // real fixture: every source clean ASCII, collision envelope sane
    val real = TextAnalysis.charsetAudit(
      spark.read.parquet(s"$sf/documents.parquet"))
      .select("n_docs", "n_nonascii_docs", "n_ctrl_docs", "n_repl_docs",
        "min_coll_e6", "max_coll_e6")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(real.map(_._1).sum > 0L)
    real.foreach { r =>
      assert(r._2 == 0L && r._3 == 0L && r._4 == 0L)
      assert(r._5 > 0L && r._6 <= 1000000L)
    }
  }

  test("x112 key skew: planted hot key is found, stats match a driver recount") {
    // type "click": uniform (3 keys x 2 rows); type "view": one hot key
    // (7 of 10 rows) + three cold keys
    val rows =
      Seq.tabulate(6)(i => (i.toLong % 3, "click")) ++
        Seq.fill(7)((100L, "view")) ++ Seq((101L, "view"), (102L, "view"), (103L, "view"))
    val ev = rows.zipWithIndex
      .map { case ((uid, et), i) => (i.toLong, uid, et) }
      .toDF("event_id", "user_id", "event_type")
    val out = DataPrep.keySkew(ev)
      .select("event_type", "n_rows", "n_keys", "max_key_rows", "skew_e6",
        "n_hot_keys", "hot_rows", "hot_e6")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val click = out(0); val view = out(1)
    // uniform type: skew_e6 exactly 1e6, no hot keys
    assert(click == (("click", 6L, 3L, 2L, 1000000L, 0L, 0L, 0L)))
    // hot type: max=7 of 10 rows over 4 keys -> skew = 1e6*7*4/10 = 2.8e6;
    // hot keys are those with cnt*4 > 2*10 i.e. cnt > 5: exactly the planted one
    assert(view == (("view", 10L, 4L, 7L, 2800000L, 1L, 7L, 700000L)))
    // real fixture: per-type totals conserved vs a direct recount
    val real = graft.query.Registry.table(spark, sf, "events")
    val got = DataPrep.keySkew(real)
      .select("event_type", "n_rows", "n_keys").as[(String, Long, Long)]
      .collect().map { case (t, r, k) => t -> ((r, k)) }.toMap
    val want = real.groupBy("event_type")
      .agg(count(lit(1)).as("r"), countDistinct("user_id").as("k"))
      .as[(String, Long, Long)].collect()
    want.foreach { case (t, r, k) => assert(got(t) == ((r, k))) }
  }

  test("x113 ann recall: perfect graph scores 1e6, dropped edges are charged, dead queries counted") {
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (21L, Array(0.99f, 0.01f), 0),
      (1L, Array(0.98f, 0.02f), 0), (2L, Array(0.97f, 0.03f), 0),
      (40L, Array(0f, 1f), 1), (3L, Array(0.01f, 0.99f), 1),
      (4L, Array(0.02f, 0.98f), 1), (5L, Array(0.03f, 0.97f), 1))
      .toDF("vec_id", "embedding", "label")
    val qsel = col("vec_id") % Similarity.RecallMod === 0
    val exact = Similarity.knnBrute(emb, qsel, 3)
    // approx == exact -> every label at exactly 1e6, zero dead queries
    val perfect = Similarity.annRecall(exact, exact, emb)
      .select("label", "n_queries", "n_exact", "n_hit", "n_zero_recall", "recall_e6")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(perfect.length == 2)
    perfect.foreach { r =>
      assert(r._2 == 1L && r._3 == 3L && r._4 == 3L && r._5 == 0L && r._6 == 1000000L)
    }
    // drop ALL of query 40's edges: label 1 has a dead query, label 0 untouched
    val degraded = Similarity.annRecall(
      exact.filter(col("query_id") =!= 40L), exact, emb)
      .select("label", "n_hit", "n_zero_recall", "recall_e6")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(degraded(0) == ((0L, 3L, 0L, 1000000L)))
    assert(degraded(1) == ((1L, 0L, 1L, 0L)))
    // recall is computed over EXACT's edge set: extra approx-only edges
    // (LSH candidates beyond the sample) must not inflate the denominator
    val padded = Similarity.annRecall(
      exact.union(Seq((999L, 1L, 0L)).toDF("query_id", "rank", "neighbor_id")),
      exact, emb)
      .agg(sum("n_exact"), sum("n_hit")).as[(Long, Long)].head()
    assert(padded == ((6L, 6L)))
    // real fixture: LSH vs brute on the registered sample — bounded ratios,
    // hits never exceed the LSH graph's own edge count on sampled queries
    val e500 = spark.read.parquet(s"$sf/embeddings.parquet")
    val sel = col("vec_id") % Similarity.RecallMod === 0
    val rec = Similarity.annRecall(
      Similarity.knnLsh(e500, sel), Similarity.knnBrute(e500, sel), e500)
      .select("n_queries", "n_exact", "n_hit", "recall_e6")
      .as[(Long, Long, Long, Long)].collect()
    assert(rec.map(_._1).sum == e500.filter(sel).count())
    rec.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._4 >= 0L && r._4 <= 1000000L)
      assert(r._4 == 1000000L * r._3 / r._2)
    }
  }

  test("x114 length-quality correlation: pinned fixtures and a sequential recount") {
    def mkDocs(texts: Seq[String], src: String) =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, src, t.length.toLong) }
        .toDF("doc_id", "text", "source", "n_chars")
    // three docs of strictly increasing length: score's length term makes
    // the quality rank follow the length rank exactly -> rho = +1
    val mono = mkDocs(Seq("one two", "one two three four",
      "one two three four five six seven eight"), "m")
    val rhoOf = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.lenQualityCorr(df)
        .select("spearman_e6").as[Long].collect().head
    assert(rhoOf(mono) == 1000000L)
    // single-doc source: den = 0 is guarded, pinned to 0
    assert(rhoOf(mkDocs(Seq("only doc"), "s")) == 0L)
    // real fixture: recount rho sequentially per source from the scored frame
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val scored = TextAnalysis.qualityScored(docs)
      .select("source", "doc_id", "n_tok", "score_e4")
      .as[(String, Long, Long, Long)].collect()
    val got = TextAnalysis.lenQualityCorr(docs)
      .select("source", "n_docs", "sum_d2", "spearman_e6", "sum_x", "sum_y",
        "sum_xy", "sum_x2", "sum_y2")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    scored.groupBy(_._1).foreach { case (src, rows) =>
      val rLen = rows.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val rQ = rows.sortBy(r => (r._4, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val n = rows.length.toLong
      val sumD2 = rows.map(r => { val d = rLen(r._2) - rQ(r._2); d * d }).sum
      val den = BigInt(n) * (BigInt(n) * BigInt(n) - 1)
      val rho = (BigInt(1000000) * (2 * den - 6 * BigInt(sumD2)) / den - 1000000).toLong
      val g = got(src)
      assert(g._2 == n && g._3 == sumD2 && g._4 == rho)
      assert(g._5 == rows.map(_._3).sum && g._6 == rows.map(_._4).sum)
      assert(g._7 == rows.map(r => r._3 * r._4).sum)
      assert(g._8 == rows.map(r => r._3 * r._3).sum)
      assert(g._9 == rows.map(r => r._4 * r._4).sum)
    }
  }

  test("x115 source divergence: identical=0, disjoint=1e6, fixture matches a recount") {
    def mk(rows: (String, String)*) =
      rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s, t.length.toLong) }
        .toDF("doc_id", "text", "source", "n_chars")
    val tvOf = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.sourceDivergence(df)
        .select("source", "tv_e6").as[(String, Long)].collect().toMap
    // identical unigram distributions -> TV exactly 0 on both sides
    val same = tvOf(mk("alpha beta" -> "s1", "alpha beta" -> "s2"))
    assert(same("s1") == 0L && same("s2") == 0L)
    // disjoint vocabularies -> TV exactly 1 (1e6) on both sides
    val disj = tvOf(mk("alpha alpha" -> "s1", "beta gamma" -> "s2"))
    assert(disj("s1") == 1000000L && disj("s2") == 1000000L)
    // real fixture: exact sequential recount of the closed-form sum
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val toks = docs
      .select(col("source"), explode(XText.words(col("text"))).as("w"))
      .as[(String, String)].collect()
    val bySrcTerm = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byTerm = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nTot = toks.length.toLong
    val got = TextAnalysis.sourceDivergence(docs)
      .select("source", "n_tokens", "n_terms", "tv_e6")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == bySrc.size)
    got.foreach { case (src, nTokens, nTerms, tvE6) =>
      val ns = bySrc(src); val nr = nTot - ns
      val present = bySrcTerm.collect { case ((s, w), c) if s == src => (w, c) }
      assert(nTokens == ns)
      assert(nTerms == present.size.toLong)
      val sumPresent = present.map { case (w, c) =>
        (BigInt(c) * nr - BigInt(byTerm(w) - c) * ns).abs
      }.sum
      val ctPresent = present.map { case (w, _) => byTerm(w) }.sum
      val tv = (BigInt(1000000) * (sumPresent + BigInt(ns) * (nTot - ctPresent))) /
        (BigInt(2) * ns * nr)
      assert(tvE6 == tv.toLong)
      assert(tvE6 >= 0L && tvE6 <= 1000000L)
    }
  }

  test("x116 collocations: planted phrase ranks first, support filter holds, fixture recount") {
    // "gx hx" always adjacent (6 docs), "ax".."fx" shuffled independent
    // filler; "iz jz" appears only 3 times — below support, never ranked
    val filler = Seq("ax bx cx dx ex fx", "bx ax dx cx fx ex", "cx dx ax fx bx ex")
    val docs = (
      Seq.fill(6)("gx hx") ++ filler ++ Seq.fill(3)("iz jz")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t, "s", t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")
    val out = TextAnalysis.collocations(docs)
      .select("rank", "w1", "w2", "c_ab", "c_a", "c_b", "lift_e6")
      .as[(Long, String, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // the planted always-adjacent pair is rank 1 with exact counts
    assert(out.head._2 == "gx" && out.head._3 == "hx")
    assert(out.head._4 == 6L && out.head._5 == 6L && out.head._6 == 6L)
    // below-support pair excluded despite perfect association
    assert(!out.exists(r => r._2 == "iz"))
    // lift recount for every ranked row (N, M driver-side)
    val toks = docs.select(explode(XText.words(col("text"))).as("w")).as[String].collect()
    val nUni = toks.length.toLong
    val mBi = docs.select(XText.words(col("text")).as("ws")).as[Seq[String]].collect()
      .map(ws => math.max(ws.length - 1, 0)).sum.toLong
    out.foreach { case (_, w1, w2, cab, ca, cb, lift) =>
      assert(ca == toks.count(_ == w1).toLong && cb == toks.count(_ == w2).toLong)
      val want = (BigInt(1000000) * cab * nUni * nUni) / (BigInt(mBi) * ca * cb)
      assert(lift == want.toLong)
    }
    // real fixture: engine top-20 equals a full sequential recount
    val real = graft.query.Registry.table(spark, sf, "documents")
    val wsAll = real.select(XText.words(col("text")).as("ws")).as[Seq[String]].collect()
    val uni = wsAll.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bi = wsAll.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = uni.values.sum; val m = bi.values.sum
    val want = bi.toSeq
      .filter(_._2 >= TextAnalysis.CollocMinSupport)
      .map { case ((a, b), cab) =>
        val lift = (BigInt(1000000) * cab * n * n) / (BigInt(m) * uni(a) * uni(b))
        (lift.toLong, a, b, cab)
      }
      .sortBy { case (l, a, b, _) => (-l, a, b) }
      .take(TextAnalysis.CollocTopK)
    val got = TextAnalysis.collocations(real)
      .select("rank", "w1", "w2", "c_ab", "lift_e6")
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((_, gw1, gw2, gcab, glift), (wl, wa, wb, wcab)) =>
      assert(gw1 == wa && gw2 == wb && gcab == wcab && glift == wl)
    }
  }

  test("x117 template slots: planted slots pin at 1e6, ties break lexicographically, recount") {
    // slot template: pos1 always "invoice", pos3 always "total"; pos2 varies
    val tpl = (0 until 10).map(i => s"invoice n$i total v$i")
    // tie fixture in a second source: pos1 split 2/2 between "aa" and "bb"
    val tie = Seq("aa x", "aa y", "bb x", "bb y")
    val docs = (tpl.map((_, "t")) ++ tie.map((_, "u"))).zipWithIndex
      .map { case ((t, src), i) => (i.toLong, t, src, t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")
    val out = TextAnalysis.templateSlots(docs)
      .select("source", "pos", "n_docs", "top_w", "top_cnt", "share_e6")
      .as[(String, Long, Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("t", 1L)) == (("t", 1L, 10L, "invoice", 10L, 1000000L)))
    assert(out(("t", 3L)) == (("t", 3L, 10L, "total", 10L, 1000000L)))
    assert(out(("t", 2L))._6 == 100000L) // 10 distinct fills -> share 1/10
    // tie at ("u", 1): aa and bb both 2 -> lexicographically smaller wins
    assert(out(("u", 1L))._4 == "aa" && out(("u", 1L))._6 == 500000L)
    // positions beyond the longest doc never appear
    assert(!out.contains(("t", 5L)) && !out.contains(("u", 3L)))
    // real fixture recount per (source, pos)
    val real = graft.query.Registry.table(spark, sf, "documents")
    val wsAll = real.select(col("source"), XText.words(col("text")).as("ws"))
      .as[(String, Seq[String])].collect()
    val counts = wsAll
      .flatMap { case (src, ws) =>
        ws.take(TextAnalysis.TemplatePos).zipWithIndex
          .filter(_._1.nonEmpty)
          .map { case (w, i) => ((src, i + 1L), w) }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = TextAnalysis.templateSlots(real)
      .select("source", "pos", "n_docs", "top_w", "top_cnt", "share_e6")
      .as[(String, Long, Long, String, Long, Long)].collect()
    assert(got.length == counts.size)
    got.foreach { case (src, pos, nDocs, topW, topCnt, share) =>
      val toks = counts((src, pos))
      val byW = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (bw, bc) = byW.toSeq.sortBy { case (w, c) => (-c, w) }.head
      assert(nDocs == toks.length.toLong)
      assert(topW == bw && topCnt == bc)
      assert(share == 1000000L * bc / toks.length)
    }
  }
}
