package graft.xscale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics tests for the round-9 continuation operators: per-dimension
  * embedding stats (x118), term burstiness (x119), markup residue (x120).
  */
class R9Ops2Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("x118 dim stats: planted dead/zero dims are flagged, moments match a recount") {
    val emb = graft.query.Registry.table(spark, sf, "embeddings")
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    // dim 1 → constant 0.5 (dead, nonzero), dim 2 → constant 0 (dead AND zero)
    val aug = emb.select(
      col("vec_id"),
      expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(0.5 AS FLOAT) " +
        "WHEN i = 1 THEN CAST(0.0 AS FLOAT) ELSE x END)").as("embedding"))
    val out = Similarity.dimStats(aug)
      .select("dim", "n_vecs", "n_zero", "min_e6", "max_e6", "sum_e6", "sumsq_e12", "is_dead")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    val n = aug.count()
    assert(out.length == dim)
    out.foreach { case (_, nv, nz, mn, mx, sm, sq, dead) =>
      assert(nv == n && nz >= 0 && nz <= n && mn <= mx && sq >= 0)
      assert(sm >= mn * n && sm <= mx * n)
      assert((dead == 1L) == (mn == mx))
    }
    val d1 = out(0); val d2 = out(1)
    assert(d1._8 == 1L && d1._4 == 500000L && d1._3 == 0L, s"dead 0.5-dim: $d1")
    assert(d2._8 == 1L && d2._3 == n && d2._4 == 0L && d2._5 == 0L, s"dead zero-dim: $d2")
    // exact recount of dim 3 driver-side (floor to e6, integer moments)
    val xs = aug.select(col("embedding")(2).cast("double")).as[Double].collect()
      .map(x => math.floor(x * 1e6).toLong)
    val d3 = out(2)
    assert(d3._4 == xs.min && d3._5 == xs.max && d3._6 == xs.sum)
    assert(d3._7 == xs.map(x => BigInt(x) * x).sum.toLong)
  }

  test("x119 burstiness: planted bursty term ranks first, invariants hold") {
    val docs = Seq(
      (1L, "zzzq zzzq zzzq zzzq zzzq filler one two three four five"),
      (2L, "zzzq zzzq zzzq zzzq zzzq filler six seven eight nine ten"),
      (3L, "filler one two six the the quick brown fox jumps over"),
      (4L, "hapax only once each word here never repeats at all yes"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs)
      .select("rank", "wd", "cf", "df", "burst_e6")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    // ranks contiguous from 1, every row obeys the integer identity + df floor
    assert(out.map(_._1).toSeq == (1L to out.length).toSeq)
    out.foreach { case (_, _, cf, df, b) =>
      assert(df >= TextAnalysis.BurstMinDf && cf >= df)
      assert(b == 1000000L * cf / df)
    }
    // zzzq: cf=10 over df=2 → burst 5e6, the clear winner
    assert(out.head._2 == "zzzq" && out.head._3 == 10L && out.head._4 == 2L &&
      out.head._5 == 5000000L)
    // burstiness is non-increasing down the ranking
    assert(out.sliding(2).forall { case Array(a, b) => a._5 >= b._5; case _ => true })
    // fixture run: top term's cf/df must match an independent recount
    val real = graft.query.Registry.table(spark, sf, "documents")
    val top = TextAnalysis.termBurstiness(real)
      .orderBy("rank").select("wd", "cf", "df").as[(String, Long, Long)].head()
    val t = real.select(col("doc_id"), explode(XText.words(col("text"))).as("wd"))
      .filter(col("wd") === top._1)
    assert(t.count() == top._2)
    assert(t.select("doc_id").distinct().count() == top._3)
  }

  test("x120 markup residue: planted markup is counted per signal, clean docs are zero") {
    val docs = Seq(
      (1L, "dirty", "<p>hi</p> &amp; &#38; see https://x.test/z and http://a.test"),
      (2L, "dirty", "no markup at all in this one"),
      (3L, "clean", "plain words only nothing else"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.markupResidue(docs)
      .select("source", "n_docs", "n_tag_docs", "n_ent_docs", "n_url_docs",
        "n_tags", "n_ents", "n_urls")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val dirty = out("dirty")
    assert(dirty._2 == 2L && dirty._3 == 1L && dirty._4 == 1L && dirty._5 == 1L)
    assert(dirty._6 == 2L, s"two tags: $dirty")
    assert(dirty._7 == 2L, s"named + numeric entity: $dirty")
    assert(dirty._8 == 2L, s"https + http URLs: $dirty")
    val clean = out("clean")
    assert(clean._2 == 1L && clean._6 == 0L && clean._7 == 0L && clean._8 == 0L)
    // doc-count signals can never exceed the doc count
    out.values.foreach { r =>
      assert(r._3 <= r._2 && r._4 <= r._2 && r._5 <= r._2)
      assert(r._6 >= r._3 && r._7 >= r._4 && r._8 >= r._5)
    }
  }

  test("x121 lsh fidelity: band rows partition the candidates, summary row is their recall") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = Dedup.lshFidelity(docs)
      .select("n_match", "n_cands", "n_true", "prec_e6")
      .as[(Long, Long, Long, Long)].collect()
    val (summary, bands) = out.partition(_._1 == -1L)
    assert(summary.length == 1 && bands.nonEmpty)
    bands.foreach { case (m, nc, nt, p) =>
      assert(m >= 0 && m <= Dedup.K && nt >= 0 && nt <= nc && nc > 0)
      assert(p == 1000000L * nt / nc)
    }
    // every candidate pair appears in exactly one band row, so the band
    // rows' true-pair mass IS the captured set the summary row reports
    val sm = summary.head
    assert(bands.map(_._2).sum == Dedup.minhashCandidates(docs).count())
    assert(bands.map(_._3).sum == sm._3, "sum of banded true pairs == captured true pairs")
    assert(sm._2 == Dedup.jaccardPairs(docs).count(), "summary n_cands == |truth|")
    assert(sm._3 <= sm._2 && sm._4 == (if (sm._2 > 0) 1000000L * sm._3 / sm._2 else 0L))
    // the refactor guard: minhashPairs is exactly the thresholded candidates
    val viaCands = Dedup.minhashCandidates(docs)
      .filter(col("n_match") >= Dedup.K / 2).count()
    assert(viaCands == Dedup.minhashPairs(docs).count())
    // identical docs must band-collide: plant two copies, recall set grows
    val planted = docs.select("doc_id", "text").limit(0).unionByName(Seq(
      (900001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (900002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text"))
    val pOut = Dedup.lshFidelity(planted)
      .filter(col("n_match") === -1L)
      .select("n_cands", "n_true").as[(Long, Long)].head()
    assert(pOut == ((1L, 1L)), s"identical pair must be truth AND captured: $pOut")
  }

  test("x122 cluster diameter: exact aggregation identities against the pair list") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = Dedup.clusterDiameter(docs)
      .select("size", "n_clusters", "n_chained", "max_diam", "sum_edges", "sum_pairs")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (sz, nc, nch, diam, se, sp) =>
      assert(sz >= 2 && nc > 0 && diam >= 0 && diam <= 60)
      // every cluster of this size contributes exactly C(size,2) pairs
      assert(sp == nc * sz * (sz - 1) / 2)
      assert(se <= sp && nch <= nc)
      // a cluster is chained iff some within pair exceeds hamming 8 iff
      // its edge set is a strict subset of its pair set
      assert((nch > 0) == (se < sp), s"chained/edge-deficit must agree: ($sz,$nch,$se,$sp)")
      assert((nch > 0) == (diam > 8))
    }
    // every hamming<=8 pair lands inside exactly one cluster
    assert(out.map(_._5).sum == Dedup.simhashPairs(docs).count())
  }

  test("x121 sampleMod knob: identical to running the full audit on the pre-filtered corpus") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("n_match", "n_cands", "n_true", "prec_e6")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val knob = rows(Dedup.lshFidelity(docs, sampleMod = 2L))
    val prefiltered = rows(Dedup.lshFidelity(docs.filter(col("doc_id") % 2 === 0)))
    assert(knob == prefiltered, "sampleMod must be exactly the pre-filter identity")
    assert(knob.exists(_._1 == -1L), "sampled audit still reports the recall row")
    // mod 1 is the exact audit
    assert(rows(Dedup.lshFidelity(docs, sampleMod = 1L)) == rows(Dedup.lshFidelity(docs)))
  }

  test("x122 maxClusterSize cap: true sizes preserved, capped rows flagged, pair cost bounded") {
    // a known cluster layout: one 6-clique (identical texts), one pair,
    // two singletons (no pairs -> not clustered)
    val docs = ((0 until 6).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta")) ++
      Seq(
        (10L, "omicron pi rho sigma tau upsilon phi"),
        (11L, "omicron pi rho sigma tau upsilon phi"),
        (20L, "one unique doc of words here entirely"),
        (21L, "another rather different document text body")))
      .toDF("doc_id", "text")
    val exact = Dedup.clusterDiameter(docs)
      .select("size", "n_clusters", "n_chained", "max_diam", "sum_edges", "sum_pairs", "n_capped")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(exact.map(r => r._1 -> r._2) == Seq(2L -> 1L, 6L -> 1L))
    assert(exact.forall(_._7 == 0L), "uncapped audit never flags")
    val capped = Dedup.clusterDiameter(docs, maxClusterSize = 3L)
      .select("size", "n_clusters", "n_chained", "max_diam", "sum_edges", "sum_pairs", "n_capped")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // TRUE sizes survive capping; only the pair legs are sampled
    assert(capped.map(r => r._1 -> r._2) == Seq(2L -> 1L, 6L -> 1L))
    val (below, above) = (capped.find(_._1 == 2L).get, capped.find(_._1 == 6L).get)
    assert(below == exact.find(_._1 == 2L).get, "below-cap clusters are exact")
    assert(above._7 == 1L, "the 6-clique is flagged capped")
    assert(above._6 == 3L * 2L / 2L, "sampled pairs = C(cap,2)")
    assert(above._4 <= exact.find(_._1 == 6L).get._4, "capped diameter is a lower bound")
    // the fixture corpus: capping at DiamCap keeps every row's identities
    val real = graft.query.Registry.table(spark, sf, "documents")
    val rc = Dedup.clusterDiameter(real, maxClusterSize = Dedup.DiamCap)
      .select("size", "n_clusters", "n_chained", "max_diam", "sum_edges", "sum_pairs", "n_capped")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val re = Dedup.clusterDiameter(real)
      .select("size", "n_clusters").as[(Long, Long)].collect().toMap
    rc.foreach { case (sz, nc, _, _, se, sp, ncap) =>
      assert(re(sz) == nc, s"true size distribution preserved at $sz")
      val kept = math.min(sz, Dedup.DiamCap)
      assert(sp == nc * kept * (kept - 1) / 2 && se <= sp)
      assert(ncap == (if (sz > Dedup.DiamCap) nc else 0L))
    }
    // a cap of 1 would silently drop every cluster — refused loudly
    intercept[IllegalArgumentException] {
      Dedup.clusterDiameter(real, maxClusterSize = 1L)
    }
  }

  test("x123 shard balance: totals conserve, integer identities hold, shards are sane") {
    val docs = graft.query.Registry.table(spark, sf, "documents")
    val out = DataPrep.shardBalance(docs)
      .select("shard", "n_docs", "n_tok", "tok_ppm", "dev_e6")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= DataPrep.ShardN)
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach(r => assert(r._1 >= 0 && r._1 < DataPrep.ShardN && r._2 > 0))
    assert(out.map(_._2).sum == docs.count())
    val tot = out.map(_._3).sum
    val nTok = docs.select(sum(size(XText.words(col("text"))).cast("long")))
      .as[Long].head()
    assert(tot == nTok, "token mass conserves")
    out.foreach { case (_, _, nt, ppm, dev) =>
      assert(ppm == 1000000L * nt / tot)
      assert(dev == 1000000L * nt * DataPrep.ShardN / tot)
    }
  }
}
