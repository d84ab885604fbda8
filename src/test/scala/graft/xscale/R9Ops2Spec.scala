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
}
