package graft.xscale

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.source.Synthetic

/** Round-11: the power-law duplicate fixture — the REALISTIC dedup corpus
  * (≈99% unique, ≈1% dup mass in power-law-sized clusters) that lets the
  * dedup/ANN heavies be MEASURED at 100× instead of argued from the
  * all-clique worst case, plus the properties the measurements rely on.
  */
class R11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000L
  private lazy val docs = Synthetic.powerlawDocs(spark, N).localCheckpoint()

  /** Cluster sizes via exact text identity for EXACT clusters plus the
    * canonical prefix for NEAR clusters (members differ only in the one
    * appended " v<hash>" token).
    */
  private lazy val clusterSizes = docs
    .select(regexp_replace(col("text"), " v\\d+$", "").as("canon_text"))
    .groupBy("canon_text").count()
    .select(col("count").as("size"))
    .localCheckpoint()

  test("powerlaw fixture: ~1% dup mass, power-law cluster sizes, deterministic") {
    assert(docs.count() === N)
    // dup mass: docs sharing a canonical text with at least one other doc
    val dupDocs = clusterSizes.filter(col("size") > 1)
      .agg(sum("size")).as[Long].head()
    assert(dupDocs > N / 200 && dupDocs < N / 40,
      s"expected ~1% dup mass (${N / 100}), got $dupDocs")
    // power-law-ish sizes: small clusters outnumber big ones, and at
    // n=20k the largest expected cluster is the whole k=10 class (~20)
    val sizes = clusterSizes.filter(col("size") > 1)
      .groupBy("size").count().as[(Long, Long)].collect().sortBy(_._1)
    assert(sizes.head._1 === 2L && sizes.last._1 >= 8L,
      s"size spectrum must span small→big: ${sizes.mkString(",")}")
    assert(sizes.head._2 > sizes.last._2,
      s"small clusters must outnumber big: ${sizes.mkString(",")}")
    // deterministic: a regeneration is byte-identical
    val again = Synthetic.powerlawDocs(spark, N)
    assert(docs.exceptAll(again).isEmpty && again.exceptAll(docs).isEmpty)
  }

  test("powerlaw fixture: exact AND near dup mass both present; near-dups detectable") {
    // exact mass: byte-identical texts collapse under x01 exact dedup
    val nExact = N - Dedup.dedupExact(docs).count()
    assert(nExact > 20, s"exact clusters must collapse under exact dedup: $nExact")
    // near mass: simhash finds pairs exact dedup cannot (the appended
    // member token keeps hamming well under the ≤8 pair threshold)
    val exactSurvivors = Dedup.dedupExact(docs)
    val nearPairs = Dedup.simhashPairs(exactSurvivors).count()
    assert(nearPairs > 20, s"near clusters must survive exact dedup yet pair up: $nearPairs")
    // and the full pipeline (x14 shape) removes MORE than exact alone
    val afterFuzzy = DedupClusters.dedupByPairs(
      docs,
      Dedup.simhashPairs(docs).select(col("doc_id_a").as("a"), col("doc_id_b").as("b")))
      .count()
    assert(afterFuzzy < exactSurvivors.count(),
      s"fuzzy dedup must beat exact: $afterFuzzy vs ${exactSurvivors.count()}")
  }

  test("powerlaw fixture: cluster membership independent of doc_id mod — sampling thins clusters") {
    // the x121 sampled-truth-leg property: a mod-10 sample keeps ~1/10 of
    // every cluster, so within-cluster PAIR mass shrinks ~mod² (the
    // id-shifted clique fixture keeps whole cliques instead, by
    // construction — its shift is a multiple of the mod)
    def pairMass(d: org.apache.spark.sql.DataFrame): Long =
      d.select(regexp_replace(col("text"), " v\\d+$", "").as("t"))
        .groupBy("t").count()
        .agg(sum(expr("count * (count - 1) div 2"))).as[Long].head()
    val full = pairMass(docs)
    val sampled = pairMass(docs.filter(col("doc_id") % 10 === 0))
    assert(full > 100L, s"fixture must carry real pair mass: $full")
    assert(sampled * 20 < full,
      s"mod-10 sample must shrink pair mass far sub-linearly: $sampled vs $full")
  }

  test("text-leg auto rule: narrow simhash inside its boundary, minhash past it; cascade honors it") {
    assert(Dedup.textLegFor(1000L) === Dedup.SimhashLeg)
    assert(Dedup.textLegFor(Dedup.NarrowSimhashBoundary) === Dedup.SimhashLeg)
    assert(Dedup.textLegFor(Dedup.NarrowSimhashBoundary + 1) === Dedup.MinhashLeg)
    // on this (sub-boundary) fixture the auto cascade IS the narrow
    // cascade — same stage-attributed waterfall rows
    val auto = Dedup.dedupCascadeAuto(docs).orderBy("source").collect().toSeq
    val narrow = Dedup.dedupCascade(docs).orderBy("source").collect().toSeq
    assert(auto === narrow)
    // and the minhash leg's cascade removes near mass too (the >boundary
    // posture produces a real waterfall, not a no-op near stage)
    val mh = Dedup.dedupCascade(docs, Dedup.MinhashLeg)
      .agg(sum("removed_near")).as[Long].head()
    assert(mh > 0, s"minhash-leg cascade must remove near mass: $mh")
  }

  test("powerlaw embeddings: cluster-coherent vectors, near noise inside dup thresholds") {
    val emb = Synthetic.powerlawEmbeddings(spark, 4000L).localCheckpoint()
    assert(emb.count() === 4000L)
    assert(emb.select(size(col("embedding"))).distinct().as[Int].collect().toSeq === Seq(64))
    // doc/embedding cluster structure AGREES on the shared id range: two
    // ids with identical text (exact cluster) carry near-identical vectors
    val textKey = Synthetic.powerlawDocs(spark, 4000L)
      .select(col("doc_id"), regexp_replace(col("text"), " v\\d+$", "").as("t"))
    val pairs = textKey.as("a")
      .join(textKey.as("b"), col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("va"), col("b.doc_id").as("vb"))
    val va = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val vb = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val maxDiff = pairs.join(va, "va").join(vb, "vb")
      .select(aggregate(
        zip_with(col("ea"), col("eb"), (x, y) => abs(x - y)),
        lit(0.0), (acc, x) => greatest(acc, x.cast("double"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(pairs.count() > 10, "the shared id range must contain dup clusters")
    assert(maxDiff < 0.005, s"cluster members' vectors must be near-identical: $maxDiff")
  }
}
