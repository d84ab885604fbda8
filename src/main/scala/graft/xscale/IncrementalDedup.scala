package graft.xscale

import org.apache.spark.sql.{DataFrame, graftnative}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.query.Q
import graft.query.Registry.table

/** Incremental cross-batch deduplication (x17): dedup an incoming batch of
  * documents against an already-deduped corpus WITHOUT shuffling the corpus.
  *
  * The 100 TB problem: a daily batch (say 10^7 docs) arrives against a
  * 10^10-doc corpus. The naive `batch ANTI JOIN corpus ON key` shuffles the
  * corpus on the key every day. Instead:
  *
  *  1. Build a Bloom filter over the corpus's normalized-text keys ONCE
  *     (distributed treeAggregate via `df.stat.bloomFilter`; ~1.2 GB bits
  *     for 10^9 keys at 1% fpp — persist it with the lake and `putLong` new
  *     survivors in as they land; at 10^10 keys shard the filter by
  *     partition and OR the probes).
  *  2. Probe each batch key against the filter inside the scan
  *     ([[org.apache.spark.sql.graftnative.BloomMightContainLong]], codegen).
  *     Bloom filters have no false negatives, so probe-negative rows are
  *     PROVEN new — they never touch the corpus at all.
  *  3. Only probe-positive candidates (true dups + ~fpp of the batch) get
  *     exact verification: one corpus scan, semi-joined against the tiny
  *     broadcast candidate-key set — the corpus is scanned but never
  *     shuffled, and the scan prunes to candidate keys.
  *
  * Correctness: because step 3 verifies exactly, the result is identical to
  * the plain anti-join — the oracle for x17 IS the plain anti-join in SQL.
  */
object IncrementalDedup {

  /** 60-bit exact-dedup key: [[XHash.h60]] of the aggressively normalized
    * text ([[Dedup.normText]]) — same key both engines compute identically.
    */
  def withKey(docs: DataFrame): DataFrame =
    docs.withColumn("_key", XHash.h60(Dedup.normText(col("text"))))

  /** Distributed Bloom build over the corpus keys (one corpus scan). */
  def corpusBloom(corpus: DataFrame, expectedItems: Long, fpp: Double): BloomFilter =
    withKey(corpus).stat.bloomFilter("_key", math.max(expectedItems, 1L), fpp)

  /** Batch rows that survive dedup against the corpus (and within the
    * batch itself, keep-first by doc_id). Result is exactly
    * `dedupKeepFirst(batch) ANTI JOIN corpus ON _key` but the corpus is
    * never shuffled: probe-negatives skip it entirely and probe-positives
    * verify via broadcast semi/anti joins.
    */
  def newDocs(
      corpus: DataFrame,
      batch: DataFrame,
      bloom: BloomFilter,
      orderCols: Seq[String] = Seq("doc_id")): DataFrame = {
    // orderCols picks the within-batch survivor (keep-FIRST): default
    // doc_id is the no-timestamp stand-in; a crawl pipeline passes its
    // arrival time column(s) so the earliest fetch wins
    val b = graft.lake.Lake.dedupKeepFirst(withKey(batch), Seq("_key"), orderCols)
    val probe = graftnative.api.bloomMightContain(bloom, col("_key"))
    val proven = b.filter(!probe) // no false negatives: definitely new
    val candidates = b.filter(probe)
    // Corpus keys that really collide with a candidate: ONE corpus scan,
    // candidate keys broadcast, no corpus shuffle.
    val dupKeys = withKey(corpus)
      .select("_key")
      .join(broadcast(candidates.select("_key")), Seq("_key"), "left_semi")
      .distinct()
    proven.unionByName(candidates.join(broadcast(dupKeys), Seq("_key"), "left_anti"))
  }

  val queries: Seq[Q] = Seq(
    Q(
      "x17_dedup_incremental",
      Some(
        s"WITH k AS (SELECT doc_id, source, ${XHash.h60Sql(Dedup.normSql)} AS key FROM documents), " +
          "c AS (SELECT DISTINCT key FROM k WHERE doc_id % 5 <> 0), " +
          "b AS (SELECT doc_id, source, key, ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id) " +
          "AS rn FROM k WHERE doc_id % 5 = 0) " +
          "SELECT doc_id, source FROM b WHERE rn = 1 AND key NOT IN (SELECT key FROM c) " +
          "ORDER BY doc_id"),
      "incremental dedup of a batch (doc_id % 5 = 0) against the corpus (the rest) via Bloom " +
        "pre-filter + exact verify; identical to the plain anti-join (Bloom has no false " +
        "negatives) but the corpus is scanned once and never shuffled"
    ) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val bloom = corpusBloom(corpus, expectedItems = corpus.count(), fpp = 0.03)
      newDocs(corpus, batch, bloom).select("doc_id", "source").orderBy("doc_id")
    })
}
