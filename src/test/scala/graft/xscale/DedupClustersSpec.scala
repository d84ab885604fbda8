package graft.xscale

import graft.SparkSpec

/** Connected components + cluster-representative dedup: transitivity,
  * isolated pairs, untouched singletons, and end-to-end with real x04
  * pairs at sf0.001.
  */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain + separate pair + transitive closure") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("a", "b")
    val comp = DedupClusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L), comp.toString)
    assert(Seq(10L, 11L).forall(comp(_) == 10L), comp.toString)
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L), comp.toString)
  }

  test("connectedComponentsStar: chains, bridges, cliques match label propagation") {
    // long chain (diameter >> star rounds), a bridge joining two V-shapes
    // whose min-neighbor edges would NOT span it, a clique, and a pair
    val chain = (30L until 60L).map(i => (i, i + 1))
    val bridge = Seq((2L, 5L), (3L, 4L), (4L, 5L))
    val clique = Seq((70L, 71L), (70L, 72L), (71L, 72L))
    val pairs = (chain ++ bridge ++ clique :+ (90L, 91L)).toDF("a", "b")
    val star = DedupClusters.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val prop = DedupClusters.connectedComponents(pairs, maxIter = 40)
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
    assert(Seq(2L, 3L, 4L, 5L).forall(star(_) == 2L), star.toString)
    assert((30L to 60L).forall(star(_) == 30L), star.toString)
  }

  test("connectedComponentsStar: randomized graphs agree with label propagation") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("a", "b")
      val star = DedupClusters.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().toMap
      val prop = DedupClusters.connectedComponents(pairs, maxIter = 40)
        .as[(Long, Long)].collect().toMap
      assert(star === prop)
    }
  }

  test("reliable checkpointing yields identical components on both algorithms") {
    // the fault-tolerant path must be a pure storage-backend swap: same
    // fixtures, same components, lineage persisted under the reliable dir
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val chain = (30L until 60L).map(i => (i, i + 1))
    val bridge = Seq((2L, 5L), (3L, 4L), (4L, 5L))
    val pairs = (chain ++ bridge :+ (90L, 91L)).toDF("a", "b")
    val local = DedupClusters.connectedComponents(pairs, maxIter = 40)
      .as[(Long, Long)].collect().toMap
    val reliable = DedupClusters.connectedComponents(
      pairs, maxIter = 40, checkpointDir = Some(dir)).as[(Long, Long)].collect().toMap
    val reliableStar = DedupClusters.connectedComponentsStar(
      pairs, checkpointDir = Some(dir)).as[(Long, Long)].collect().toMap
    assert(reliable === local)
    assert(reliableStar === local)
    // the reliable dir was actually used (RDD checkpoint files exist)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
    assert(wrote > 0, s"no rdd checkpoints under $dir")
  }

  test("dedupByPairs: one survivor per cluster, singletons untouched") {
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L), (6L, 7L)).toDF("a", "b")
    val kept = DedupClusters.dedupByPairs(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 6L, 8L)) // clusters {1,2,5}→1, {6,7}→6
  }

  test("end-to-end: simhash pairs at sf0.001 collapse to cluster reps") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.queries.find(_.name == "x04_dedup_simhash").get
      .run(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id_a").as("a"),
        org.apache.spark.sql.functions.col("doc_id_b").as("b"))
    val kept = DedupClusters.dedupByPairs(docs, pairs)
    val nDocs = docs.count()
    val nKept = kept.count()
    val nPaired = pairs.select("a").union(pairs.select("b")).distinct().count()
    assert(nKept < nDocs) // something was deduped
    // survivors = singletons + one rep per component ⇒ strictly more than
    // docs - paired (each component keeps one)
    assert(nKept > nDocs - nPaired)
    // idempotent: pairs among survivors are gone
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val survivingPairs = pairs.as[(Long, Long)].collect()
      .count { case (a, b) => keptIds(a) && keptIds(b) }
    assert(survivingPairs === 0)
  }
}
