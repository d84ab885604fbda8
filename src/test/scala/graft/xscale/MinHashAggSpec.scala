package graft.xscale

import org.apache.spark.sql.graftnative
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MinHashAgg TypedImperativeAggregate: partitioning-independent,
  * consistent with the per-row MinHashSig expression, SQL-callable.
  */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("group signature == elementwise min of member per-row signatures") {
    val perDoc = Dedup.withSignature(docs.select("doc_id", "text"))
      .join(docs.select("doc_id", "source"), "doc_id")
    val fromRows = perDoc.groupBy("source")
      .agg((0 until Dedup.K).map(i => min(col(s"sig$i")).as(s"m$i")).head,
        (1 until Dedup.K).map(i => min(col(s"sig$i")).as(s"m$i")): _*)
      .select(col("source"), array((0 until Dedup.K).map(i => col(s"m$i")): _*).as("sig"))
    val fromAgg = docs
      .select(col("source"), explode(graftnative.api.shingleHash60(col("text"), 3)).as("h"))
      .groupBy("source").agg(graftnative.MinHashAgg(col("h"), Dedup.K).as("sig"))
    val diff = fromAgg.exceptAll(fromRows).union(fromRows.exceptAll(fromAgg))
    assert(diff.isEmpty, diff.collect().take(2).mkString("; "))
  }

  test("result is independent of partitioning (merge is commutative min)") {
    val sh = docs.select(col("source"),
      explode(graftnative.api.shingleHash60(col("text"), 3)).as("h"))
    val one = sh.repartition(1).groupBy("source")
      .agg(graftnative.MinHashAgg(col("h"), 16).as("sig")).collect().toSet
    val many = sh.repartition(7).groupBy("source")
      .agg(graftnative.MinHashAgg(col("h"), 16).as("sig")).collect().toSet
    assert(one === many)
  }

  test("callable from SQL via the extensions") {
    docs.select(col("source"), explode(graftnative.api.shingleHash60(col("text"), 3)).as("h"))
      .createOrReplaceTempView("sh_mha")
    val n = spark.sql(
      "SELECT source, graft_minhash_agg(h, 16) AS sig FROM sh_mha GROUP BY source")
      .filter(size(col("sig")) === 16).count()
    assert(n === 20)
  }

  test("empty group evaluates to null, not garbage") {
    val empty = Seq.empty[(String, Long)].toDF("g", "h")
    val out = empty.agg(graftnative.MinHashAgg(col("h"), 4).as("sig")).collect()
    assert(out.length === 1 && out(0).isNullAt(0))
  }
}
