package graft.query

import graft.SparkSpec

/** Salted-join equivalence: identical rows to the plain join/agg, with the
  * partitioning property that motivates it (join key carries the salt).
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the shape that straggles a plain join
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"key$i", i.toLong)
  }.toDF("k", "v")

  private def dim = Seq(("hot", "H"), ("key901", "A"), ("key950", "B")).toDF("k", "label")

  test("saltedInnerJoin returns exactly the plain join's rows") {
    val plain = skewed.join(dim, "k").select("k", "v", "label")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", 8).select("k", "v", "label")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
    assert(plain.length === 902) // 900 hot + 2 dim hits
  }

  test("salted join's shuffle key includes the salt (hot key splits across partitions)") {
    val plan = SkewJoin.saltedInnerJoin(skewed, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt column missing from plan:\n$plan")
  }

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedCount(skewed, "k", 8)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
    assert(plain("hot") === 900L)
  }
}
