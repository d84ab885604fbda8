package graft.xscale

import org.apache.spark.sql.{graftnative, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[graftnative.RepetitionMetrics]] — Gopher char-fraction repetition
  * signals — pinned on hand-computed fixtures (incl. codepoint semantics
  * for astral-plane chars) and coverage invariants on the real corpus.
  * Cross-engine value parity is the x31 DuckDB oracle's job.
  */
class RepetitionMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(text: String): (Long, Long, Long, Long, Long, Long) = {
    val r = Seq(text).toDF("text")
      .select(graftnative.api.repetitionMetrics(col("text")).as("m"))
      .selectExpr("m.totc", "m.top2", "m.top3", "m.top4", "m.cov5", "m.cov6")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("hand-computed fixtures") {
    // "a b a b c": top 2-gram "a b" x2 (2 chars) = 4; all 3-grams unique
    // (3 chars) = 3; 4-grams unique (4 chars) = 4; single 5-gram -> no dup.
    assert(metrics("a b a b c") == ((5L, 4L, 3L, 4L, 0L, 0L)))
    // 7x "x": 2-gram x6 -> 12, 3-gram x5 -> 15, 4-gram x4 -> 16;
    // dup 5/6-grams cover every position -> 7.
    assert(metrics("x x x x x x x") == ((7L, 12L, 15L, 16L, 7L, 7L)))
    // every gram unique -> tops are single-occurrence products, no dups
    assert(metrics("ab cd ab cd ef gh ab cd") == ((16L, 12L, 6L, 8L, 0L, 0L)))
    // empty text tokenizes to [""] -> all zero
    assert(metrics("") == ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("astral-plane chars count as codepoints (DuckDB length parity)") {
    // U+1D54F is a surrogate pair in UTF-16 but ONE codepoint
    val x = "𝕏"
    val (totc, top2, _, _, _, _) = metrics(s"$x$x y $x$x y")
    assert(totc == 6L) // 2+1+2+1 codepoints
    assert(top2 == 6L) // "XX y" x2, 3 codepoints
  }

  test("corpus invariants: dup coverage nested and bounded") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = docs.select(graftnative.api.repetitionMetrics(col("text")).as("m"))
      .selectExpr("m.totc AS totc", "m.top2 AS top2", "m.cov5 AS cov5", "m.cov6 AS cov6")
    // a duplicated 6-gram's two copies contain duplicated 5-grams covering
    // the same span, so cov6 <= cov5 <= totc always
    assert(m.filter(col("cov6") > col("cov5") || col("cov5") > col("totc")).isEmpty)
    // word-soup corpus: repeated 2-grams exist (top2 product beats a single
    // occurrence somewhere), while longer exact dups stay rare
    assert(m.filter(col("top2") > 0).count() > 0)
    assert(m.filter(col("cov5") > 0).count() < docs.count())
  }

  test("x31 query is consistent between struct fields and rule booleans") {
    val out = graft.SparkEntry.queries("x31_repetition")(spark, "/root/testdata/sf0.001")
    // the conjunction must be exactly the AND of the rule booleans, and the
    // floored e6 fraction can never exceed the exact rational threshold's
    // implied ceiling (floor(1e6*x/t) <= 200000 whenever 5x <= t)
    assert(out.filter(col("keep_rep") =!= (col("r_top2") && col("r_top3") &&
      col("r_top4") && col("r_dup5") && col("r_dup6"))).isEmpty)
    assert(out.filter(col("r_top2") && col("top2_e6") > 200000).isEmpty)
    assert(out.count() == spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())
  }
}
