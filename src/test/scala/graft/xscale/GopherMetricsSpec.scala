package graft.xscale

import org.apache.spark.sql.{graftnative, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native single-pass [[graftnative.GopherMetrics]] must be value-
  * identical to the declarative Spark expression chain it replaced —
  * pinned on edge-case strings and on the real sf0.001 corpus.
  */
class GopherMetricsSpec extends SparkSpec {
  import spark.implicits._

  /** The original declarative chain (pre-native), kept here as the
    * executable definition of the intended semantics.
    */
  private def declarative(df: DataFrame): DataFrame =
    df.withColumn("ws", XText.words(col("text")))
      .withColumn("nw", size(col("ws")).cast("long"))
      .withColumn("swl", length(regexp_replace(col("text"), "\\s+", "")).cast("long"))
      .withColumn("nsym", size(expr("regexp_extract_all(text, '#|\\\\.\\\\.\\\\.', 0)")).cast("long"))
      .withColumn(
        "stop_hits",
        size(filter(col("ws"), w => w.isin("the", "a", "of", "and"))).cast("long"))
      .withColumn("alpha", size(filter(col("ws"), x => x.rlike("[a-z]"))).cast("long"))
      .withColumn("tot2", when(col("nw") >= 2, col("nw") - 1).otherwise(lit(1L)).cast("long"))
      .withColumn("d2", size(XText.shingles(col("ws"), 2)).cast("long"))
      .withColumn("tot3", when(col("nw") >= 3, col("nw") - 2).otherwise(lit(1L)).cast("long"))
      .withColumn("d3", size(XText.shingles(col("ws"), 3)).cast("long"))
      .drop("ws")

  private val metricCols = Seq("nw", "swl", "nsym", "stop_hits", "alpha", "tot2", "d2", "tot3", "d3")

  private def compare(df: DataFrame): Unit = {
    val native = TextAnalysis.gopherAnnotate(df)
      .select(col("text") +: metricCols.map(col): _*)
    val ref = declarative(df)
      .select(col("text") +: metricCols.map(col): _*)
    val diff = native.exceptAll(ref).union(ref.exceptAll(native))
    assert(diff.isEmpty, diff.collect().take(3).mkString("; "))
  }

  test("edge-case strings: empty, whitespace runs, symbols, short docs") {
    compare(Seq(
      "",
      " ",
      "  leading and   trailing  ",
      "one",
      "two words",
      "the a of and the a of and",
      "# ... #... ....... #",
      "tabs\tand\nnewlines\r\nmixed   spaces",
      "UPPER ONLY TOKENS 123 456",
      "repeat repeat repeat repeat repeat repeat repeat",
      "ünïcödé tökens with ascii inside",
      "a.b.c... x#y#z"
    ).toDF("text"))
  }

  test("sf0.001 corpus: native metrics == declarative chain") {
    compare(spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text"))
  }

  test("rule booleans and keep agree with recomputation from metrics") {
    val ann = TextAnalysis.gopherAnnotate(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text"))
    val bad = ann.filter(
      col("r_words") =!= col("nw").between(15, 10000) ||
        col("r_mwl") =!= (col("swl") >= lit(3) * col("nw") && col("swl") <= lit(5) * col("nw")) ||
        col("r_stop") =!= (col("stop_hits") >= 2) ||
        col("r_alpha") =!= (lit(5) * col("alpha") >= lit(4) * col("nw")) ||
        col("r_sym") =!= (lit(10) * col("nsym") <= col("nw")) ||
        col("r_dup2") =!= (lit(20) * (col("tot2") - col("d2")) <= col("tot2")) ||
        col("r_dup3") =!= (lit(50) * (col("tot3") - col("d3")) <= col("tot3")) ||
        col("r_keep") =!= TextAnalysis.gopherRules.map(col).reduce(_ && _))
    assert(bad.isEmpty)
  }
}
