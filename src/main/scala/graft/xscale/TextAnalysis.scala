package graft.xscale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.query.Q
import graft.query.Registry.table
import XHash.{h60, h60Sql}

/** Text analysis over the `documents` table: language-ID (marker-word
  * heuristic), quality scoring (length / stopword / token-count ratios),
  * token counting (whitespace + a BPE-ish chunking regex) and document
  * fingerprinting (min-hash over word-5-gram shingles, winnowing-style).
  *
  * Scale posture (100 TB): every operator here is a pure per-row expression
  * over the text column — no UDF, no shuffle except the final small
  * aggregation; cost is linear scan work inside whole-stage codegen.
  */
object TextAnalysis {

  /** Marker stopwords per language, priority order breaks score ties. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "une"),
    "es" -> Seq("el", "los", "una"))

  private def hits(ws: Column, set: Seq[String]): Column =
    size(filter(ws, w => w.isin(set.map(x => x: Any): _*))).cast("long")

  private def hitsSql(set: Seq[String]): String =
    s"len(list_filter(ws, w -> w IN (${set.map(w => s"'$w'").mkString(", ")})))"

  val queries: Seq[Q] = Seq(
    // ----- x08: language identification (marker-word heuristic) -----
    Q(
      "x08_langid",
      Some {
        val hitCols = markers.map { case (l, set) => s"${hitsSql(set)} AS h_$l" }.mkString(", ")
        val caseExpr = markers.zipWithIndex.map { case ((l, _), i) =>
            val rest = markers.drop(i + 1).map { case (o, _) => s"h_$o" }
            val ge = if (rest.isEmpty) s"h_$l > 0"
                     else s"h_$l > 0 AND h_$l >= greatest(${rest.mkString(", ")})"
            s"WHEN $ge THEN '$l'"
          }.mkString(" ")
        s"WITH w AS (SELECT doc_id, lang, ${XText.wordsSql("text")} AS ws FROM documents), " +
          s"h AS (SELECT doc_id, lang, $hitCols FROM w), " +
          s"p AS (SELECT lang, CASE $caseExpr ELSE 'und' END AS predicted FROM h) " +
          "SELECT lang, predicted, count(*) AS n FROM p GROUP BY lang, predicted " +
          "ORDER BY lang, predicted"
      },
      "argmax over marker-word hit counts, ties broken by priority order; confusion matrix vs the " +
        "labelled lang column"
    ) { (s, dir) =>
      val d = table(s, dir, "documents").withColumn("ws", XText.words(col("text")))
      val withHits = markers.foldLeft(d) { case (df, (l, set)) =>
        df.withColumn(s"h_$l", hits(col("ws"), set))
      }
      // CASE order must mirror the oracle: earlier languages win ties.
      def cond(l: String, i: Int): Column = {
        val rest = markers.drop(i + 1).map { case (o, _) => col(s"h_$o") }
        if (rest.isEmpty) col(s"h_$l") > 0
        else {
          // Spark's greatest() requires >= 2 args; a single competitor
          // compares directly.
          val maxRest = if (rest.size == 1) rest.head else greatest(rest: _*)
          col(s"h_$l") > 0 && col(s"h_$l") >= maxRest
        }
      }
      val predicted = markers.zipWithIndex.tail
        .foldLeft(when(cond(markers.head._1, 0), markers.head._1)) {
          case (acc, ((l, _), i)) => acc.when(cond(l, i), l)
        }
        .otherwise("und")
      withHits
        .select(col("lang"), predicted.as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // ----- x09: quality scoring -----
    Q(
      "x09_quality",
      Some(
        s"WITH w AS (SELECT doc_id, source, n_chars, ${XText.wordsSql("text")} AS ws FROM documents), " +
          s"f AS (SELECT source, len(ws) AS n_tok, ${hitsSql(Seq("the", "a", "of", "and"))} AS stop_hits, " +
          "n_chars FROM w), " +
          "q AS (SELECT source, n_tok, CAST(round((0.4 * (least(n_chars, 400) / 400.0) + " +
          "0.3 * least(5.0 * (stop_hits / (1.0 * n_tok)), 1.0) + " +
          "0.3 * (least(n_tok, 80) / 80.0)) * 10000) AS BIGINT) AS score_e4 FROM f) " +
          "SELECT source, count(*) AS n_docs, CAST(sum(score_e4) AS BIGINT) AS sum_score_e4, " +
          "CAST(sum(n_tok) AS BIGINT) AS sum_tok FROM q GROUP BY source ORDER BY source"),
      "length / stopword-ratio / token-count quality score in [0,1], fixed-point e4 so integer sums " +
        "cross the oracle exactly"
    ) { (s, dir) =>
      val d = table(s, dir, "documents")
        .withColumn("ws", XText.words(col("text")))
        .withColumn("n_tok", size(col("ws")).cast("long"))
        .withColumn("stop_hits", hits(col("ws"), Seq("the", "a", "of", "and")))
      val score =
        lit(0.4) * (least(col("n_chars"), lit(400L)) / lit(400.0)) +
          lit(0.3) * least(lit(5.0) * (col("stop_hits") / (lit(1.0) * col("n_tok"))), lit(1.0)) +
          lit(0.3) * (least(col("n_tok"), lit(80L)) / lit(80.0))
      d.withColumn("score_e4", round(score * 10000).cast("long"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("score_e4").as("sum_score_e4"),
          sum("n_tok").as("sum_tok"))
        .orderBy("source")
    },

    // ----- x10: token counting (whitespace + BPE-ish regex chunks) -----
    Q(
      "x10_tokens",
      Some(
        s"WITH t AS (SELECT lang, len(${XText.wordsSql("text")}) AS ws_tok, " +
          "len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]+|\\S')) AS bpe_tok FROM documents) " +
          "SELECT lang, count(*) AS n_docs, CAST(sum(ws_tok) AS BIGINT) AS sum_ws_tok, " +
          "CAST(sum(bpe_tok) AS BIGINT) AS sum_bpe_tok FROM t GROUP BY lang ORDER BY lang"),
      "whitespace token count + a BPE-ish subword chunking regex (max-4-char pieces); pure scan work"
    ) { (s, dir) =>
      table(s, dir, "documents")
        .withColumn("ws_tok", size(XText.words(col("text"))).cast("long"))
        .withColumn(
          "bpe_tok",
          size(expr("regexp_extract_all(text, '[a-z]{1,4}|[0-9]+|\\\\S', 0)")).cast("long"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("ws_tok").as("sum_ws_tok"),
          sum("bpe_tok").as("sum_bpe_tok"))
        .orderBy("lang")
    },

    // ----- x11: document fingerprinting (min-hash over 5-gram shingles) -----
    Q(
      "x11_fingerprint",
      Some {
        val sh = XText.shinglesSql("ws", 5)
        s"WITH w AS (SELECT doc_id, ${XText.wordsSql("text")} AS ws FROM documents), " +
          s"s AS (SELECT doc_id, $sh AS ss FROM w) " +
          s"SELECT doc_id, list_aggregate(list_transform(ss, sgl -> ${h60Sql("sgl")}), 'min') " +
          "AS fingerprint FROM s WHERE doc_id < 100 ORDER BY doc_id"
      },
      "winnowing-style rolling fingerprint: min 60-bit hash over word-5-gram shingles, one value per doc; " +
        "identical fingerprints => near-identical prefixes, used as a cheap first-pass dedup key"
    ) { (s, dir) =>
      table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          array_min(transform(XText.shingles(XText.words(col("text")), 5), x => h60(x)))
            .as("fingerprint"))
        .orderBy("doc_id")
    }
  )
}
