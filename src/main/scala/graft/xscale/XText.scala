package graft.xscale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text decomposition used by the dedup / text-analysis operators,
  * with DuckDB-SQL twins for oracle authoring. Whitespace tokenization and
  * word k-gram shingling are pure per-row array expressions — no UDFs, fully
  * inside whole-stage codegen, zero shuffle.
  */
object XText {

  /** Whitespace tokens.
    *
    * CROSS-ENGINE WHITESPACE CONTRACT: `\s` is not identical across regex
    * engines — Java's is ASCII `[ \t\n\x0B\f\r]`, DuckDB/RE2's is
    * `[\t\n\f\r ]` (no U+000B vertical tab), and neither matches Unicode
    * spaces (NBSP, ideographic space, …) without flags. Every oracle-
    * compared operator tokenizes through here (or its native-codegen
    * equivalents `TokenHash60`/`GopherMetrics`/`RepetitionMetrics`, which
    * implement the same ASCII set), so the project-wide assumption is:
    * corpus text contains only the COMMON ASCII whitespace
    * `[ \t\n\r\f]`. The synthetic corpora satisfy this; a real-world
    * corpus with vertical tabs or Unicode spaces must be normalized
    * first (e.g. `regexp_replace(text, "[\\u000B\\p{Zs}]", " ")` on the
    * Spark side and the RE2 analog in the oracle) or token counts
    * silently diverge between engines.
    */
  def words(text: Column): Column = split(text, "\\s+")

  def wordsSql(inner: String): String =
    s"regexp_split_to_array($inner, '\\s+')"

  /** Distinct word k-gram shingles; a doc shorter than k words contributes
    * its whole text as a single shingle so it still participates in dedup.
    */
  def shingles(ws: Column, k: Int): Column =
    when(
      size(ws) >= k,
      array_distinct(
        transform(
          sequence(lit(0), size(ws) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + lit(j + 1))): _*))))
      .otherwise(array(concat_ws(" ", ws)))

  def shinglesSql(ws: String, k: Int): String = {
    val gram = (0 until k).map(j => s"$ws[i + $j]").mkString(" || ' ' || ")
    s"CASE WHEN len($ws) >= $k THEN list_distinct(list_transform(" +
      s"generate_series(1, len($ws) - ${k - 1}), i -> $gram)) " +
      s"ELSE [array_to_string($ws, ' ')] END"
  }
}
