package graft.xscale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text decomposition used by the dedup / text-analysis operators,
  * with DuckDB-SQL twins for oracle authoring. Whitespace tokenization and
  * word k-gram shingling are pure per-row array expressions — no UDFs, fully
  * inside whole-stage codegen, zero shuffle.
  */
object XText {

  /** Whitespace tokens. */
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
