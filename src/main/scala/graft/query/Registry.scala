package graft.query

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query + its DuckDB oracle, kept side by side so the column
  * names / semantics can never drift apart (the driver hash-compares values
  * after sorting columns by name — SURVEY §5).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    doc: String)(
    val run: (SparkSession, String) => DataFrame)

object Registry {

  /** Read a driver testdata table (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val all: Seq[Q] =
    ParityQueries.all ++ AnalyticsQueries.all ++ graft.xscale.XScaleQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map(q => q.name -> q.run): _*)

  lazy val oracleSql: Map[String, String] =
    ListMap(all.flatMap(q => q.oracle.map(o => q.name -> o)): _*)
}
