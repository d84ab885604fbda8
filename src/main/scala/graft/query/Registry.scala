package graft.query

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** Read a driver testdata table (TESTDATA.md), normalizing `ts` across
    * the physical forms the generator has emitted over time:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]) unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` — set in
    *    Verify/Bench/test sessions — which surfaces it as a BIGINT of
    *    epoch-nanos. Convert to a microsecond timestamp (truncating, exactly
    *    how DuckDB reads TIMESTAMP_NS into its default TIMESTAMP).
    *  - parquet timestamp[us] without UTC-adjustment metadata: Spark reads
    *    TIMESTAMP_NTZ, which time-arithmetic functions (`unix_micros`)
    *    reject with DATATYPE_MISMATCH. The session TZ is pinned UTC, so
    *    casting to TIMESTAMP is a wall-clock identity and matches DuckDB's
    *    `epoch_us` on the same naive timestamps.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  lazy val all: Seq[Q] =
    ParityQueries.all ++ AnalyticsQueries.all ++ graft.xscale.XScaleQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map(q => q.name -> q.run): _*)

  lazy val oracleSql: Map[String, String] =
    ListMap(all.flatMap(q => q.oracle.map(o => q.name -> o)): _*)
}
