package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `Registry.table`'s `ts` normalization across BOTH physical forms
  * the testdata generator has emitted over time — epoch-nano BIGINT (the
  * TIMESTAMP(NANOS) + nanosAsLong read) and TIMESTAMP_NTZ (plain
  * `timestamp[us]` with no UTC adjustment). The r8 driver regression was
  * exactly this: a testdata regeneration flipped the physical type and
  * `unix_micros` started throwing DATATYPE_MISMATCH. Both forms must read
  * back as TIMESTAMP with identical wall-clock values, and time
  * arithmetic must work on the result.
  */
class RegistryTsSpec extends SparkSpec {
  import spark.implicits._

  private val instantsUs = Seq(0L, 1L, 1700000000000000L, 1700000000123456L)

  test("epoch-nano BIGINT and TIMESTAMP_NTZ ts forms normalize identically") {
    val dir = tmpDir("registry-ts").getPath

    // form 1: BIGINT epoch-nanos (how nanosAsLong surfaces TIMESTAMP_NANOS)
    val nanosDir = s"$dir/nanos"
    instantsUs.map(us => (us, us * 1000)).toDF("event_id", "ts")
      .write.parquet(s"$nanosDir/events.parquet")

    // form 2: TIMESTAMP_NTZ (plain timestamp[us], no UTC adjustment);
    // build via timestamp_micros so sub-millisecond precision survives,
    // then cast TIMESTAMP -> NTZ (wall-clock identity under UTC)
    val ntzDir = s"$dir/ntz"
    instantsUs.map(us => (us, us)).toDF("event_id", "us")
      .select(col("event_id"), expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts"))
      .write.parquet(s"$ntzDir/events.parquet")

    val a = Registry.table(spark, nanosDir, "events")
    val b = Registry.table(spark, ntzDir, "events")

    // both normalize to TIMESTAMP
    assert(a.schema("ts").dataType.typeName == "timestamp")
    assert(b.schema("ts").dataType.typeName == "timestamp")

    // identical microsecond values (session TZ pinned UTC => wall-clock id)
    def us(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val ua = us(a)
    assert(ua == us(b))
    // and the values are exactly the input microsecond instants
    assert(ua.map(_._2) == instantsUs)
  }
}
