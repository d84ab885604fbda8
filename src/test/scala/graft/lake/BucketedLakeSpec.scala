package graft.lake

import graft.SparkSpec
import graft.model.Transaction

/** Bucketed lake: merge correctness plus the PLAN property that justifies
  * it — the existing (100 TB) side is read bucket-aligned with no Exchange;
  * only the incoming batch shuffles.
  */
class BucketedLakeSpec extends SparkSpec {
  import spark.implicits._

  private def tx(desc: String, amount: Double): Transaction =
    Transaction("DEBIT", "01/01/2024", desc, amount, 0.0, "", "", "", "chase", "1234")

  test("bucketed upsert: create, update-in-place, insert; key-unique") {
    val table = "graft_bucketed_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_swap")

    assert(BucketedLake.upsert(spark, table, Seq(tx("a", 1.0), tx("b", 2.0)).toDF(), 4) === 2)
    assert(BucketedLake.upsert(spark, table, Seq(tx("a", 9.0), tx("c", 3.0)).toDF(), 4) === 3)

    val rows = spark.table(table).as[Transaction].collect()
    assert(rows.map(t => t.description -> t.amount).toMap === Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("merge anti-join does NOT shuffle the bucketed lake side (forced SMJ path)") {
    // With a broadcastable batch Catalyst picks a broadcast anti-join and
    // the lake never shuffles regardless — bucketing pays off when the
    // batch EXCEEDS broadcast size, where a plain lake would sort+shuffle
    // 100 TB. Force that planning regime and assert the bucketed layout
    // removes the lake-side Exchange.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec

    val table = "graft_bucketed_plan_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    BucketedLake.create(spark, table, Seq(tx("a", 1.0), tx("b", 2.0)).toDF(), buckets)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val plan = BucketedLake.mergePlan(spark, table, Seq(tx("a", 5.0)).toDF())
        .queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge anti-join:\n$plan")
      def shuffles(p: SparkPlan): Int =
        p.collect { case e: ShuffleExchangeLike => e }.size
      assert(shuffles(smj.get.left) === 0,
        s"bucketed lake side must not shuffle:\n${smj.get.left}")
      assert(shuffles(smj.get.right) === 1,
        s"incoming side shuffles exactly once:\n${smj.get.right}")
      assert(plan.toString.contains("Bucketed: true"),
        s"lake scan should read bucket-aligned:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
