package graft

import org.apache.spark.sql.graftnative.DotProductZip
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: SQL-callable native functions and
  * the FuseDotProduct optimizer rule — including the null/length corner
  * cases the fused expression must reproduce exactly.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val dotIdiom =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  test("native functions are callable from SQL") {
    val d = spark.sql("SELECT graft_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .as[Double].head()
    assert(d === 32.0)
    val sh = spark.sql("SELECT graft_shingle_hash60('one two three four', 3) AS h")
      .selectExpr("size(h)").as[Int].head()
    assert(sh === 2)
    val keep = spark.sql("SELECT graft_gopher_metrics('the a of and').keep AS k")
      .as[Boolean].head()
    assert(!keep) // 4 words < 15 fails r_words
    val rep = spark.sql("SELECT graft_repetition_metrics('x x x x x x x') AS m")
      .selectExpr("m.totc", "m.cov5").as[(Long, Long)].head()
    assert(rep == ((7L, 7L))) // dup 5-grams cover all 7 chars
    val nw = spark.sql("SELECT size(graft_window_hash60('a b c d', 2)) AS n")
      .as[Int].head()
    assert(nw === 3)
    val bg = spark.sql("SELECT size(graft_bigram_hash60('a b c')) AS n").as[Int].head()
    assert(bg === 2)
  }

  /** Round-trip through parquet so ConvertToLocalRelation can't constant-
    * fold the whole query away before the plan assertion looks at it.
    */
  private def viaParquet(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = tmpDir("graft-ext").getPath + "/t.parquet"
    df.write.mode("overwrite").parquet(d)
    spark.read.parquet(d)
  }

  test("FuseDotProduct rewrites the aggregate(zip_with) idiom") {
    val df = viaParquet(Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b"))
      .selectExpr(s"$dotIdiom AS d")
    val fused = df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductZip]))
    assert(fused, df.queryExecution.optimizedPlan.treeString)
    assert(df.as[Double].head() === 11.0)
  }

  test("fused semantics match the interpreted idiom on null/length corners") {
    val rows = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)), // plain
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)), // null elem
      (Array[java.lang.Double](1.0, 2.0, 5.0), Array[java.lang.Double](3.0, 4.0)), // longer a
      (Array[java.lang.Double](), Array[java.lang.Double]()), // both empty
      (Array[java.lang.Double](1.0), Array[java.lang.Double]()) // one empty
    )
    val df = viaParquet(rows.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")).orderBy("i").selectExpr(s"$dotIdiom AS d")
    // the optimizer must have fused (same assertions as above)...
    assert(df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductZip])))
    // ...and the values must equal a driver-side evaluation of the
    // ORIGINAL semantics: null-padded zip, null-propagating * and +
    val expected = rows.map { case (a, b) =>
      val n = math.max(a.length, b.length)
      (0 until n).foldLeft(Option(0.0)) { (acc, i) =>
        for {
          s <- acc
          x <- if (i < a.length) Option(a(i)).map(_.doubleValue) else None
          y <- if (i < b.length) Option(b(i)).map(_.doubleValue) else None
        } yield s + x * y
      }
    }
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === expected)
  }

  test("a non-matching shape is left alone") {
    // merge lambda subtracts instead of adds — must NOT fuse
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc - v) AS d")
    assert(!df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductZip])))
    assert(df.as[Double].head() === -11.0)
  }
}
