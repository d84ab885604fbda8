package graft.xscale

import org.apache.spark.sql.{Column, DataFrame, graftnative}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.query.Q
import graft.query.Registry.table

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim): brute-force cosine top-k as the exactness
  * baseline, and a random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Scale posture (100 TB): the query side is tiny and broadcast, so the
  * brute-force plan is a broadcast nested-loop whose cost is one scan of the
  * corpus per batch of queries — embarrassingly parallel but O(n·q). The LSH
  * variant buckets BOTH sides by a per-row signature (zero shuffle to
  * compute), then joins on the bucket key — shuffle keyed on bucket,
  * candidates only. Hyperplane components are md5-derived integer constants
  * computed once on the driver and inlined as literals into both the Spark
  * plan and the DuckDB oracle, so both engines see bit-identical planes.
  */
object Similarity {

  /** Number of random hyperplanes → 2^NP buckets. */
  val NP = 4

  /** Deterministic pseudo-random hyperplanes: component (j,d) =
    * h60("plane{j}_{d}") mod 2001 - 1000 ∈ [-1000, 1000].
    */
  val planes: Seq[Seq[Long]] =
    (0 until NP).map(j => (0 until 64).map(d => XHash.h60(s"plane${j}_$d") % 2001 - 1000))

  /** embeddings → (vec_id, v: array<double>, nrm). */
  def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Native codegen dot product — same left-fold float semantics as
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` but a primitive loop.
    */
  def dot(a: Column, b: Column): Column = graftnative.api.dot(a, b)

  /** LSH bucket id: bit j set iff v · plane_j > 0. Pure per-row expression. */
  def bucket(v: Column): Column =
    (0 until NP).map { j =>
      val plane = array(planes(j).map(x => lit(x.toDouble)): _*)
      when(dot(v, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def planeSql(j: Int): String =
    s"([${planes(j).mkString(", ")}]::DOUBLE[])"

  private val bucketSql: String =
    (0 until NP).map { j =>
      s"(CASE WHEN list_aggregate(list_transform(generate_series(1, len(v)), " +
        s"i -> v[i] * ${planeSql(j)}[i]), 'sum') > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  private val normCtes =
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm FROM e)"

  private val cosSql =
    "list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]), 'sum') " +
      "/ (q.nrm * c.nrm)"

  val queries: Seq[Q] = Seq(
    // ----- x06: brute-force cosine top-k (exact baseline) -----
    Q(
      "x06_knn_brute",
      Some(
        s"WITH $normCtes, " +
          "s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
          s"$cosSql AS cos FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id), " +
          "r AS (SELECT query_id, neighbor_id, " +
          "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s) " +
          "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 3 " +
          "ORDER BY query_id, rank"),
      "exact top-3 by cosine for 10 query vectors: query side broadcast, one corpus scan, " +
        "per-partition top-k then a |q|*k-row final sort"
    ) { (s, dir) =>
      val e = withNorm(table(s, dir, "embeddings"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(q)
        .join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },

    // ----- x07: LSH-bucketed ANN (the scale path) -----
    Q(
      "x07_knn_lsh",
      Some(
        s"WITH $normCtes, " +
          s"bkt AS (SELECT vec_id, v, nrm, $bucketSql AS bucket FROM n), " +
          "s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
          "list_aggregate(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]), 'sum') " +
          "/ (q.nrm * c.nrm) AS cos " +
          "FROM bkt q JOIN bkt c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id WHERE q.vec_id < 10), " +
          "r AS (SELECT query_id, neighbor_id, " +
          "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s) " +
          "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 3 " +
          "ORDER BY query_id, rank"),
      "random-hyperplane LSH: per-row bucket signature (no shuffle), join keyed on bucket — " +
        "candidates only, never O(n^2); approximate recall vs x06"
    ) { (s, dir) =>
      val e = withNorm(table(s, dir, "embeddings")).withColumn("bucket", bucket(col("v")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"), col("bucket"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }
  )
}
