package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A shuffle join hash-partitions by key, so one hot key (a viral user_id, a
  * default account, an empty-string placeholder) lands on ONE reducer and
  * the stage runs at the speed of that straggler. Salting splits each hot
  * key's rows across `salts` sub-partitions: the big side gets a
  * deterministic salt in [0, salts), the small side is exploded `salts`
  * times so every (key, salt) pair still finds its match.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) solves the same problem post-hoc by splitting oversized
  * partitions at runtime — prefer it when it fires; explicit salting is for
  * plans AQE can't rewrite (e.g. aggregations over a hot key feeding a
  * join, or sort-merge joins whose skew appears after filters AQE can't
  * see through).
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, salted `salts` ways. Result is
    * row-identical to `big.join(small, key)` — only the partitioning
    * changes. The salt is derived from a hash of the big side's whole row
    * (deterministic, uniform), never `rand()` (which breaks retry/replay
    * determinism of failed tasks).
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    requireNoSaltColumn(big); requireNoSaltColumn(small)
    val saltCol: Column =
      pmod(hash(struct(big.columns.toSeq.map(col): _*)), lit(salts))
    val bigSalted = big.withColumn("_salt", saltCol)
    val smallExploded = small.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    bigSalted
      .join(smallExploded, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Skewed groupBy-count: two-phase aggregation through a salted key.
    * Phase 1 aggregates (key, salt) partials — the hot key's rows split
    * across `salts` reducers — phase 2 merges the `salts` partials per key.
    * Result is identical to `df.groupBy(key).count()`; Spark's map-side
    * partial aggregation usually makes this unnecessary, but it's the
    * pattern for aggregates with large per-key state (collect_set,
    * percentile sketches) where partial-merge alone can't bound a reducer.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    requireNoSaltColumn(df)
    df.withColumn("_salt", pmod(hash(struct(df.columns.toSeq.map(col): _*)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("count"))
  }

  // withColumn would silently REPLACE a caller's _salt column and the final
  // drop would eat their data, breaking the row-identity guarantee above —
  // refuse loudly instead.
  private def requireNoSaltColumn(df: DataFrame): Unit =
    require(
      !df.columns.contains("_salt"),
      "input already has a _salt column; rename it before salting")
}
