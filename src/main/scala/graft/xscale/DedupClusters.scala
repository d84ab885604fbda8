package graft.xscale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The last step of a fuzzy-dedup pipeline: near-dup PAIRS (x02/x03/x04
  * output) → duplicate CLUSTERS → one representative per cluster. Pairs
  * alone over-remove (a~b and b~c should drop two docs, not four half-pairs)
  * — transitivity needs connected components.
  *
  * Implementation is label propagation as DataFrame algebra: every node
  * starts labeled with itself; each round takes the min label over the
  * neighborhood; converged when no label changes. Rounds needed = graph
  * diameter, and near-dup graphs are piles of small dense cliques, so 2-4
  * rounds in practice. Each round is one shuffle keyed on node id.
  * `localCheckpoint` cuts the per-iteration lineage so the plan doesn't
  * grow exponentially (the classic iterative-DataFrame trap).
  */
object DedupClusters {

  /** Connected components of an undirected pair list `(a, b)` →
    * `(id, component)` where component = min node id reachable.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // pairs are unique undirected edges (callers emit a<b), so the
    // symmetric union is already duplicate-free — no distinct shuffle
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node adopts min(own label, neighbors' labels); the old label
      // rides along into the one materialization so the convergence check
      // reads the checkpointed result instead of re-joining
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"))
        .agg(min("component").as("_neighbor_min"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("component"), coalesce(col("_neighbor_min"), col("component")))
            .as("component"),
          col("component").as("_old"))
        .localCheckpoint()
      converged = updated.filter(col("component") =!= col("_old")).isEmpty
      labels = updated.drop("_old")
      i += 1
    }
    // silent non-convergence would quietly under-dedup (a chain longer
    // than maxIter keeps >1 representative); fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "raise maxIter (rounds needed = largest component diameter)")
    labels
  }

  /** Keep one representative (min doc_id) per duplicate cluster: docs that
    * appear in no pair survive untouched; in each connected component only
    * the smallest doc_id survives. `docs` must carry `doc_id`.
    */
  def dedupByPairs(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, maxIter)
    val losers = comp.filter(col("id") =!= col("component")).select(col("id").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }
}
