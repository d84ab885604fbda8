package graft.xscale

import graft.query.Q

/** North-star training-data-pipeline operators (BASELINE.json): dedup
  * (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  * similarity search (brute-force + LSH-bucketed ANN), text analysis
  * (language-ID, quality scoring, token counting, fingerprinting) and
  * multimodal binary-column plumbing — all over the driver `documents`
  * and `embeddings` tables.
  */
object XScaleQueries {
  val all: Seq[Q] =
    Dedup.queries ++ IncrementalDedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ DataPrep.queries ++ Multimodal.queries ++
      PerceptualDedup.queries
}
