package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse-vector cosine similarity join over (doc, term, weight) rows —
  * the inverted-index formulation of document similarity (Bayardo, Ma &
  * Srikant, WWW 2007): two documents' dot product decomposes over their
  * SHARED terms only, so ONE term-keyed equi-join + a map-side-combined
  * sum computes every pair's score without densifying anything.
  *
  * The df cut: terms appearing in more than `maxDf` documents are excluded
  * from the DOT PRODUCT (norms keep the full vector). The reported score is
  * therefore a LOWER BOUND on true cosine that ignores common-term mass —
  * exactly the direction near-dup detection wants (stopword overlap must
  * not make two documents similar), and the term-join fan-out is bounded by
  * maxDf² per term instead of the hottest term's df².
  *
  * 100 TB posture: normalization is two doc-keyed aggregates; the term join
  * shuffles on term with bounded per-key fan-out; pair scores partial-
  * aggregate map-side; the df census is vocabulary-sized and broadcast.
  */
object SparseSimilarity {

  /** Pairs (a, b, cos_sim) with maxDf-filtered cosine ≥ `minSim`, a < b.
    * `weights` carries one row per (doc, term) with a positive weight
    * (e.g. the term's in-doc frequency).
    */
  def cosinePairs(weights: DataFrame, docCol: String, termCol: String,
                  wCol: String, minSim: Double, maxDf: Long): DataFrame = {
    val w = weights.select(col(docCol).as("__d"), col(termCol).as("__t"),
      col(wCol).cast("double").as("__w"))
    val norms = w.groupBy(col("__d"))
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__nrm"))
    val nw = w.join(norms, "__d")
      .select(col("__d"), col("__t"), (col("__w") / col("__nrm")).as("__nw"))
    val rare = nw.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select(col("__t"))
    val kept = nw.join(broadcast(rare), Seq("__t"))
    kept.select(col("__t"), col("__d").as("a"), col("__nw").as("__wa"))
      .join(kept.select(col("__t"), col("__d").as("b"), col("__nw").as("__wb")),
        "__t")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("__wa") * col("__wb")).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
  }
}
