package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval (extension scope): combine several
  * per-query rankings of the same corpus — sparse BM25
  * ([[InvertedIndex.bm25JoinTopK]]), dense kNN
  * ([[Similarity.bruteForceTopKBatch]] / the [[graft.sources.AnnStore]]
  * probes) — into one list per query. Reciprocal-rank fusion (Cormack,
  * Clarke & Büttcher, SIGIR 2009) needs only the RANKS, never the
  * incomparable raw scores, which is what makes it the default fusion in
  * hybrid search engines.
  *
  * Spark shape: one union of the (already top-k-bounded) ranking frames,
  * one aggregation keyed (query, doc), one rank window whose `rank <= k`
  * filter compiles to WindowGroupLimit. Nothing corpus-sized moves: each
  * input carries ≤ k·queries rows by construction, so the whole fusion is
  * O(queries · k · rankings) regardless of corpus size — the 100 TB cost
  * lives entirely in the upstream retrieval legs.
  *
  * Determinism: each contribution `1/(c + rank)` is one IEEE division of
  * exact integers — identical in every engine; with two rankings the
  * per-(query, doc) sum is a single commutative addition, so fused scores
  * are bit-identical across engines and partitionings (oracle-checked).
  * Three or more rankings reassociate under the distributed sum —
  * ulp-level, like every multi-term float aggregate in this library.
  */
object Fusion {

  /** Fused top-k per query: score(q, d) = Σ over rankings of
    * `1 / (c + rank)`, ties broken toward the lower doc id. Inputs carry
    * `(qCol, docCol, rankCol)` with 1-based ranks (extra columns are
    * dropped); a doc absent from a ranking simply contributes nothing —
    * RRF's native missing-rank semantics. Returns
    * (qCol, docCol, rrf_score, n_rankings, rank).
    */
  def rrf(rankings: Seq[DataFrame], qCol: String, docCol: String,
          rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(c >= 0, s"rrf smoothing constant must be non-negative, got $c")
    val contribs = rankings.map(_.select(col(qCol), col(docCol),
      (lit(1.0) / (lit(c.toDouble) + col(rankCol).cast("double")))
        .as("__contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(qCol), col(docCol))
      .agg(sum(col("__contrib")).as("rrf_score"),
        count(lit(1)).as("n_rankings"))
    val w = Window.partitionBy(col(qCol))
      .orderBy(col("rrf_score").desc, col(docCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
