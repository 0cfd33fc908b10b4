package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling (Seidman 1983): repeatedly delete nodes of degree < k;
  * what survives is the graph's dense backbone — the link-graph audit that
  * separates hub structure from stragglers before community or influence
  * passes.
  *
  * Per round: ONE degree aggregate (map-side combined) + two semi-joins
  * that keep only edges whose BOTH endpoints survive. Fixed round count —
  * each round peels at least the current sub-threshold layer, and the
  * oracle replays rounds exactly; run to fixpoint by raising `rounds`
  * (the peel is monotone: once stable, further rounds are no-ops).
  *
  * 100 TB posture: every stage keys on node id (edge list pre-partitioned
  * by endpoint → co-located joins); driver state is the round counter;
  * lineage truncated per round like [[PageRank]].
  */
object KCore {

  /** (node, deg) for nodes still standing after `rounds` peels at
    * threshold `k`; `deg` is the surviving-subgraph degree.
    *
    * ADAPTIVE CONVERGENCE: the peel only ever REMOVES edges, so an
    * unchanged edge COUNT between rounds proves the edge SET is stable and
    * every further round a no-op — the loop exits as soon as the count
    * (one long off an already-checkpointed frame, no extra join) stops
    * falling. Fixed-round oracle replays are unaffected (identical
    * output), and an over-provisioned `rounds` on a stable core stops
    * paying per-round degree shuffles (spec'd). Pass `adaptive = false`
    * to force exactly `rounds` iterations.
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int, adaptive: Boolean = true): DataFrame =
    peelWithStats(edges, srcCol, dstCol, k, rounds, adaptive)._1

  /** [[peel]] plus the number of rounds actually executed. */
  def peelWithStats(edges: DataFrame, srcCol: String, dstCol: String,
                    k: Int, rounds: Int,
                    adaptive: Boolean = true): (DataFrame, Int) = {
    val e0 = edges.select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var und = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var prevEdges = -1L
    var executed = 0
    var converged = false
    for (r <- 1 to rounds if !converged) {
      val alive = und.groupBy(col("u")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("u").as("node"))
      val next = und
        .join(alive, und("u") === alive("node"), "left_semi")
        .join(alive, und("v") === alive("node"), "left_semi")
        .localCheckpoint()
      if (adaptive && r < rounds) {
        val cur = next.count() // a count over the fresh checkpoint: cheap
        converged = cur == prevEdges
        prevEdges = cur
      }
      Checkpoints.release(und) // superseded round's edge set
      und = next
      executed = r
    }
    (und.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg")), executed)
  }
}
