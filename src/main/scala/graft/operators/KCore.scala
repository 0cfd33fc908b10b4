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
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    val e0 = edges.select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var und = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val alive = und.groupBy(col("u")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("u").as("node"))
      val next = und
        .join(alive, und("u") === alive("node"), "left_semi")
        .join(alive, und("v") === alive("node"), "left_semi")
        .localCheckpoint()
      Checkpoints.release(und) // superseded round's edge set
      und = next
    }
    und.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
  }
}
