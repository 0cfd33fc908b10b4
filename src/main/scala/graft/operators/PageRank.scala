package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration (Page, Brin, Motwani & Winograd 1999) over an
  * undirected edge list — the iterative-graph-analytics complement to
  * [[Dedup.connectedComponents]]'s HashMin: importance scores for entity
  * graphs (supplier↔part, doc↔doc citation/near-dup graphs) that feed
  * curation weighting and sampling.
  *
  * Spark shape, mirroring the CC operator's discipline:
  *   - each round is ONE contribution join (rank/degree shipped along edges)
  *     plus ONE map-side-combined sum per destination — no per-vertex
  *     driver state, no collect of anything graph-sized;
  *   - `localCheckpoint` between rounds truncates lineage, so `rounds`
  *     iterations cost `rounds` shuffles, not an exponentially deep plan;
  *   - undirected expansion (each edge contributes both ways) means every
  *     node in the edge list has degree ≥ 1 — no dangling-mass term to
  *     redistribute (the variant that needs it is documented, not hidden);
  *   - driver state: the node COUNT (one long, for the teleport constant).
  *
  * Determinism: contributions are IEEE doubles summed under a commutative
  * aggregate; reassociation differences are ~1 ulp per fan-in and invisible
  * at the oracle's 9-significant-digit compare.
  */
object PageRank {

  /** Ranks after `rounds` power iterations with damping `d`
    * (teleport `(1−d)/N`, init `1/N`). Returns (node, pr).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               rounds: Int, d: Double = 0.85): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .unionByName(edges.select(col(dstCol).cast("long").as("u"),
        col(srcCol).cast("long").as("v")))
      .distinct()
      .localCheckpoint(true) // reused every round — cut it loose from the scan
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val n = deg.count() // driver state: ONE long (the teleport denominator)
    val base = (1.0 - d) / n
    var ranks = deg.select(col("u").as("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to rounds) {
      val contribs = und
        .join(ranks, und("u") === ranks("node"))
        .join(deg, "u")
        .select(col("v").as("node"), (col("pr") / col("deg")).as("c"))
      val next = contribs.groupBy("node")
        .agg((lit(base) + lit(d) * sum(col("c"))).as("pr"))
        .localCheckpoint(true)
      Checkpoints.release(ranks) // superseded round's blocks (no-op on round 1)
      ranks = next
    }
    // rounds == 0 returns the lazy init projection OVER deg — releasing
    // deg's blocks would truncate lineage the result still needs ("block
    // not found" at materialization). Only once a round has run is ranks
    // an independent eager checkpoint, making und/deg safely superseded.
    if (rounds >= 1) {
      Checkpoints.release(und)
      Checkpoints.release(deg)
    } else {
      Checkpoints.release(und) // never referenced by the init projection
    }
    ranks
  }
}
