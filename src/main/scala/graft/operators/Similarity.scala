package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (extension
  * scope). Baseline: brute-force cosine top-k — a broadcast of the query
  * vector against a full scan, `TakeOrderedAndProject` physical top-k, no
  * shuffle of the corpus. Scale path: random-hyperplane LSH — bucket the
  * corpus once (embarrassingly parallel map), then search only the query's
  * bucket; at 100 TB the bucketed corpus would be written out partitioned by
  * bucket so a query prunes to one partition.
  */
object Similarity {

  /** Brute-force cosine top-k against the row `idCol == queryId`.
    * Deterministic tie-break on id.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId).select(col(vecCol).as("__q"))
    emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosineFast(col(vecCol), col("__q")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (LCG over the flat index) — no
    * RNG state, reproducible across runs/engines.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val x = (1103515245L * (p * dim + j) + 12345L) % 1048576L
        x.toDouble / 1048576.0 - 0.5
      }
    }

  /** Sign-of-dot-product bucket id over nPlanes hyperplanes. */
  def lshBucket(vecCol: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(dot(vecCol, typedLit(plane)) >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: exact cosine ranking restricted to the query's bucket.
    * Recall < 1 by construction; nPlanes trades recall vs candidate count.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = emb.withColumn("__bucket", lshBucket(col(vecCol), planes))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__q"), col("__bucket").as("__qb"))
    bucketed.crossJoin(broadcast(q))
      .filter(col("__bucket") === col("__qb") && col(idCol) =!= queryId)
      .select(col(idCol), cosineFast(col(vecCol), col("__q")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs near-duplicate detection by embedding cosine (extension:
    * embedding-cosine near-dup). Quadratic — the oracle-checkable baseline;
    * at scale, bucket with [[lshBucket]] first and compare within buckets.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         minSim: Double): DataFrame = {
    // O(n²) cosine work streams over the left side — rebalance it so the
    // nested-loop join runs on every core, not one scan partition
    val a = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("a_id"), col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("b_id"), col(vecCol).as("__vb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosineFast(col("__va"), col("__vb")).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
  }
}
