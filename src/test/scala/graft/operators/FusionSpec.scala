package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: RRF arithmetic pinned by hand, batch exact kNN
  * pinned against its single-query form.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("rrf: hand-computed fusion of two rankings, missing-rank semantics") {
    // q1: doc 10 is rank 1 in both; doc 20 only sparse r2; doc 30 only
    // dense r2; doc 40 sparse r3 + dense r3
    val sparse = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 40L, 3))
      .toDF("q_id", "doc_id", "rank")
    val dense = Seq((1L, 10L, 1), (1L, 30L, 2), (1L, 40L, 3))
      .toDF("q_id", "doc_id", "rank")
    val out = Fusion.rrf(Seq(sparse, dense), "q_id", "doc_id", "rank", k = 10)
      .orderBy($"rank")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    val r61 = 1.0 / 61
    val r62 = 1.0 / 62
    val r63 = 1.0 / 63
    assert(out.length == 4)
    assert(out(0) == ((10L, r61 + r61, 2L, 1))) // both rank-1
    assert(out(1) == ((40L, r63 + r63, 2L, 2))) // both rank-3 beats one rank-2
    assert(out(2) == ((20L, r62, 1L, 3)))       // single-ranking contribution
    assert(out(3) == ((30L, r62, 1L, 4)))       // tie with 20 → lower id first
  }

  test("rrf: ties on fused score break toward the lower doc id, k bounds output") {
    val a = Seq((1L, 5L, 1), (1L, 3L, 2), (1L, 9L, 3)).toDF("q_id", "doc_id", "rank")
    val out = Fusion.rrf(Seq(a), "q_id", "doc_id", "rank", k = 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out.sortBy(_._2) == Seq((5L, 1), (3L, 2))) // k=2 clips rank 3
  }

  test("bruteForceTopKBatch == per-query bruteForceTopK for every batch member") {
    val e = Tables.load(spark, dir, "embeddings")
    val batch = Similarity.bruteForceTopKBatch(e, "vec_id", "embedding",
      e.filter($"vec_id" % 100 === 0), "vec_id", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    assert(batch.nonEmpty)
    val qids = batch.keys.map(_._1).toSeq.distinct.sorted
    qids.foreach { qid =>
      val single = Similarity.bruteForceTopK(e, "vec_id", "embedding", qid, 5)
        .collect().zipWithIndex
        .map { case (r, i) => r.getLong(0) -> (r.getDouble(1), i + 1) }.toMap
      val mine = batch.collect { case ((q, d), v) if q == qid => d -> v }
      assert(mine == single, s"q$qid batch/single divergence")
    }
  }
}
