package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MIPS (maximum inner product) search: exact baseline vs a hand dot
  * product, the divergence from cosine order that makes MIPS its own
  * operator, and the norm-augmentation multi-table LSH reduction —
  * exactness of reranked scores plus its measured (deterministic) recall.
  *
  * The stored embeddings are unit vectors, on which MIPS ≡ cosine — every
  * case here first un-normalizes with the deterministic 1+id%5 scaling the
  * declared q185 uses.
  */
class SimilarityMipsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def scaled: DataFrame =
    Tables.load(spark, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"),
        x => x.cast("double") * (lit(1.0) + (col("vec_id") % 5).cast("double")))
        .as("embedding"))

  private def dotHand(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  test("brute-force MIPS top-k equals a driver-side exact ranking") {
    val emb = scaled
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Double])]
      .collect().toMap
    val q = vecs(1L)
    val want = vecs.toSeq.filter(_._1 != 1L)
      .map { case (id, v) => (id, dotHand(v, q)) }
      .sortBy { case (id, ip) => (-ip, id) }.take(10)
    val got = Similarity.mipsTopK(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9) }
  }

  test("MIPS order differs from cosine order once norms vary") {
    val emb = scaled
    val ipTop = Similarity.mipsTopK(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSeq
    // generic (type-agnostic) cosine: bruteForceTopK's codegen'd fast path
    // is float-array-only and the scaled frame is double
    val q = emb.filter($"vec_id" === 1L).select($"embedding".as("__q"))
    val cosTop = emb.crossJoin(broadcast(q)).filter($"vec_id" =!= 1L)
      .select($"vec_id",
        graft.functions.VectorFunctions.cosine($"embedding", $"__q").as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(ipTop !== cosTop)
    // and on the UNIT vectors the two orders agree — the scaling, not the
    // operator, is what separates them (guards the premise of this spec)
    val unit = Tables.load(spark, dir, "embeddings")
    val ipU = Similarity.mipsTopK(unit, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSeq
    val cosU = Similarity.bruteForceTopK(unit, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ipU === cosU)
  }

  test("norm-augmented multi-table LSH: exact reranked scores, recall grows with tables") {
    val emb = scaled
    val exact = Similarity.mipsTopK(emb, "vec_id", "embedding", 1L, 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactTop = Similarity.mipsTopK(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSet

    def recallAt(nTables: Int): Int = {
      val lsh = Similarity.mipsLshTopK(emb, "vec_id", "embedding", 1L, 10,
        nPlanes = 4, dim = 64, nTables = nTables).collect()
      // every returned inner product is the EXACT one (rerank is exact)
      lsh.foreach { r =>
        assert(math.abs(exact(r.getLong(0)) - r.getDouble(1)) < 1e-9) }
      val ips = lsh.map(_.getDouble(1))
      assert(ips.zip(ips.tail).forall { case (a, b) => a >= b })
      lsh.map(_.getLong(0)).count(exactTop)
    }
    // deterministic planes ⇒ deterministic recall; the single-table number
    // is honest-and-low (the pad coordinate dilutes angular locality —
    // the documented reason mipsLshTopK grows tables, not planes)
    val r1 = recallAt(1)
    val r16 = recallAt(16)
    assert(r16 > r1, s"multi-table recall $r16 not above single-table $r1")
    assert(r16 >= 4, s"recall@10 at 16 tables collapsed: $r16/10")
  }

  test("norm-ranged pads: band-local augmentation, exact rerank, >= global-pad recall") {
    val emb = scaled
    val exact = Similarity.mipsTopK(emb, "vec_id", "embedding", 1L, 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactTop = Similarity.mipsTopK(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSet
    val ranged = Similarity.mipsNormRangedTopK(emb, "vec_id", "embedding",
      1L, 10, nPlanes = 3, dim = 64, nBands = 5).collect()
    ranged.foreach { r =>
      assert(math.abs(exact(r.getLong(0)) - r.getDouble(1)) < 1e-9) }
    val rangedHits = ranged.map(_.getLong(0)).count(exactTop)
    // deterministic on this data: 4/10 from a 1-table, 3-plane probe
    assert(rangedHits >= 3, s"norm-ranged recall collapsed: $rangedHits/10")
    // the GLOBAL pad at the same plane budget does no better — banding is
    // what restores angular locality for small-norm vectors
    val globalHits = Similarity.mipsLshTopK(emb, "vec_id", "embedding",
      1L, 10, nPlanes = 3, dim = 64, nTables = 1)
      .collect().map(_.getLong(0)).count(exactTop)
    assert(rangedHits >= globalHits,
      s"banding lost to the global pad: $rangedHits < $globalHits")
  }

  test("pad arithmetic: augmented norms are constant at the corpus max") {
    import graft.functions.VectorFunctions.dot
    val emb = scaled
    val m2 = emb.agg(max(dot(col("embedding"), col("embedding")))).head.getDouble(0)
    val pad2 = emb.select(
      (dot(col("embedding"), col("embedding")) +
        greatest(lit(m2) - dot(col("embedding"), col("embedding")), lit(0.0)))
        .as("n2"))
      .collect().map(_.getDouble(0))
    pad2.foreach(n2 => assert(math.abs(n2 - m2) < 1e-9 * m2))
  }

  test("batched norm-ranged MIPS equals the single-query probe for every query") {
    val emb = scaled
    val queries = emb.filter(col("vec_id") % 7 === 0)
    val batch = Similarity.mipsNormRangedTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", k = 5, nPlanes = 3, dim = 64, nBands = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq }
    val qids = queries.select("vec_id").collect().map(_.getLong(0))
    assert(qids.nonEmpty && batch.keySet.subsetOf(qids.toSet))
    qids.foreach { qid =>
      val single = Similarity.mipsNormRangedTopK(emb, "vec_id", "embedding",
        qid, k = 5, nPlanes = 3, dim = 64, nBands = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single,
        s"batch != single for query $qid")
    }
  }

  test("nPlanes is bounded to the Long bucket signature (1..64)") {
    val emb = scaled
    intercept[IllegalArgumentException] {
      Similarity.mipsLshTopK(emb, "vec_id", "embedding", 1L, 5,
        nPlanes = 65, dim = 64)
    }
    intercept[IllegalArgumentException] {
      Similarity.mipsNormRangedTopK(emb, "vec_id", "embedding", 1L, 5,
        nPlanes = 0, dim = 64, nBands = 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshBucket(col("embedding"),
        Similarity.hyperplanes(65, 4).map(_.toSeq))
    }
  }
}
