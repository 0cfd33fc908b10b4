package graft

import graft.operators.{Similarity, TextDedup}
import graft.sources.Tables
import graft.tools.ScaleStress
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The scale harness's central claim is that the blowup scales WORK linearly
  * because the DATA's match structure scales linearly — near-dup pairs grow
  * N×, never N², and cross-copy rows can never match. That property is what
  * makes the SCALE.md ratios attributable to the plans; pin it at sf0.001.
  */
class ScaleStressSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val d = Files.createTempDirectory("graft-scale2x").toString
    ScaleStress.generate(spark, src, d, 2)
    d
  }

  test("every scaled fact table has exactly factor x rows, dims 1x") {
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      val n0 = Tables.load(spark, src, t).count()
      val n1 = Tables.load(spark, out, t).count()
      assert(n1 == 2 * n0, s"$t: $n0 -> $n1")
    }
    assert(Tables.load(spark, out, "customer").count() ==
           Tables.load(spark, src, "customer").count())
  }

  test("shifted copies keep the lineitem⋈orders join structure per copy") {
    val joined0 = Tables.load(spark, src, "lineitem")
      .join(Tables.load(spark, src, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    val joined1 = Tables.load(spark, out, "lineitem")
      .join(Tables.load(spark, out, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined1 == 2 * joined0, s"$joined0 -> $joined1")
  }

  test("MinHash near-dup pairs scale exactly Nx: zero cross-copy matches") {
    val pairs0 = TextDedup.minhashNearDupes(
      Tables.load(spark, src, "documents"), "doc_id", "text",
      n = 3, k = 8, bands = 4, minJaccard = 0.7).count()
    val pairs1 = TextDedup.minhashNearDupes(
      Tables.load(spark, out, "documents"), "doc_id", "text",
      n = 3, k = 8, bands = 4, minJaccard = 0.7).count()
    assert(pairs1 == 2 * pairs0, s"pairs $pairs0 -> $pairs1")
  }

  test("embedding rotation preserves the within-copy pair SET exactly") {
    // the signed rotation is orthogonal: copy 1's all-pairs near-dup result
    // (ids shifted back) must find the SAME pairs as copy 0, with cosines
    // equal to fp tolerance (dimension reorder permutes the float dot-product
    // summation → last-ulp drift) — per-copy dedup work replicates N times
    val e = Tables.load(spark, out, "embeddings")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding", minSim = 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val copy0 = pairsOf(e.filter(col("vec_id") < 10_000_000L))
    val copy1 = pairsOf(e.filter(col("vec_id") >= 10_000_000L)
      .withColumn("vec_id", col("vec_id") - 10_000_000L))
    assert(copy0.nonEmpty, "fixture has no near-dup pairs to scale")
    assert(copy0.keySet == copy1.keySet,
      s"pair sets differ: ${copy0.keySet diff copy1.keySet} / ${copy1.keySet diff copy0.keySet}")
    copy0.foreach { case (k, c0) =>
      assert(math.abs(c0 - copy1(k)) < 1e-9, s"pair $k cosine drifted: $c0 vs ${copy1(k)}")
    }
  }

  test("cross-copy cosines stay at the random floor: no structure leaks") {
    // the base data's own random-pair tail tops out at ~0.48 (sf0.001) /
    // 0.60 (sf0.1); the transform must not create cross-copy pairs ABOVE
    // that intrinsic floor — a naive repeat would put mass at cosine 1.0
    val e = Tables.load(spark, out, "embeddings")
    val a = e.filter(col("vec_id") < 10_000_000L)
      .select(col("vec_id").as("a_id"), col("embedding").as("__va"))
    val b = e.filter(col("vec_id") >= 10_000_000L)
      .select(col("vec_id").as("b_id"), col("embedding").as("__vb"))
    val maxCross = a.crossJoin(b)
      .select(graft.functions.VectorFunctions.cosineFast(
        col("__va"), col("__vb")).as("c"))
      .agg(max("c")).head.getDouble(0)
    assert(maxCross < 0.65, f"cross-copy structure leaked: max cos $maxCross%.3f")
  }
}
