package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def tf(rows: Seq[(String, String, Long)]) =
    rows.toDF("doc", "term", "w")

  test("identical vectors score 1; disjoint score nothing; ordering a < b") {
    val w = tf(Seq(
      ("d1", "x", 2L), ("d1", "y", 1L),
      ("d2", "x", 2L), ("d2", "y", 1L),
      ("d3", "z", 5L)))
    val out = SparseSimilarity.cosinePairs(w, "doc", "term", "w",
        minSim = 0.5, maxDf = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.length == 1)
    val (a, b, sim) = out.head
    assert(a == "d1" && b == "d2" && math.abs(sim - 1.0) < 1e-12)
  }

  test("the df cut drops common-term mass: stopword overlap alone scores 0") {
    // 'the' is in every doc (df 3 > maxDf 2); d1/d2 share ONLY 'the'
    val w = tf(Seq(
      ("d1", "the", 5L), ("d1", "alpha", 1L),
      ("d2", "the", 5L), ("d2", "beta", 1L),
      ("d3", "the", 1L), ("d3", "alpha", 1L)))
    val out = SparseSimilarity.cosinePairs(w, "doc", "term", "w",
        minSim = 0.01, maxDf = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(!out.contains(("d1", "d2"))) // stopword-only overlap excluded
    assert(out.contains(("d1", "d3"))) // rare-term overlap survives
  }

  test("score lower-bounds true cosine (norms keep the full vector)") {
    // d1/d2 share rare 'x' AND common 'the'; the cut drops 'the' from the
    // dot product but not the norms, so sim < true cosine and < 1
    val w = tf(Seq(
      ("d1", "the", 3L), ("d1", "x", 4L),
      ("d2", "the", 3L), ("d2", "x", 4L),
      ("d3", "the", 1L)))
    val sim = SparseSimilarity.cosinePairs(w, "doc", "term", "w",
        minSim = 0.0, maxDf = 2L)
      .filter(col("a") === "d1" && col("b") === "d2")
      .head().getDouble(2)
    val expected = (4.0 * 4.0) / (5.0 * 5.0) // shared rare mass / full norms
    assert(math.abs(sim - expected) < 1e-12)
  }
}
