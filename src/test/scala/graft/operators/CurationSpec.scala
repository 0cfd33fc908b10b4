package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dataset-curation operators: deterministic sampling, stratified sampling,
  * split assignment, PII redaction, repetition stats.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 400L)
    .map(i => (i, s"w${i % 7} w${i % 7} w${i % 3} tail$i", if (i % 4 == 0) "de" else "en"))
    .toDF("doc_id", "text", "lang")

  test("deterministicSample: stable membership, fraction approximately honored") {
    val a = Curation.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // no RNG state: same sample on every run
    assert(a.size > 400 * 0.15 && a.size < 400 * 0.35)
    // monotone: a smaller fraction draws a SUBSET (hash thresholds nest),
    // so growing a sample never re-deals previously selected rows
    val small = Curation.deterministicSample(docs, "doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("stratifiedSample: exactly k per stratum (or the whole stratum), ranks dense") {
    val s = Curation.stratifiedSample(docs, "lang", "doc_id", 20)
    val sizes = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("de" -> 20L, "en" -> 20L))
    val ranks = s.filter(col("lang") === "de")
      .select("__rank").as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 20))
    // tiny stratum: returns every row instead of failing to fill k
    val tiny = Curation.stratifiedSample(docs.limit(3), "lang", "doc_id", 20)
    assert(tiny.count() == 3)
  }

  test("splitAssign: disjoint, exhaustive, leakage-safe under corpus growth") {
    val assigned = docs.withColumn("split",
      Curation.splitAssign(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 400)
    assert(counts("train") > 250) // ~80%
    // a doc's split is a pure function of its key: growing the corpus
    // can't move existing docs between splits
    val sub = docs.filter(col("doc_id") < 100).withColumn("split",
      Curation.splitAssign(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val full = assigned.filter(col("doc_id") < 100)
    assert(rowsOf(sub, "doc_id", "split") == rowsOf(full, "doc_id", "split"))
  }

  test("redactPii: emails, phones, ids replaced; order prevents partial eats") {
    val r = Seq(
      "mail bob.smith+x@mail.example.org now",
      "call +1 (555) 010-4242 or +44 (020) 555-1234",
      "ssn 123-45-6789 ok",
      "no pii here 12345").toDF("t")
      .select(Curation.redactPii(col("t")).as("r")).as[String].collect()
    assert(r(0) == "mail <EMAIL> now")
    assert(r(1) == "call <PHONE> or <PHONE>")
    assert(r(2) == "ssn <ID> ok")
    assert(r(3) == "no pii here 12345")
  }

  test("tokenRepetitionStats: counts and shares exact on a known doc") {
    val one = Seq((1L, "x x x y z")).toDF("doc_id", "text")
    val r = Curation.tokenRepetitionStats(one, "doc_id", "text").head()
    assert(r.getAs[Long]("top_token_count") == 3L)
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Double]("top_token_share") == 0.6)
    assert(r.getAs[Double]("dup_token_fraction") == 1.0 - 3.0 / 5.0)
  }

  test("kmvDistinct: exact below k, within KMV error above k") {
    // 5 groups × 40 distinct values, k=64 > 40 → exact
    val small = (0 until 400).map(i => (i % 5, i % 200)).toDF("g", "v")
    val exactSmall = Sketches.kmvDistinct(small, Seq("g"), "v", 64)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(exactSmall.values.forall(_ == 40.0))

    // one group, 20k distinct values, k=256 → estimate within ~5 std errors
    // (se ≈ 1/√(k−2) ≈ 6.3%)
    val big = (0 until 20000).map(i => (0, i)).toDF("g", "v")
    val est = Sketches.kmvDistinct(big, Seq("g"), "v", 256).head().getDouble(1)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.31, s"estimate $est")
  }

  test("bpeTokenCount splits numbers and punctuation off words") {
    import graft.functions.TextFunctions
    val r = Seq("Call me at 5pm, ok?").toDF("t")
      .select(TextFunctions.bpeTokenCount(col("t"))).head().getLong(0)
    // "Call"," me"," at"," 5","pm",","," ok","?" → 8
    assert(r == 8L)
  }
}
