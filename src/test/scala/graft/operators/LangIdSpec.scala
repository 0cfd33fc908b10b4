package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CCNet stage 1 — the char-trigram profile classifier ([[LangId]]) and the
  * full in-engine CCNet chain: language-ID → line-level dedup (q247's
  * [[TextDedup.dropDuplicatedLines]]) → perplexity buckets (q250's
  * [[LanguageModel.ccnetBuckets]]), Wenzek et al. 2020's pipeline order.
  */
class LangIdSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  // distinct trigram worlds per language; several docs each, varied by a
  // deterministic rotation so train/test docs differ textually
  private val enWords = Seq("the", "and", "with", "that", "have", "this")
  private val deWords = Seq("der", "und", "nicht", "eine", "ist", "sich")
  private val frWords = Seq("les", "une", "pour", "dans", "est", "vous")

  private def doc(words: Seq[String], rot: Int, reps: Int = 4): String =
    Array.fill(reps)((words.drop(rot % words.size) ++
      words.take(rot % words.size)).mkString(" ")).mkString(" ")

  private def corpus() = {
    val rows =
      (0 until 6).map(i => (i.toLong, "en", doc(enWords, i))) ++
      (6 until 12).map(i => (i.toLong, "de", doc(deWords, i))) ++
      (12 until 18).map(i => (i.toLong, "fr", doc(frWords, i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), 2), schema)
  }

  test("trigram profiles classify held-out same-language docs correctly") {
    val d = corpus()
    val profiles = LangId.trigramProfiles(
      d.filter(col("doc_id") % 2 === 0), "lang", "text")
    val out = LangId.classify(d, "doc_id", "text", profiles)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val wrong = out.filter(col("predicted_lang") =!= col("lang")).count()
    assert(wrong == 0, s"$wrong of 18 docs misclassified")
    // profile table is bounded: ≤ langs × buckets
    assert(profiles.count() <= 3L * 4096L)
  }

  test("documents without trigrams predict 'und' with score 0") {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "en", "ab"),
        org.apache.spark.sql.Row(2L, "en", doc(enWords, 0))), 2), schema)
    val profiles = LangId.trigramProfiles(d, "lang", "text")
    val out = LangId.classify(d, "doc_id", "text", profiles)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("und", 0L)))
    assert(out(2L)._1 == "en")
  }

  test("classifier is deterministic across runs") {
    val d = corpus()
    val p = LangId.trigramProfiles(d, "lang", "text")
    val a = LangId.classify(d, "doc_id", "text", p)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = LangId.classify(d, "doc_id", "text", p)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("CCNet chain end-to-end: langid → line dedup → perplexity buckets") {
    // English docs carry a boilerplate line repeated across docs; German
    // docs must fall out at stage 1, the boilerplate at stage 2, and every
    // survivor lands in a perplexity bucket at stage 3
    val boiler = "subscribe to our newsletter now"
    // the two content lines are unique per doc (distinct rotation × reps);
    // ONLY the boilerplate repeats across docs
    // each doc drags in a different amount of rare-bigram mass so the
    // perplexities differ and the terciles actually split
    val rows =
      (0 until 6).map { i =>
        val rare = (0 until i).map(j => s"rare${i}x$j").mkString(" ")
        (i.toLong, "en",
          s"${doc(enWords, i, reps = 4)}\n$boiler\n${doc(enWords, i, reps = 3)} $rare")
      } ++ (6 until 12).map(i => (i.toLong, "de", doc(deWords, i)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), 2), schema)

    // stage 1: language identification (profiles from the labeled corpus)
    val profiles = LangId.trigramProfiles(d, "lang", "text")
    val en = LangId.classify(d, "doc_id", "text", profiles)
      .filter(col("predicted_lang") === "en")
      .join(d.select("doc_id", "text"), "doc_id")
    assert(en.count() == 6, "stage 1 must keep exactly the 6 en docs")

    // stage 2: CCNet line-level dedup drops the shared boilerplate line
    val deduped = TextDedup.dropDuplicatedLines(en, "doc_id", "text")
    assert(deduped.filter(col("clean_text").contains(boiler)).count() == 0)
    assert(deduped.filter(col("n_kept") =!= col("n_lines") - 1).count() == 0)

    // stage 3: perplexity buckets over the cleaned text
    val cleanDocs = deduped.select(
      col("id").as("doc_id"), col("clean_text").as("text"))
    val buckets = LanguageModel.ccnetBuckets(
      cleanDocs, cleanDocs, "doc_id", "text")
    assert(buckets.count() == 6)
    val names = buckets.select("bucket").distinct()
      .collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("head", "middle", "tail")))
    assert(names.contains("head") && names.contains("tail"))
  }
}
