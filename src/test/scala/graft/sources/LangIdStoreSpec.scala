package graft.sources

import graft.SparkSpec
import graft.operators.LangId
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted language-ID profile store: classify-from-store must be
  * BIT-identical to retraining [[LangId.trigramProfiles]] on the whole
  * accumulated labeled corpus (counts are the mergeable statistic), the
  * fenced ingest must no-op on replay, and compaction must leave profiles
  * untouched — the LineStore guarantees at profile granularity.
  */
class LangIdStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")

  private def rows(df: DataFrame) =
    df.collect().sortBy(_.getLong(0)).toSeq

  // profiles lead with the (String) lang column — sort on (lang, bucket)
  private def profRows(df: DataFrame) =
    df.collect().sortBy(r => (r.getString(0), r.getLong(1))).toSeq

  private def inMemory(trained: DataFrame, buckets: Int = 4096) =
    LangId.classify(docs, "doc_id", "text",
      LangId.trigramProfiles(trained, "lang", "text", buckets), buckets)

  test("create + fenced ingest: classify == retraining on the union corpus, bit-for-bit") {
    val path = java.nio.file.Files.createTempDirectory("graft-lidstore").toString + "/s"
    LangIdStore.create(docs.filter(col("doc_id") % 4 === 0), "lang", "text", path)
    LangIdStore.ingestBatch(spark, docs.filter(col("doc_id") % 4 === 2),
      "lang", "text", path, "lid-spec", 1L)
    val store = LangIdStore.classify(spark, path, docs, "doc_id", "text")
    val expect = inMemory(docs.filter(col("doc_id") % 2 === 0))
    assert(rows(store) == rows(expect),
      "store route diverged from the in-memory union retrain")
    // bounded by construction: ≤ languages × buckets profile rows
    val nLangs = docs.select("lang").distinct().count()
    assert(LangIdStore.profiles(spark, path).count() <= nLangs * 4096L)
  }

  test("a replayed ingest batch no-ops under the fence") {
    val path = java.nio.file.Files.createTempDirectory("graft-lidstore").toString + "/r"
    LangIdStore.create(docs.filter(col("doc_id") % 4 === 0), "lang", "text", path)
    val v1 = LangIdStore.ingestBatch(spark, docs.filter(col("doc_id") % 4 === 2),
      "lang", "text", path, "lid-spec", 1L)
    val before = profRows(LangIdStore.profiles(spark, path))
    val v2 = LangIdStore.ingestBatch(spark, docs.filter(col("doc_id") % 4 === 2),
      "lang", "text", path, "lid-spec", 1L)
    assert(v2 == v1, "replayed batch committed a new version")
    assert(profRows(LangIdStore.profiles(spark, path)) == before,
      "replayed batch changed the census")
  }

  test("compaction bounds census rows and leaves profiles bit-identical") {
    val path = java.nio.file.Files.createTempDirectory("graft-lidstore").toString + "/c"
    LangIdStore.create(docs.filter(col("doc_id") % 4 === 0), "lang", "text", path)
    LangIdStore.ingestBatch(spark, docs.filter(col("doc_id") % 8 === 2),
      "lang", "text", path, "lid-spec", 1L)
    LangIdStore.ingestBatch(spark, docs.filter(col("doc_id") % 8 === 6),
      "lang", "text", path, "lid-spec", 2L)
    val before = profRows(LangIdStore.profiles(spark, path))
    val rowsBefore = TxLog.read(spark, path).count()
    LangIdStore.compactCounts(spark, path, upTo = 2L)
    assert(profRows(LangIdStore.profiles(spark, path)) == before,
      "compaction changed the derived profiles")
    assert(TxLog.read(spark, path).count() < rowsBefore,
      "compaction merged nothing")
    // batch 2's rows survive as-is (>= upTo), so a replay still no-ops
    val v = LangIdStore.ingestBatch(spark, docs.filter(col("doc_id") % 8 === 6),
      "lang", "text", path, "lid-spec", 2L)
    assert(profRows(LangIdStore.profiles(spark, path)) == before,
      s"post-compaction replay of batch 2 double-counted (v=$v)")
  }

  test("buckets freeze as table state: a non-default space round-trips") {
    val path = java.nio.file.Files.createTempDirectory("graft-lidstore").toString + "/b"
    LangIdStore.create(docs.filter(col("doc_id") % 2 === 0), "lang", "text",
      path, buckets = 512)
    val store = LangIdStore.classify(spark, path, docs, "doc_id", "text")
    val expect = inMemory(docs.filter(col("doc_id") % 2 === 0), buckets = 512)
    assert(rows(store) == rows(expect))
  }
}
