package graft.sources

import graft.SparkSpec
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** The persisted gram-census store: probes equal the re-fingerprinted
  * against-corpus matcher, sequential ingest equals the growing-union
  * matcher per batch, and a replayed batch returns byte-identical spans
  * while the census append no-ops.
  */
class GramStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-gram").toString + "/census"

  test("probeSpans over the store == exactSubstringSpansAgainst on the raw corpus") {
    val existing = docs.filter(col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(col("doc_id") % 3 === 0)
    val path = tmp()
    GramStore.create(existing, "doc_id", "text", path, minTokens = 30)
    assert(GramStore.minTokensOf(spark, path) == 30)
    val viaStore = GramStore.probeSpans(spark, path, incoming, "doc_id", "text")
    val direct = TextDedup.exactSubstringSpansAgainst(
      existing, incoming, "doc_id", "text", minTokens = 30)
    assertSameRows(viaStore, direct)
    assert(viaStore.count() > 0)
  }

  test("sequential ingest == growing-union matcher per batch; replay is a byte-identical no-op") {
    val path = tmp()
    val b = (0 to 2).map(i => docs.filter(col("doc_id") % 3 === i))
    GramStore.create(b(0), "doc_id", "text", path, minTokens = 30)
    val v0 = TxLog.currentVersion(spark, path)

    val s1 = GramStore.ingestBatch(spark, b(1), "doc_id", "text", path,
      "app", 10L)
    assertSameRows(s1, TextDedup.exactSubstringSpansAgainst(
      b(0), b(1), "doc_id", "text", minTokens = 30))
    val s2 = GramStore.ingestBatch(spark, b(2), "doc_id", "text", path,
      "app", 11L)
    assertSameRows(s2, TextDedup.exactSubstringSpansAgainst(
      b(0).unionByName(b(1)), b(2), "doc_id", "text", minTokens = 30))
    assert(TxLog.currentVersion(spark, path) == v0 + 2)

    // a restarted writer re-delivers batch 11: the census must not grow
    // (fence) and the spans must come back byte-identical — its own landed
    // grams are excluded by the first_batch tag, not by ordering luck
    val rows2 = s2.collect().map(_.toSeq).toSet
    val replay = GramStore.ingestBatch(spark, b(2), "doc_id", "text", path,
      "app", 11L)
    assert(TxLog.currentVersion(spark, path) == v0 + 2)
    assert(replay.collect().map(_.toSeq).toSet == rows2)
  }

  test("a probe against a store of the wrong width fails loudly via frozen meta") {
    val path = tmp()
    GramStore.create(docs.limit(10), "doc_id", "text", path, minTokens = 30)
    // minTokens comes from table state, not the caller — no silent mismatch
    assert(GramStore.minTokensOf(spark, path) == 30)
    val e = intercept[IllegalArgumentException] {
      GramStore.readMeta(spark, path + "-nonexistent")
    }
    assert(e.getMessage.contains("gram store"))
  }
}
