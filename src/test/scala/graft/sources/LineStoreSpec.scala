package graft.sources

import graft.SparkSpec
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** The persisted line-census store: probes equal the re-exploded
  * against-corpus cleaner, sequential ingest equals the growing-union
  * cleaner per batch (counts summed ACROSS batch rows — a line seen once
  * per batch in two batches still crosses minCount), and a replayed batch
  * returns byte-identical cleaned rows while the census append no-ops.
  */
class LineStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def lined = {
    val ws = split(col("text"), " ")
    Tables.load(spark, dir, "documents").select(col("doc_id"),
      concat(lit("hdr for "), col("source"), lit("\n"),
        array_join(
          transform(sequence(lit(0), floor((size(ws) - 1) / 6).cast("int")),
            i => concat_ws(" ", slice(ws, i * 6 + 1, lit(6)))), "\n"))
        .as("text"))
  }
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-line").toString + "/census"

  test("probeClean over the store == dropDuplicatedLinesAgainst on the raw corpus") {
    val existing = lined.filter(col("doc_id") % 3 =!= 0)
    val incoming = lined.filter(col("doc_id") % 3 === 0)
    val path = tmp()
    LineStore.create(existing, "doc_id", "text", path)
    val viaStore = LineStore.probeClean(spark, path, incoming,
      "doc_id", "text")
    val direct = TextDedup.dropDuplicatedLinesAgainst(
      existing, incoming, "doc_id", "text")
    assertSameRows(viaStore, direct)
    // the per-source header lines are boilerplate: something was dropped
    assert(viaStore.filter(col("n_kept") < col("n_lines")).count() > 0)
  }

  test("sequential ingest == growing-union cleaner; counts merge across batches; replay no-ops") {
    val path = tmp()
    // batch counts must SUM: the banner appears once per batch, so no
    // single batch (nor the create slice) reaches minCount=2 alone
    val b0 = Seq((1L, "existing only line\nbody zero")).toDF("doc_id", "text")
    val b1 = Seq((10L, "cross batch banner\nbody one")).toDF("doc_id", "text")
    val b2 = Seq((20L, "cross batch banner\nbody two")).toDF("doc_id", "text")
    LineStore.create(b0, "doc_id", "text", path)
    val v0 = TxLog.currentVersion(spark, path)

    val c1 = LineStore.ingestBatch(spark, b1, "doc_id", "text", path,
      "app", 10L)
    assertSameRows(c1, TextDedup.dropDuplicatedLinesAgainst(
      b0, b1, "doc_id", "text"))
    assert(c1.head().getAs[Long]("n_kept") == 2L) // banner unseen so far
    val c2 = LineStore.ingestBatch(spark, b2, "doc_id", "text", path,
      "app", 11L)
    assertSameRows(c2, TextDedup.dropDuplicatedLinesAgainst(
      b0.unionByName(b1), b2, "doc_id", "text"))
    // batch-1's count + batch-2's count reach minCount: banner dies now
    assert(c2.head().getAs[String]("clean_text") == "body two")
    assert(TxLog.currentVersion(spark, path) == v0 + 2)

    // replay of batch 11: census must not grow, cleaned rows byte-identical
    val rows2 = c2.collect().map(_.toSeq).toSet
    val replay = LineStore.ingestBatch(spark, b2, "doc_id", "text", path,
      "app", 11L)
    assert(TxLog.currentVersion(spark, path) == v0 + 2)
    assert(replay.collect().map(_.toSeq).toSet == rows2)
  }

  test("unit pattern and minCount are frozen table state; a non-store path fails loudly") {
    val path = tmp()
    LineStore.create(lined.limit(10), "doc_id", "text", path,
      minCount = 3, unitPattern = "\n\n+")
    val meta = LineStore.readMeta(spark, path)
    assert(meta("minCount") == "3")
    // the newline-carrying pattern round-trips through the meta escape
    assert(LineStore.unitPatternOf(spark, path) == "\n\n+")
    val e = intercept[IllegalArgumentException] {
      LineStore.readMeta(spark, path + "-nonexistent")
    }
    assert(e.getMessage.contains("line store"))
  }

  test("census compaction: probes bit-identical, rows bounded, replay fence intact") {
    val path = tmp()
    // the SAME banner line lands once per batch — one census row per batch
    // per hash, the exact growth compaction must bound
    def batch(id: Long, tag: String) =
      Seq((id, s"hot boilerplate banner\nbody $tag")).toDF("doc_id", "text")
    LineStore.create(batch(1L, "zero"), "doc_id", "text", path)
    (10L to 14L).foreach { v =>
      LineStore.ingestBatch(spark, batch(v, s"b$v"), "doc_id", "text",
        path, "app", v).collect()
    }
    val probeBatch = batch(99L, "probe")
    val before = LineStore.probeClean(spark, path, probeBatch,
      "doc_id", "text").collect().map(_.toSeq).toSet
    val rowsBefore = TxLog.read(spark, path).count()
    // banner hash holds 6 rows (create + 5 ingests); compact past the
    // latest committed batch
    val hotBefore = TxLog.read(spark, path)
      .groupBy("h").count().agg(max("count")).head().getLong(0)
    assert(hotBefore == 6L, s"expected 6 census rows for the hot hash, got $hotBefore")

    LineStore.compactCensus(spark, path, upTo = 14L)

    // bounded: hot hash now ≤ 2 rows (one merged + the batch-14 row)
    val hotAfter = TxLog.read(spark, path)
      .groupBy("h").count().agg(max("count")).head().getLong(0)
    assert(hotAfter <= 2L, s"hot hash still has $hotAfter census rows")
    assert(TxLog.read(spark, path).count() < rowsBefore)
    // probe bit-identical
    val after = LineStore.probeClean(spark, path, probeBatch,
      "doc_id", "text").collect().map(_.toSeq).toSet
    assert(after == before)
    // replay of the LATEST batch (the only one a streaming restart can
    // re-deliver): cleaned rows byte-identical, census append no-ops
    val vAfter = TxLog.currentVersion(spark, path)
    val replay = LineStore.ingestBatch(spark, batch(14L, "b14"),
      "doc_id", "text", path, "app", 14L)
    assert(TxLog.currentVersion(spark, path) == vAfter,
      "replayed append must no-op after compaction")
    val firstDelivery = TextDedup.dropDuplicatedLinesAgainst(
      (10L to 13L).map(v => batch(v, s"b$v"))
        .foldLeft(batch(1L, "zero"))(_ unionByName _),
      batch(14L, "b14"), "doc_id", "text")
    assertSameRows(replay, firstDelivery)
  }
}
