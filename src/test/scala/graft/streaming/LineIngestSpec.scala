package graft.streaming

import graft.SparkSpec
import graft.operators.TextDedup
import graft.sources.{LineStore, TxLog}
import org.apache.spark.sql.functions._

/** Streaming line-level dedup: per-batch cleaned rows equal the
  * growing-union cleaner, both tables are exactly-once, and the crash
  * window between the census commit and the cleaned commit heals on
  * replay.
  */
class LineIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  // deterministic lined docs: a per-doc unique body plus a banner that
  // repeats once per batch — cross-batch count merging is the whole test
  private def batchDf(ids: Seq[Long]) =
    ids.map(i => (i, s"shared crawl banner\nunique body $i"))
      .toDF("doc_id", "text")

  test("streamed batches: per-version cleaned rows equal the growing-union cleaner; exactly-once") {
    val in = tmp("graft-line-in")
    val census = tmp("graft-line") + "/census"
    val cleanT = tmp("graft-line") + "/clean"
    val ck = tmp("graft-line-ck")
    val b0 = batchDf(Seq(1L))
    val b1 = batchDf(Seq(10L))
    val b2 = batchDf(Seq(20L, 21L))
    LineStore.create(b0, "doc_id", "text", census)
    // one file per logical batch (maxFilesPerTrigger=1 defines batches)
    b1.coalesce(1).write.mode("append").parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)
    val q = LineIngest.monitoredIngest(
      spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      "doc_id", "text", census, cleanT, ck)
    q.awaitTermination()

    val cleaned = TxLog.read(spark, cleanT)
    assert(cleaned.select("batch_version").distinct().count() == 2)
    // whichever batch streamed FIRST saw banner count 1 (store) + its own:
    // b1's single banner survives only if it ran first; b2's intra-batch
    // pair always dies. By the time both landed, every banner in the
    // SECOND batch is gone. Check per-doc against the union cleaner:
    val union = TextDedup.dropDuplicatedLines(
      b0.unionByName(b1).unionByName(b2), "doc_id", "text")
    val gotFinalBatch = cleaned
      .filter(col("id").isin(20L, 21L))
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(gotFinalBatch == Map(20L -> "unique body 20",
      21L -> "unique body 21"))
    // the union form agrees that nothing but unique bodies survives
    assert(union.filter(col("id") >= 10L)
      .select("clean_text").as[String].collect()
      .forall(_.startsWith("unique body")))
  }

  test("crash between census commit and cleaned commit: the replay heals the table") {
    val census = tmp("graft-line2") + "/census"
    val cleanT = tmp("graft-line2") + "/clean"
    val b0 = batchDf(Seq(1L))
    val b1 = batchDf(Seq(10L, 11L))
    LineStore.create(b0, "doc_id", "text", census)
    // simulate the crash: census lands, cleaned rows never do
    LineStore.ingestBatch(spark, b1, "doc_id", "text", census,
      "app", 5L).count()
    assert(TxLog.currentVersion(spark, cleanT) < 0)
    val censusV = TxLog.currentVersion(spark, census)
    // the restarted stream re-delivers batch 5: census must not grow, the
    // MISSING cleaned rows must land, equal to the direct cleaner
    LineIngest.ingestBatch(spark, b1, "doc_id", "text", census, cleanT,
      "app", 5L)
    assert(TxLog.currentVersion(spark, census) == censusV)
    val expect = TextDedup.dropDuplicatedLinesAgainst(
      b0, b1, "doc_id", "text").withColumn("batch_version", lit(5L))
    assertSameRows(TxLog.read(spark, cleanT), expect)
    // full replay: both tables unchanged
    val rows = TxLog.read(spark, cleanT).collect().map(_.toSeq).toSet
    LineIngest.ingestBatch(spark, b1, "doc_id", "text", census, cleanT,
      "app", 5L)
    assert(TxLog.currentVersion(spark, census) == censusV)
    assert(TxLog.read(spark, cleanT).collect().map(_.toSeq).toSet == rows)
  }
}
