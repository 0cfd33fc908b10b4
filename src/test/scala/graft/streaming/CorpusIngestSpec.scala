package graft.streaming

import graft.SparkSpec
import graft.sources.TxLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus ingestion with inline dedup (the continuous-crawl twin
  * of q57): exact + near-dup within each batch, near-dup against the
  * accepted corpus across batches.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val other = "completely different words entirely unrelated content goes right here now"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("acceptBatch: exact + intra-batch near-dup + cross-batch near-dup") {
    val accepted = tmp("graft-corpus") + "/accepted"
    // batch 1: one doc + its exact copy + an unrelated doc
    val b1 = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val s1 = CorpusIngest.acceptBatch(b1, accepted)
    assert(rowsOf(s1, "doc_id").map(_.head) == Set[Any](1L, 3L)) // exact dup 2 dropped
    // batch 2: a near-dup of accepted doc 1, two intra-batch near-dups of
    // each other (keep-lowest wins), and a genuinely new doc
    val fresh = "nothing like anything seen before in this corpus at all honestly truly"
    val b2 = Seq(
      (10L, base + " x"),     // near-dup of accepted doc 1 -> dropped
      (11L, fresh + " a"),    // intra-batch near-dup pair: 11 survives...
      (12L, fresh + " b"),    // ...12 dropped (keep-lowest-id)
      (13L, other.reverse)    // new content -> accepted
    ).toDF("doc_id", "text")
    val s2 = CorpusIngest.acceptBatch(b2, accepted)
    assert(rowsOf(s2, "doc_id").map(_.head) == Set[Any](11L, 13L))
    // the accepted table holds exactly the four survivors
    val all = TxLog.read(spark, accepted).select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 3L, 11L, 13L))
  }

  test("acceptBatch with corpusBloomItems: same answers, bloom maintained per batch") {
    val acceptedA = tmp("graft-corpusbl") + "/accepted"  // bloom-backed
    val acceptedB = tmp("graft-corpusnb") + "/accepted"  // reference path
    val b1 = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val fresh = "nothing like anything seen before in this corpus at all honestly truly"
    val b2 = Seq(
      (10L, base),            // EXACT re-crawl of accepted doc 1 -> stage 2.5
      (11L, base + " x"),     // near-dup of accepted doc 1 -> stage 3
      (12L, fresh)            // new content -> accepted
    ).toDF("doc_id", "text")
    for ((path, items) <- Seq((acceptedA, 10000L), (acceptedB, 0L))) {
      CorpusIngest.acceptBatch(b1, path, corpusBloomItems = items)
      CorpusIngest.acceptBatch(b2, path, corpusBloomItems = items)
    }
    // identical accepted corpora whichever path ran (the bloom stage only
    // moves exact re-crawls off the shingle pipeline, never changes answers)
    def all(p: String) = TxLog.read(spark, p).select("doc_id").as[Long].collect().toSet
    assert(all(acceptedA) == Set(1L, 3L, 12L))
    assert(all(acceptedA) == all(acceptedB))
    // the fingerprint filter was persisted and delta-maintained to the
    // latest table version (v0 build + v1 delta-merge after batch 2's append)
    val st = graft.sources.BloomStore.load(spark, acceptedA, "__fp")
    assert(st.map(_._1).contains(TxLog.currentVersion(spark, acceptedA)))
  }

  test("acceptBatch: a crashed writer's orphan files never join the dedup horizon") {
    val accepted = tmp("graft-corpus") + "/accepted"
    val s1 = CorpusIngest.acceptBatch(Seq((1L, base)).toDF("doc_id", "text"), accepted)
    assert(rowsOf(s1, "doc_id").map(_.head) == Set[Any](1L))
    // simulate a crash mid-append: data files land under a tx- dir but the
    // manifest commit never happens — exactly what a killed batch leaves
    val orphanDoc = "some brand new sentence nobody has ever written down before anywhere"
    Seq((77L, orphanDoc)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$accepted/tx-deadbeef")
    // the orphan must be invisible: reads skip it...
    val visible = TxLog.read(spark, accepted).select("doc_id").as[Long].collect().toSet
    assert(visible == Set(1L))
    // ...and the next batch's cross-corpus dedup must NOT drop a near-dup of
    // the orphan (it was never committed), while still dropping dups of 1
    val b2 = Seq((20L, orphanDoc + " x"), (21L, base + " y")).toDF("doc_id", "text")
    val s2 = CorpusIngest.acceptBatch(b2, accepted)
    assert(rowsOf(s2, "doc_id").map(_.head) == Set[Any](20L))
    val all = TxLog.read(spark, accepted).select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 20L))
    // vacuum reclaims the orphan's files
    TxLog.vacuum(spark, accepted, retainVersions = 10)
    val fs = new org.apache.hadoop.fs.Path(accepted)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(accepted), true)
    val orphans = Iterator.continually(it).takeWhile(_.hasNext).map(_.next().getPath.toString)
      .filter(p => p.contains("tx-deadbeef") && p.endsWith(".parquet")).toList
    assert(orphans.isEmpty, orphans)
    // the committed table is untouched by the vacuum
    assert(TxLog.read(spark, accepted).select("doc_id").as[Long].collect().toSet == Set(1L, 20L))
  }

  test("dedupingIngest: the stream drains through the same path") {
    val in = tmp("graft-corpus-in")
    val accepted = tmp("graft-corpus") + "/accepted"
    val checkpoint = tmp("graft-corpus-ck")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq((1L, base), (2L, base + " x"), (3L, other)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val q = CorpusIngest.dedupingIngest(
      spark.readStream.schema(schema).parquet(in), accepted, checkpoint)
    q.awaitTermination()
    val ids = TxLog.read(spark, accepted).select("doc_id").as[Long].collect().toSet
    // 2 is an intra-batch near-dup of 1 (keep-lowest-id)
    assert(ids == Set(1L, 3L))
  }
}
