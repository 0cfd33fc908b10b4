package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.{Tables, TxLog}
import org.apache.spark.sql.functions._

/** Streaming embeddings into the VERSIONED angular ANN store: batches land
  * through one TxLog manifest swap (a probe sees all of a batch or none),
  * replays are exactly-once, and probes prune by bucket through the
  * manifest — the snapshot-isolated form of AnnStore's raw layout.
  */
class AnnIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed micro-batches drain in; probe == lshTopK over the full corpus, manifest-pruned") {
    val in = tmp("graft-annin")
    val store = tmp("graft-annstore-tx") + "/ann"
    val checkpoint = tmp("graft-annin-ck")
    // three parquet files + maxFilesPerTrigger=1 force >=3 micro-batches
    emb.filter(col("vec_id") % 3 === 0).write.mode("append").parquet(in)
    emb.filter(col("vec_id") % 3 === 1).write.mode("append").parquet(in)
    emb.filter(col("vec_id") % 3 === 2).write.mode("append").parquet(in)
    val q = AnnIngest.embeddingIngest(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      store, checkpoint, "embedding", nPlanes = 4, dim = 64)
    q.awaitTermination()
    assert(TxLog.read(spark, store).count() == emb.count())

    val query = emb.filter(col("vec_id") === 0L).select(col("embedding"))
    val probe = AnnIngest.probe(spark, store, "vec_id", "embedding",
      query, k = 10, nPlanes = 4, dim = 64, excludeId = Some(0L))
    val expect = Similarity.lshTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, nPlanes = 4, dim = 64)
    assert(probe.collect().toSeq == expect.collect().toSeq)
    // manifest pruning: only files carrying this bucket's partition segment
    // reach the scan
    val planes = Similarity.hyperplanes(4, 64)
    val qb = query.select(Similarity.lshBucket(col("embedding"), planes))
      .head.getLong(0)
    val snap = TxLog.snapshot(spark, store)
    val handed = TxLog.keyFiles(snap, "bucket", qb.toString)
    assert(handed.nonEmpty && handed.size < snap.files.size,
      s"pruning handed ${handed.size} of ${snap.files.size} files")
  }

  test("replayed batch is exactly-once; a reader pinned pre-append sees none of it") {
    val store = tmp("graft-annstore-tx2") + "/ann"
    val b1 = emb.filter(col("vec_id") < 200L)
    val b2 = emb.filter(col("vec_id") >= 200L && col("vec_id") < 400L)
    AnnIngest.ingestBatch(b1, store, "embedding", 4, 64, "app", 0L)
    val v1 = TxLog.currentVersion(spark, store)
    val n1 = TxLog.read(spark, store).count()
    // a restarted foreachBatch re-delivers batch 0 — absorbed, no new rows
    AnnIngest.ingestBatch(b1, store, "embedding", 4, 64, "app", 0L)
    assert(TxLog.currentVersion(spark, store) == v1)
    assert(TxLog.read(spark, store).count() == n1)
    // the next batch commits in ONE manifest swap: a reader pinned at v1
    // sees none of b2, the current snapshot all of it — never a prefix
    AnnIngest.ingestBatch(b2, store, "embedding", 4, 64, "app", 1L)
    assert(TxLog.read(spark, store, v1).count() == n1)
    assert(TxLog.read(spark, store).count() == n1 + b2.count())
  }

  test("uncommitted data files are invisible to probes (crash mid-append leaves no partial batch)") {
    val store = tmp("graft-annstore-tx3") + "/ann"
    AnnIngest.ingestBatch(emb.filter(col("vec_id") < 300L), store,
      "embedding", 4, 64, "app", 0L)
    val query = emb.filter(col("vec_id") === 0L).select(col("embedding"))
    def run() = AnnIngest.probe(spark, store, "vec_id", "embedding",
      query, k = 10, nPlanes = 4, dim = 64, excludeId = Some(0L))
      .collect().toSeq
    val before = run()
    // simulate a crashed append: data files on disk, manifest never swapped
    // (every probe candidate neighbor planted into the query's own bucket)
    val planes = Similarity.hyperplanes(4, 64)
    val qb = emb.filter(col("vec_id") === 0L)
      .select(Similarity.lshBucket(col("embedding"), planes)).head.getLong(0)
    emb.filter(col("vec_id") >= 300L).limit(50)
      .withColumn("bucket", lit(qb))
      .write.mode("append").parquet(store + s"/tx-orphan/__bucket=$qb")
    assert(run() == before,
      "a probe must never see files outside the committed manifest")
  }
}
