package graft.streaming

import graft.SparkSpec
import graft.operators.Evaluation
import graft.sources.ConformalStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming conformal calibration: the threshold read after the stream
  * drains equals a batch recalibration over every delivered score, the
  * census is exactly-once under replayed batches, and the crash window —
  * census committed, checkpoint not — heals on replay through the fence.
  */
class ConformalIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def batch(xs: (String, Long)*): DataFrame = xs.toDF("src", "s")

  test("streamed batches: threshold == batch recalibration over all delivered scores") {
    val in = tmp("graft-conf-in")
    val census = tmp("graft-conf") + "/census"
    val ck = tmp("graft-conf-ck")
    val b0 = batch(("a", 10L), ("a", 12L), ("b", 5L))
    val b1 = batch(("a", 11L), ("a", 12L), ("b", 7L), ("b", 6L))
    val b2 = batch(("a", 9L), ("b", 8L), ("b", 5L))
    ConformalStore.create(b0, "src", "s", census)
    b1.coalesce(1).write.mode("append").parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)
    val q = ConformalIngest.monitoredIngest(
      spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      "src", "s", census, ck)
    q.awaitTermination()

    val store = ConformalStore.threshold(spark, census)
      .collect().sortBy(_.getString(0)).toSeq
    val recal = Evaluation.conformalThreshold(
      b0.unionByName(b1).unionByName(b2), "src", "s")
      .collect().sortBy(_.getString(0)).toSeq
    assert(store == recal, "streamed census diverged from the batch recalibration")
    val total = ConformalStore.census(spark, census)
      .agg(sum("n")).head().getLong(0)
    assert(total == 10L, s"expected 10 scores, census holds $total")
  }

  test("crash window — census committed, checkpoint not: the replayed batch no-ops") {
    val in = tmp("graft-conf-in2")
    val census = tmp("graft-conf2") + "/census"
    val ck = tmp("graft-conf-ck2")
    val b0 = batch(("a", 3L))
    val b1 = batch(("a", 4L), ("b", 2L))
    ConformalStore.create(b0, "src", "s", census)
    b1.coalesce(1).write.mode("append").parquet(in)
    // simulate the crash: foreachBatch ran ingestBatch for streaming batch
    // 0 (the store committed under the stream's own fence id), but the
    // checkpoint never recorded the batch — on restart Structured
    // Streaming re-delivers it with the SAME batchId
    val appId = s"conformal-ingest:${census.replace('/', '|')}"
    ConformalStore.ingestBatch(spark, b1, "src", "s", census, appId, 0L)
    val q = ConformalIngest.monitoredIngest(
      spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      "src", "s", census, ck)
    q.awaitTermination()
    val total = ConformalStore.census(spark, census)
      .agg(sum("n")).head().getLong(0)
    assert(total == 3L, s"crash-window replay double-counted: $total")
    // and a fresh restart over the same checkpoint re-delivers nothing
    val q2 = ConformalIngest.monitoredIngest(
      spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      "src", "s", census, ck)
    q2.awaitTermination()
    assert(ConformalStore.census(spark, census)
      .agg(sum("n")).head().getLong(0) == 3L)
  }
}
