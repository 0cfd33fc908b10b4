package graft.streaming

import graft.SparkSpec
import graft.sources.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC sink: a change feed consumed micro-batch by micro-batch,
  * each batch folded into the dimension with `TxLog.applyChanges` inside
  * `foreachBatch` — the Structured Streaming end of the Delta Live Tables
  * `apply_changes` shape. Feeds are shipped per-key prefix-closed (the CDC
  * log contract), so per-batch winner folding composes to the whole-feed
  * fold; at-least-once redelivery of the last batch is absorbed by the
  * winner rule (idempotent replay).
  */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch applyChanges: micro-batched feed ≡ one-shot fold; replay idempotent") {
    val base = java.nio.file.Files.createTempDirectory("cdcstream").toString
    val in = s"$base/in"; val dim = s"$base/dim/t"; val oneShot = s"$base/one/t"

    val start = Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 1L))
      .toDF("k", "name", "b")
    TxLog.overwrite(start, dim, "b")
    TxLog.overwrite(start, oneShot, "b")

    def feed(rows: Seq[(Long, String, Long, Long, String)]): DataFrame =
      rows.toDF("k", "name", "b", "seq", "op")
    // batch 1: update k=1, insert k=9; batch 2 (later seqs): delete k=2,
    // re-update k=1 — per-key sequences arrive in order across batches
    val b1 = feed(Seq((1L, "A1", 1L, 1L, "upsert"), (9L, "N", 1L, 1L, "upsert")))
    val b2 = feed(Seq((2L, null, 2L, 2L, "delete"), (1L, "A2", 1L, 2L, "upsert")))
    b1.coalesce(1).write.parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (mb: DataFrame, _: Long) =>
        if (!mb.isEmpty)
          TxLog.applyChanges(mb, dim, "b", Seq("k"), "seq", "op"): Unit
      }.start()
    q.processAllAvailable(); q.stop()

    TxLog.applyChanges(b1.unionByName(b2), oneShot, "b", Seq("k"), "seq", "op")
    def rows(p: String) = TxLog.read(spark, p)
      .select(col("k"), col("name"), col("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(dim) == rows(oneShot))
    assert(rows(dim) ==
      Set((1L, "A2", 1L), (3L, "c", 1L), (9L, "N", 1L)))

    // at-least-once redelivery: re-applying the LAST batch changes nothing
    val vBefore = TxLog.read(spark, dim).count()
    TxLog.applyChanges(b2, dim, "b", Seq("k"), "seq", "op")
    assert(rows(dim) == rows(oneShot) && TxLog.read(spark, dim).count() == vBefore)
  }
}
