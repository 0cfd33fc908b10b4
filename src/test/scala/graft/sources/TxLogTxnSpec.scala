package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Exactly-once idempotent appends ([[TxLog.appendOnce]] — Delta's
  * txnAppId/txnVersion SetTransaction contract): replayed batches are
  * no-ops, watermarks survive compaction, racing duplicates land once, and
  * restore rewinds the fence with the data.
  */
class TxLogTxnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-txn").toString + "/t"

  private def batch(b: Int) =
    (0 until 10).map(i => (b * 100 + i, s"b$b-$i")).toDF("k", "v")

  test("replayed batch is a no-op: rows, version and watermark unchanged") {
    val p = tmp()
    TxLog.appendOnce(batch(0), p, "app", 0L)
    val v1 = TxLog.appendOnce(batch(1), p, "app", 1L)
    assert(TxLog.read(spark, p).count() === 20)
    // crash-restart replays the last epoch
    val vReplay = TxLog.appendOnce(batch(1), p, "app", 1L)
    assert(vReplay === v1)
    assert(TxLog.currentVersion(spark, p) === v1)
    assert(TxLog.read(spark, p).count() === 20)
    // an OLDER batch (checkpoint rolled back further than the sink) too
    assert(TxLog.appendOnce(batch(0), p, "app", 0L) === v1)
    assert(TxLog.read(spark, p).count() === 20)
    assert(TxLog.txnVersion(spark, p, "app") === 1L)
    // and no orphan files linger for vacuum beyond the live ones
    val v2 = TxLog.appendOnce(batch(2), p, "app", 2L)
    assert(v2 > v1)
    assert(TxLog.read(spark, p).count() === 30)
  }

  test("distinct appIds are independent fences") {
    val p = tmp()
    TxLog.appendOnce(batch(0), p, "appA", 5L)
    TxLog.appendOnce(batch(1), p, "appB", 0L) // lower version, different app
    assert(TxLog.read(spark, p).count() === 20)
    assert(TxLog.txnVersion(spark, p, "appA") === 5L)
    assert(TxLog.txnVersion(spark, p, "appB") === 0L)
    assert(TxLog.txnVersion(spark, p, "appC") === -1L)
  }

  test("watermark survives compaction and plain appends interleaved") {
    val p = tmp()
    TxLog.appendOnce(batch(0), p, "app", 0L)
    TxLog.appendOnce(batch(1), p, "app", 1L)
    TxLog.appendFlat(batch(7).withColumn("k", col("k") + 9000), p) // non-txn writer
    TxLog.compact(spark, p, partitionCol = "k") // full rewrite
    // the fence must still hold after OPTIMIZE
    TxLog.appendOnce(batch(1), p, "app", 1L)
    assert(TxLog.read(spark, p).count() === 30)
    assert(TxLog.txnVersion(spark, p, "app") === 1L)
    // and a genuinely new batch still lands
    TxLog.appendOnce(batch(2), p, "app", 2L)
    assert(TxLog.read(spark, p).count() === 40)
  }

  test("racing duplicate writers: exactly one commit, no double rows") {
    val p = tmp()
    TxLog.appendOnce(batch(0), p, "app", 0L)
    val threads = (1 to 4).map { _ =>
      new Thread(() => TxLog.appendOnce(batch(1), p, "app", 1L))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(TxLog.read(spark, p).count() === 20)
    assert(TxLog.txnVersion(spark, p, "app") === 1L)
    // every version in the history is readable (no torn manifests)
    (0L to TxLog.currentVersion(spark, p)).foreach { v =>
      TxLog.read(spark, p, version = v).count()
    }
  }

  test("restore rewinds the fence with the data it covers") {
    val p = tmp()
    val v0 = TxLog.appendOnce(batch(0), p, "app", 0L)
    TxLog.appendOnce(batch(1), p, "app", 1L)
    TxLog.restore(spark, p, v0)
    // batch 1's data is gone, so its watermark must be too — the writer
    // re-delivers batch 1 and it must LAND, or the table loses data forever
    assert(TxLog.txnVersion(spark, p, "app") === 0L)
    TxLog.appendOnce(batch(1), p, "app", 1L)
    assert(TxLog.read(spark, p).count() === 20)
  }

  test("real streaming restart: crash window between sink and checkpoint commits") {
    // the exactly-once hole appendOnce closes: foreachBatch commits the
    // sink, then Spark commits the epoch to the checkpoint — a crash
    // BETWEEN the two re-delivers the same batchId on restart. Reproduced
    // with a genuine crash: the first run's sink lands its TxLog commit and
    // then throws; the restarted query replays the same epoch from the
    // checkpoint into a well-behaved sink.
    val root = Files.createTempDirectory("graft-txn-stream").toString
    val dataDir = s"$root/in"
    val ev = (1L to 50L).map(i => (i, s"e$i")).toDF("id", "v")
    ev.write.parquet(dataDir)
    val schema = spark.read.parquet(dataDir).schema

    def run(ckpt: String, sink: (org.apache.spark.sql.DataFrame, Long) => Unit,
            expectCrash: Boolean): Unit = {
      val q = spark.readStream.schema(schema).parquet(dataDir)
        .writeStream
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      try { q.awaitTermination(); assert(!expectCrash, "sink crash vanished") }
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(expectCrash, s"unexpected stream failure: ${e.getMessage}")
      } finally if (q.isActive) q.stop()
    }

    val table = s"$root/t"
    run(s"$root/ckpt",
      (df, id) => { TxLog.appendOnce(df, table, "stream", id)
        throw new RuntimeException("crash after sink commit") },
      expectCrash = true)
    run(s"$root/ckpt",
      (df, id) => { TxLog.appendOnce(df, table, "stream", id); () },
      expectCrash = false)
    assert(TxLog.read(spark, table).count() === 50) // exactly once
    assert(TxLog.txnVersion(spark, table, "stream") === 0L)

    // control: a naive appendFlat sink double-lands the replayed epoch —
    // the crash window is real, not an artifact of the harness
    val naive = s"$root/naive"
    run(s"$root/ckpt2",
      (df, _) => { TxLog.appendFlat(df, naive)
        throw new RuntimeException("crash after sink commit") },
      expectCrash = true)
    run(s"$root/ckpt2",
      (df, _) => { TxLog.appendFlat(df, naive); () },
      expectCrash = false)
    assert(TxLog.read(spark, naive).count() === 100)
  }

  test("foreachBatch-shaped replay sequence lands each epoch once") {
    val p = tmp()
    // the exact call shape a streaming sink makes: (df, batchId) pairs with
    // a crash-restart replaying epochs 1 and 2
    Seq(0, 1, 2, 1, 2, 3).foreach(b => TxLog.appendOnce(batch(b), p, "q", b.toLong))
    val got = TxLog.read(spark, p).select("v").as[String].collect().toSet
    val want = (0 to 3).flatMap(b => (0 until 10).map(i => s"b$b-$i")).toSet
    assert(got === want)
  }
}
