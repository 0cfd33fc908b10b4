package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations
import graft.sources.{Tables, TxLog}
import org.apache.spark.sql.functions._

/** Streaming ingest with the in-stream drift audit: every micro-batch is
  * one exactly-once data commit plus one monitor commit under the same
  * fence — the audit trail can neither miss a landed batch nor duplicate
  * on replay, and each monitor row-set equals the batch-computed
  * [[Expectations.snapshotDrift]] of the versions it spans.
  */
class DriftStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def orders = Tables.load(spark, dir, "orders")
    .select(col("o_orderkey").as("k"), (col("o_orderkey") % 8).as("p"),
      col("o_totalprice").as("price"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed batches: one monitor row-set per landed version, equal to the batch-computed drift") {
    val in = tmp("graft-drift-in")
    val data = tmp("graft-drift") + "/t"
    val monitor = tmp("graft-drift") + "/m"
    val ck = tmp("graft-drift-ck")
    // batch 2 NEGATES prices — the range-expansion signal the monitor is for
    orders.filter(col("k") % 2 === 0).write.mode("append").parquet(in)
    orders.filter(col("k") % 2 === 1)
      .withColumn("price", -col("price")).write.mode("append").parquet(in)
    val q = DriftStream.monitoredIngest(
      spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      data, monitor, ck, partitionCol = "p", cols = Seq("k", "price"))
    q.awaitTermination()

    assert(TxLog.read(spark, data).count() == orders.count())
    val mon = TxLog.read(spark, monitor)
    val versions = mon.select("data_version").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(versions.length == 2, s"expected 2 audited versions: ${versions.toSeq}")
    // the second version's audit == snapshotDrift(v_first, v_second)
    val (v1, v2) = (versions(0), versions(1))
    val expect = Expectations.snapshotDrift(
      TxLog.read(spark, data, v1).select("k", "price"),
      TxLog.read(spark, data, v2).select("k", "price"),
      Seq("k", "price")).withColumn("data_version", lit(v2))
    assertSameRows(mon.filter(col("data_version") === v2), expect)
    // and it caught the negated prices: price range expanded, key range too
    val priceRow = mon.filter(col("data_version") === v2 &&
      col("col_name") === "price").collect().head
    assert(priceRow.getAs[Boolean]("range_expanded"))
    assert(priceRow.getAs[Double]("min_after") < 0.0)
  }

  test("replayed micro-batch: data AND audit trail both unchanged (shared fence)") {
    val data = tmp("graft-drift2") + "/t"
    val monitor = tmp("graft-drift2") + "/m"
    val b1 = orders.filter(col("k") < 1000)
    val b2 = orders.filter(col("k") >= 1000 && col("k") < 2000)
    DriftStream.ingestBatch(spark, b1, data, monitor, "p",
      Seq("k", "price"), "app", 0L)
    DriftStream.ingestBatch(spark, b2, data, monitor, "p",
      Seq("k", "price"), "app", 1L)
    val dataRows = TxLog.read(spark, data).count()
    val monRows = TxLog.read(spark, monitor).collect().map(_.toSeq).toSet
    // a restarted stream re-delivers batch 1 — both tables must be no-ops
    DriftStream.ingestBatch(spark, b2, data, monitor, "p",
      Seq("k", "price"), "app", 1L)
    assert(TxLog.read(spark, data).count() == dataRows)
    assert(TxLog.read(spark, monitor).collect().map(_.toSeq).toSet == monRows)
    // first-batch audit exists too: before-side profile absent → NULL deltas
    val first = TxLog.read(spark, monitor)
      .filter(col("data_version") === TxLog.read(spark, monitor)
        .agg(min("data_version")).head.getLong(0))
    assert(first.count() == 2) // one row per profiled column
    assert(first.filter(col("n_before").isNull).count() == 2)
  }
}
