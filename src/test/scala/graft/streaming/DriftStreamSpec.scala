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

  test("crash between data commit and monitor commit: the replay heals the audit") {
    val data = tmp("graft-drift3") + "/t"
    val monitor = tmp("graft-drift3") + "/m"
    val b1 = orders.filter(col("k") < 1000)
    val b2 = orders.filter(col("k") >= 1000 && col("k") < 2000)
    DriftStream.ingestBatch(spark, b1, data, monitor, "p",
      Seq("k", "price"), "app", 0L)
    // simulate the crash window: batch 2's DATA lands under the stream's
    // fence, then the process dies before the seen/monitor commits
    TxLog.appendOnce(b2, data, "app", 1L, partitionCol = Some("p"))
    val v2 = TxLog.currentVersion(spark, data)
    assert(TxLog.read(spark, monitor)
      .filter(col("data_version") === v2).count() == 0)
    // the restarted stream re-delivers batch 2: data must not duplicate,
    // and the MISSING audit row-set must land — equal to the full-rescan
    // drift between the versions the batch actually spans
    DriftStream.ingestBatch(spark, b2, data, monitor, "p",
      Seq("k", "price"), "app", 1L)
    assert(TxLog.read(spark, data).count() == b1.count() + b2.count())
    val expect = Expectations.snapshotDrift(
      TxLog.read(spark, data, v2 - 1).select("k", "price"),
      TxLog.read(spark, data, v2).select("k", "price"),
      Seq("k", "price")).withColumn("data_version", lit(v2))
    assertSameRows(
      TxLog.read(spark, monitor).filter(col("data_version") === v2), expect)
  }

  test("incremental profile: ingest cost is O(batch + state), never a data-table rescan") {
    val data = tmp("graft-drift4") + "/t"
    val monitor = tmp("graft-drift4") + "/m"
    // wide rows (poorly-compressible payload), narrow profiled column with
    // bounded cardinality — the realistic monitor shape
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("k"), (col("id") % 8).as("p"),
      (col("id") % 97).cast("double").as("price"),
      concat((0 until 8).map(i =>
        md5(concat(col("id").cast("string"), lit(s"#$i")))): _*).as("payload"))
    DriftStream.ingestBatch(spark, mk(0, 50000), data, monitor, "p",
      Seq("price"), "app", 0L)
    DriftStream.ingestBatch(spark, mk(50000, 50200), data, monitor, "p",
      Seq("price"), "app", 1L)
    val dataBytes = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(data))
    }
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
          recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      DriftStream.ingestBatch(spark, mk(50200, 50400), data, monitor, "p",
        Seq("price"), "app", 2L)
      // drain the listener bus: poll until the counters stabilize
      var last = -1L; var same = 0
      while (same < 3) {
        Thread.sleep(200)
        val cur = bytesRead.get() + recordsRead.get()
        if (cur == last) same += 1 else { same = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // the audited table holds 50,400 wide rows; the naive monitor's two
    // snapshot scans would read ~2x its row count and a data-sized byte
    // volume. The incremental ingest reads only profile-sized state.
    assert(recordsRead.get() < 10000,
      s"ingest read ${recordsRead.get()} records — data-table rescan?")
    assert(bytesRead.get() < dataBytes / 2,
      s"ingest read ${bytesRead.get()} bytes vs table footprint $dataBytes")
    // and the audit itself still landed, correct
    val v = TxLog.currentVersion(spark, data)
    val row = TxLog.read(spark, monitor)
      .filter(col("data_version") === v).collect().head
    assert(row.getAs[Long]("n_after") == 50400L)
    assert(row.getAs[Long]("ndv_after") == 97L)
  }

  test("kmvCols: sketch state stays O(k) on a key-like column; exact columns bit-for-bit untouched") {
    import graft.operators.Sketches
    val k = 16
    def batches = Seq(
      orders.filter(col("k") < 1000),
      orders.filter(col("k") >= 1000 && col("k") < 2000),
      orders.filter(col("k") >= 2000))
    // run A: unique-id column 'k' sketched, 'price' exact
    val dataA = tmp("graft-drift5") + "/t"
    val monA = tmp("graft-drift5") + "/m"
    batches.zipWithIndex.foreach { case (b, i) =>
      DriftStream.ingestBatch(spark, b, dataA, monA, "p",
        Seq("k", "price"), "app", i.toLong, kmvCols = Map("k" -> k))
      // the state for the sketched column is k-bounded per batch and
      // shrinks towards O(k) — NEVER the column's cardinality
      val st = TxLog.read(spark, monA + "__seen")
      assert(st.filter(col("col_name") === "k").count() <= (i + 1).toLong * k,
        "sketch state outgrew its k-per-batch bound")
    }
    val nKeys = orders.select("k").distinct().count()
    val stA = TxLog.read(spark, monA + "__seen")
    assert(stA.filter(col("col_name") === "k").count() <= 3L * k)
    assert(nKeys > 10L * k, "fixture too small to prove the bound")
    // exact column state unchanged by the neighbor's mode
    assert(stA.filter(col("col_name") === "price").count() ==
      orders.select("price").distinct().count())

    // the reported ndv IS the KMV estimate over everything ingested so far
    val vLast = TxLog.currentVersion(spark, dataA)
    val got = TxLog.read(spark, monA)
      .filter(col("data_version") === vLast && col("col_name") === "k")
      .head().getAs[Long]("ndv_after")
    val expect = Sketches.kmvDistinct(
      TxLog.read(spark, dataA).select(lit("k").as("col_name"),
        col("k").cast("double").as("v")),
      Seq("col_name"), "v", k).head().getAs[Double]("distinct_est").toLong
    assert(got == expect, s"monitor ndv $got != kmvDistinct $expect")
    // a k=16 sketch on thousands of keys: sane, not exact
    assert(got > nKeys / 3 && got < nKeys * 3, s"estimate $got vs $nKeys")

    // run B: no sketch anywhere — the EXACT columns' monitor rows must be
    // bit-for-bit identical between the two runs
    val dataB = tmp("graft-drift6") + "/t"
    val monB = tmp("graft-drift6") + "/m"
    batches.zipWithIndex.foreach { case (b, i) =>
      DriftStream.ingestBatch(spark, b, dataB, monB, "p",
        Seq("k", "price"), "app", i.toLong)
    }
    assertSameRows(
      TxLog.read(spark, monA).filter(col("col_name") === "price"),
      TxLog.read(spark, monB).filter(col("col_name") === "price"))
    // replay of the last batch: sketch state and monitor both no-ops
    val stRows = stA.collect().map(_.toSeq).toSet
    val monRows = TxLog.read(spark, monA).collect().map(_.toSeq).toSet
    DriftStream.ingestBatch(spark, batches.last, dataA, monA, "p",
      Seq("k", "price"), "app", 2L, kmvCols = Map("k" -> k))
    assert(TxLog.read(spark, monA + "__seen").collect()
      .map(_.toSeq).toSet == stRows)
    assert(TxLog.read(spark, monA).collect().map(_.toSeq).toSet == monRows)
  }
}
