package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stream-stream interval join (attribution): the streaming operator against
  * its batch twin on real event data, plus last-touch semantics pinned on a
  * hand-built frame.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val WindowUs = 30L * 60 * 1000000

  private def evs = Tables.events(spark, "/root/testdata/sf0.001")

  private def views = evs.filter(col("event_type") === "view")
    .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))
  private def purchases = evs.filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))

  test("last-touch credits the latest in-window view; ties break by view id") {
    val v = Seq(
      (10L, 1L, 1000L), (11L, 1L, 2000L), (12L, 1L, 2000L), // tie at 2000
      (13L, 2L, 1000L),
      (14L, 3L, 1000L) // out of window for u3's purchase
    ).toDF("event_id", "user_id", "ts_us")
    val p = Seq(
      (20L, 1L, 2500L), // in-window: views 10/11/12 → latest ts 2000, tie → id 12
      (21L, 2L, 900L),  // purchase BEFORE the view → no credit
      (22L, 3L, 1000L + WindowUs + 1L) // just outside the window
    ).toDF("event_id", "user_id", "ts_us")
    val got = Attribution.lastTouchBatch(v, p, WindowUs)
      .select("purchase_id", "view_id", "delay_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((20L, 12L, 500L)))
    // boundary: exactly windowUs late IS in window
    val pEdge = Seq((23L, 3L, 1000L + WindowUs)).toDF("event_id", "user_id", "ts_us")
    assert(Attribution.lastTouchBatch(v, pEdge, WindowUs).count() == 1)
  }

  test("linear multi-touch: in-window views split the credit 1/n; totals conserve") {
    val v = Seq((10L, 1L, 1000L), (11L, 1L, 2000L), (12L, 2L, 1000L))
      .toDF("event_id", "user_id", "ts_us")
    val p = Seq((20L, 1L, 2500L), (21L, 1L, 3000L), (22L, 2L, 1500L))
      .toDF("event_id", "user_id", "ts_us")
    val got = Attribution.linearTouchBatch(v, p, WindowUs)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    // u1: both purchases see both views → each view gets 0.5 + 0.5 = 1.0
    // u2: single view takes purchase 22 wholly
    assert(got == Map(10L -> (1.0, 2L), 11L -> (1.0, 2L), 12L -> (1.0, 1L)))
    // credit mass conservation: Σ credit = number of attributed purchases
    assert(math.abs(got.values.map(_._1).sum - 3.0) < 1e-12)
  }

  test("left-outer stream: unattributed purchases surface as NULL-view rows after the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("attrlo").toString
    val base = 1700000000000000L // fixed epoch-µs anchor
    def ts(us: Long) = expr(s"timestamp_micros(${base + us})")
    // user 1: attributed; user 2: purchase with NO preceding view
    val v1 = Seq((10L, 1L)).toDF("event_id", "user_id")
      .withColumn("ts", ts(0L))
    val p1 = Seq((20L, 1L)).toDF("event_id", "user_id")
      .withColumn("ts", ts(60L * 1000000))
      .unionByName(Seq((21L, 2L)).toDF("event_id", "user_id")
        .withColumn("ts", ts(90L * 1000000)))
    v1.write.parquet(s"$dir/v")
    p1.write.parquet(s"$dir/p")
    // a second file per side, one day later, exists ONLY to advance the
    // watermark so the held-back outer row is released (outer emission is
    // watermark-gated; without a later batch it would stay in state)
    Seq((90L, 9L)).toDF("event_id", "user_id")
      .withColumn("ts", ts(86400L * 1000000)).write.mode("append").parquet(s"$dir/v")
    Seq((91L, 9L)).toDF("event_id", "user_id")
      .withColumn("ts", ts(86400L * 1000000)).write.mode("append").parquet(s"$dir/p")
    val schema = spark.read.parquet(s"$dir/v").schema
    val vStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/v")
    val pStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/p")
    val q = Attribution.attributionLeftStream(
        vStream, pStream, "30 minutes", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_lo").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_lo")
      .select(col("purchase_id"),
        when(col("view_id").isNull, -1L).otherwise(col("view_id")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // purchase 20 matched view 10; purchase 21 emitted with NULL view
    assert(got.contains((20L, 10L)))
    assert(got.contains((21L, -1L)), s"unattributed row missing: $got")
    // and the matched purchase did NOT also emit a null row
    assert(!got.contains((20L, -1L)))
  }

  test("stream-stream interval join emits exactly the batch pairs (memory sink)") {
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    val vTs = views.select(col("event_id"), col("user_id"),
      expr("timestamp_micros(ts_us)").as("ts"))
    val pTs = purchases.select(col("event_id"), col("user_id"),
      expr("timestamp_micros(ts_us)").as("ts"))
    vTs.write.parquet(s"$dir/v")
    pTs.write.parquet(s"$dir/p")
    val vStream = spark.readStream.schema(vTs.schema).parquet(s"$dir/v")
    val pStream = spark.readStream.schema(pTs.schema).parquet(s"$dir/p")
    val q = Attribution.attributionPairsStream(vStream, pStream, "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_out")
      .select(col("purchase_id"), col("view_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Attribution.attributionPairsBatch(views, purchases, WindowUs)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
