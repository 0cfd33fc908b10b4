package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Streaming funnel vs the batch DP on real events: identical converted-user
  * sets and first-completion times, with the stream fed in multiple files
  * so state carries chains across micro-batches.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming funnel equals the batch twin; state carries across batches") {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    val w = 24L * 3600 * 1000000
    val steps = Seq("view", "click", "purchase")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1): org.apache.spark.sql.Column) { case (e, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(e) }
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), stepIdx.as("step"))
    // two time-ordered files: chains that START in file 1 must complete in
    // file 2 through carried state, not batch-local recomputation
    val cut = ev.agg(expr("percentile(ts_us, 0.5D)")).head().getDouble(0).toLong
    // one part file per side: a split part would let a key's earlier events
    // land in a LATER micro-batch, violating the cross-batch order contract
    ev.filter(col("ts_us") <= cut).coalesce(1).write.parquet(s"$dir/in/p1")
    ev.filter(col("ts_us") > cut).coalesce(1).write.parquet(s"$dir/in/p2")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      .as[FunnelStream.Ev]
    val q = FunnelStream.funnelStream(stream, k = 3, windowUs = w)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnel_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = Analytics.funnelMatch(
      Tables.events(spark, "/root/testdata/sf0.001").select(col("user_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("event_type")),
      "user_id", "ts_us", "event_id", "event_type", steps, w)
      .filter(col("converted"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(want.nonEmpty)
    assert(got == want)
    // exactly one emission per converted user (Append-mode contract)
    assert(spark.table("funnel_out").count() == got.size)
  }

  test("streaming funnel with blockers equals q198's batch negation DP") {
    val dir = java.nio.file.Files.createTempDirectory("funnelneg").toString
    val w = 24L * 3600 * 1000000
    val steps = Seq("view", "click", "purchase")
    val k = steps.length
    // the batch DP's sentinel: steps 0..k-1, blockers k — same mapping here
    val stepIdx = (steps.zipWithIndex :+ ("error" -> k))
      .foldLeft(lit(-1): org.apache.spark.sql.Column) { case (e, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(e) }
    // real events + two synthetic users pinning the bite deterministically
    // (on sf0.001 the organic chains all re-arm around the errors — see the
    // batch NOT-EXISTS spec): -1 is blocked mid-chain, -2 converts
    val synthetic = Seq(
      (-1L, 1L, 1000L, "view"), (-1L, 2L, 2000L, "click"),
      (-1L, 3L, 2500L, "error"), (-1L, 4L, 3000L, "purchase"),
      (-2L, 5L, 1000L, "view"), (-2L, 6L, 2000L, "click"),
      (-2L, 7L, 3000L, "purchase"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val base = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .unionByName(synthetic)
    val ev = base
      .filter(col("event_type").isin(steps :+ "error": _*))
      .select(col("user_id"), col("event_id"), col("ts_us"), stepIdx.as("step"))
    val cut = ev.agg(expr("percentile(ts_us, 0.5D)")).head().getDouble(0).toLong
    ev.filter(col("ts_us") <= cut).coalesce(1).write.parquet(s"$dir/in/p1")
    ev.filter(col("ts_us") > cut).coalesce(1).write.parquet(s"$dir/in/p2")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      .as[FunnelStream.Ev]
    val q = FunnelStream.funnelStream(stream, k = k, windowUs = w)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_neg_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnel_neg_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = Analytics.funnelMatch(base,
      "user_id", "ts_us", "event_id", "event_type", steps, w,
      blockers = Seq("error"))
      .filter(col("converted"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(want.nonEmpty)
    assert(got == want)
    // the bite, pinned: -1's chain dies at its mid-chain error (it would
    // convert in the positive pattern), -2 converts
    assert(!got.contains(-1L))
    assert(got(-2L) == 3000L)
    val positive = Analytics.funnelMatch(base,
      "user_id", "ts_us", "event_id", "event_type", steps, w)
      .filter(col("converted")).count()
    assert(want.size < positive,
      s"blockers blocked nothing: $positive positive vs ${want.size} with negation")
  }
}
