package graft.sources

import graft.SparkSpec
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Sink semantics (S3-S7) + the Structured Streaming path of SURVEY §2.10. */
class SinksAndStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("idempotentAppend skips already-loaded keys (S7/J3)") {
    val path = tmp("idem")
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("session_key", "payload")
    Sinks.idempotentAppend(spark, batch1, path, "session_key")
    // second batch overlaps on key 2 — only key 3 may land
    val batch2 = Seq((2L, "b2"), (3L, "c")).toDF("session_key", "payload")
    Sinks.idempotentAppend(spark, batch2, path, "session_key")
    val out = spark.read.parquet(path)
    assert(out.count() == 3)
    assert(out.filter($"session_key" === 2).head().getAs[String]("payload") == "b")
  }

  test("replaceByKey overwrites exactly the touched partitions (S6)") {
    val path = tmp("repl")
    Sinks.appendPartitioned(
      Seq((1L, "old1"), (2L, "old2")).toDF("session_key", "payload"), path, "session_key")
    Sinks.replaceByKey(
      Seq((2L, "new2a"), (2L, "new2b")).toDF("session_key", "payload"), path, "session_key")
    val out = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("session_key"), r.getAs[String]("payload"))).toSet
    assert(out == Set((1L, "old1"), (2L, "new2a"), (2L, "new2b")))
  }

  test("compact rewrites many small files into few, data intact") {
    val path = tmp("compact") + "/t"
    (1 to 10).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v").write.mode("append").parquet(path)
    }
    val before = spark.read.parquet(path)
    val beforeRows = before.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq
    Sinks.compact(spark, path, targetFileMB = 256)
    val fs = new java.io.File(path)
    val nParquet = fs.listFiles().count(_.getName.endsWith(".parquet"))
    assert(nParquet == 1, s"expected 1 compacted file, got $nParquet")
    val after = spark.read.parquet(path).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq
    assert(after == beforeRows)
  }

  test("compact crash points all leave a complete recoverable copy") {
    def freshTable(): String = {
      val path = tmp("crash") + "/t"
      (1 to 4).foreach { i =>
        Seq((i.toLong, s"v$i")).toDF("k", "v").write.mode("append").parquet(path)
      }
      path
    }
    def rows(path: String) = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = (1 to 4).map(i => (i.toLong, s"v$i")).toSet

    // crash point A: tmp written (possibly half-written), renames never ran
    val a = freshTable()
    Seq((99L, "junk")).toDF("k", "v").write.parquet(a + "__compacting")
    Sinks.recoverCompact(spark, a)
    assert(rows(a) == expect) // live dir untouched, stale tmp dropped
    assert(!new java.io.File(a + "__compacting").exists)

    // crash point B: between the two renames — path gone, complete tmp +
    // old both present; recovery must promote the tmp copy
    val b = freshTable()
    val fs = new java.io.File(b)
    spark.read.parquet(b).coalesce(1).write.parquet(b + "__compacting")
    assert(fs.renameTo(new java.io.File(b + "__old")))
    Sinks.recoverCompact(spark, b)
    assert(rows(b) == expect)
    assert(!new java.io.File(b + "__old").exists)

    // crash point C: after swap, before the final delete of __old
    val c = freshTable()
    spark.read.parquet(c).coalesce(1).write.parquet(c + "__new")
    assert(new java.io.File(c).renameTo(new java.io.File(c + "__old")))
    assert(new java.io.File(c + "__new").renameTo(new java.io.File(c)))
    Sinks.recoverCompact(spark, c)
    assert(rows(c) == expect)
    assert(!new java.io.File(c + "__old").exists)

    // and a plain compact on a recovered table still works end-to-end
    Sinks.compact(spark, c, targetFileMB = 256)
    assert(rows(c) == expect)
  }

  test("jsonFixtures: malformed lines and absent fields degrade to NULLs, never throw (S1/S2)") {
    import org.apache.spark.sql.types._
    val dir = tmp("json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"session_key": 1, "driver_number": 44, "gap": "1.2"}
        |{"session_key": 2, "driver_number": "not-a-number", "gap": "2.0"}
        |this line is not JSON at all
        |{"session_key": 3}
        |{"session_key": 4, "driver_number": 63, "gap": null, "extra_field": true}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("session_key", LongType), StructField("driver_number", LongType),
      StructField("gap", StringType)))
    val got = Tables.jsonFixtures(spark, schema, s"$dir/in.jsonl")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    // well-formed rows parse; a type-mismatched FIELD nulls only itself
    // under PERMISSIVE (the rest of the record survives); the garbage line
    // becomes an all-NULL row; absent fields are NULL; undeclared fields
    // are dropped — ingestion never throws
    assert(got == Set(
      (Some(1L), Some(44L), Some("1.2")),
      (Some(2L), None, Some("2.0")),
      (None, None, None),
      (Some(3L), None, None),
      (Some(4L), Some(63L), None)))
  }

  test("readMergedSchema tolerates additive drift (S5)") {
    val path = tmp("drift") + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(path)
    Seq((2L, "b", 9.0)).toDF("k", "v", "extra").write.mode("append").parquet(path)
    val merged = Sinks.readMergedSchema(spark, path)
    assert(merged.columns.toSet == Set("k", "v", "extra"))
    assert(merged.filter($"k" === 1).head().isNullAt(2))
  }

  test("bucketed tables join WITHOUT a shuffle (co-located layout)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Sinks.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Sinks.writeBucketed(ord, "b_orders", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every line has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("streaming hourly agg matches the batch twin on the same data") {
    val dataDir = tmp("evdata")
    val ev = Tables.events(spark, "/root/testdata/sf0.001").limit(300)
    ev.write.parquet(s"$dataDir/part1")
    val stream = EventsStream.readEventsStream(spark, ev.schema, s"$dataDir/part1")
    val agg = EventsStream.hourlyAgg(stream, watermarkDelay = "0 seconds")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hourly_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hourly_out")
    val expected = ev.groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
    // append mode emits only watermark-closed windows; with a 0s watermark the
    // final window may be withheld — every emitted row must match batch exactly
    val exp = expected.collect().map(_.toSeq.map(String.valueOf)).toSet
    val gotRows = got.collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(gotRows.nonEmpty)
    assert(gotRows.subsetOf(exp))
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val dataDir = tmp("evdup")
    val ev = Tables.events(spark, "/root/testdata/sf0.001").limit(50)
    ev.unionByName(ev).write.parquet(s"$dataDir/in") // every event twice
    val stream = EventsStream.readEventsStream(
      spark, ev.schema, s"$dataDir/in")
    val q = EventsStream.dedupedStream(stream, "1 hour").writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out")
    assert(got.count() == got.select("event_id").distinct().count())
  }

  test("foreachBatch session-replace sink lands per-key partitions (S6 streaming)") {
    val dataDir = tmp("evsink")
    val outPath = tmp("evout")
    val ev = Tables.events(spark, "/root/testdata/sf0.001").limit(100)
    ev.write.parquet(s"$dataDir/in")
    val stream = EventsStream.readEventsStream(spark, ev.schema, s"$dataDir/in")
    val q = EventsStream.sessionReplaceSink(stream, outPath, tmp("ckpt"))
    q.awaitTermination()
    val out = spark.read.parquet(outPath)
    assert(out.count() == 100)
    assert(out.select("user_id").distinct().count() ==
      ev.select("user_id").distinct().count())
  }
}
