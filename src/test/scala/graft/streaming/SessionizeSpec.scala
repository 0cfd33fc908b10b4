package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import graft.streaming.Sessionize.{Ev, SessionOut}
import org.apache.spark.sql.functions._

/** Stateful sessionization: the flatMapGroupsWithState operator against its
  * window-based batch twin, in batch-execution mode and as a real stream.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 30L * 60 * 1000000

  private def evs = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("ts_us"), col("value"))

  /** batch sessions minus each user's LAST session (which the stateful
    * operator keeps open in state).
    */
  private def expectedClosed: Set[(Long, Long, Long, Long)] = {
    val batch = Sessionize.sessionizeBatch(evs, GapUs)
    val lastIdx = batch.groupBy("user_id").agg(max("session_idx").as("mx"))
    batch.join(lastIdx, Seq("user_id"))
      .filter(col("session_idx") =!= col("mx"))
      .select("user_id", "n_events", "start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("flatMapGroupsWithState (batch mode) emits exactly the closed sessions") {
    val got = Sessionize.sessionizeStream(evs.as[Ev], GapUs).collect()
      .map(s => (s.user_id, s.n_events, s.start_us, s.end_us)).toSet
    assert(got == expectedClosed)
    assert(got.nonEmpty)
  }

  test("same operator as a real stream (memory sink)") {
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    evs.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(evs.schema).parquet(s"$dir/in").as[Ev]
    val q = Sessionize.sessionizeStream(stream, GapUs).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"))).toSet
    // single micro-batch → the same closed set as batch-mode execution
    assert(got == expectedClosed)
  }
}
