package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC APPLY CHANGES INTO semantics on the transaction log: winner-per-key
  * folding, idempotent replay, partition-emptying deletes, snapshot
  * isolation and first-committer-wins concurrency.
  */
class TxLogCdcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def seed(path: String): Long = TxLog.overwrite(
    (1L to 8L).map(i => (i, s"v$i", i % 2)).toDF("k", "payload", "b"),
    path, "b")

  private def state(path: String, version: Long = -1L): Map[Long, String] =
    TxLog.read(spark, path, version).select("k", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def feedDf(rows: Seq[(Long, String, Long, Long, String)]) =
    rows.toDF("k", "payload", "b", "seq", "op")

  test("winner-per-key: out-of-order upsert/delete resolve by (seq, op)") {
    val path = tmp("cdc")
    seed(path)
    val feed = feedDf(Seq(
      (1L, "new1", 1L, 2L, "upsert"),   // plain update
      (2L, null, 0L, 1L, "delete"),     // plain delete
      (3L, "stale3", 1L, 1L, "upsert"), // loses to the later delete…
      (3L, null, 1L, 2L, "delete"),
      (4L, null, 0L, 1L, "delete"),     // …and the reverse order wins back
      (4L, "late4", 0L, 2L, "upsert"),
      (9L, "ins9", 1L, 1L, "upsert"),   // fresh insert
      (5L, "tie-up", 1L, 3L, "upsert"), // exact seq tie → upsert wins
      (5L, null, 1L, 3L, "delete")))
    TxLog.applyChanges(feed, path, "b", Seq("k"), "seq", "op")
    assert(state(path) == Map(
      1L -> "new1", 4L -> "late4", 5L -> "tie-up", 6L -> "v6", 7L -> "v7",
      8L -> "v8", 9L -> "ins9"))
    // pre-apply snapshot intact (snapshot isolation)
    assert(state(path, version = 0) == (1L to 8L).map(i => i -> s"v$i").toMap)
  }

  test("replaying the same feed is a row-level no-op (at-least-once safety)") {
    val path = tmp("cdc-idem")
    seed(path)
    val feed = feedDf(Seq(
      (1L, "new1", 1L, 1L, "upsert"), (2L, null, 0L, 1L, "delete")))
    val v1 = TxLog.applyChanges(feed, path, "b", Seq("k"), "seq", "op")
    val s1 = state(path)
    val v2 = TxLog.applyChanges(feed, path, "b", Seq("k"), "seq", "op")
    assert(v2 == v1 + 1)     // a commit happened…
    assert(state(path) == s1) // …but the rows are identical
  }

  test("a partition whose rows all die is rewritten to empty") {
    val path = tmp("cdc-empty")
    seed(path) // partition b=0 holds keys 2,4,6,8
    val feed = feedDf(Seq(2L, 4L, 6L, 8L).map(k => (k, null: String, 0L, 1L, "delete")))
    TxLog.applyChanges(feed, path, "b", Seq("k"), "seq", "op")
    assert(state(path).keySet == Set(1L, 3L, 5L, 7L))
    assert(TxLog.read(spark, path).filter(col("b") === 0).count() == 0)
  }

  test("stale expectedVersion aborts (first-committer-wins)") {
    val path = tmp("cdc-occ")
    val v0 = seed(path)
    TxLog.appendFlat((100L to 101L).map(i => (i, s"v$i", 1L))
      .toDF("k", "payload", "b"), path) // racing commit
    val feed = feedDf(Seq((1L, "x", 1L, 1L, "upsert")))
    intercept[TxLog.ConcurrentWriteConflict] {
      TxLog.applyChanges(feed, path, "b", Seq("k"), "seq", "op",
        expectedVersion = v0)
    }
  }
}
