package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion-vector semantics: row-level DELETE as a merge-on-read commit —
  * no data file rewritten, snapshot isolation preserved, CDC/count/compact/
  * clone/vacuum all DV-aware.
  */
class TxLogDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def ids(path: String, version: Long = -1L): Set[Long] =
    TxLog.read(spark, path, version).select("id").collect().map(_.getLong(0)).toSet

  private def seed(path: String): Long = TxLog.append(
    (1L to 10L).map(i => (i, s"p$i", i % 2)).toDF("id", "payload", "session_key"),
    path, "session_key", statsCols = Seq("id"))

  test("deleteWhere hides rows without touching data files; time travel sees them") {
    val path = tmp("dv")
    seed(path)
    val before = new java.io.File(path).listFiles().map(_.getName).toSet
    val v1 = TxLog.deleteWhere(spark, path, "id >= 7")
    assert(v1 == 1)
    assert(ids(path) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(ids(path, version = 0) == (1L to 10L).toSet) // pre-delete snapshot intact
    // no tx- data file was rewritten or removed — only a dv- sidecar appeared
    val after = new java.io.File(path).listFiles().map(_.getName).toSet
    assert((before -- after).isEmpty)
    assert((after -- before).forall(_.startsWith("dv-")))
    // metadata-only count reflects live rows
    assert(TxLog.fastCount(spark, path).contains(6L))
    assert(TxLog.fastCount(spark, path, version = 0).contains(10L))
  }

  test("a second delete merges per-file deleted sets; no-match delete is a no-op") {
    val path = tmp("dvmerge")
    seed(path)
    TxLog.deleteWhere(spark, path, "id = 9")
    val v2 = TxLog.deleteWhere(spark, path, "id = 7 or id = 9") // 9 already gone
    assert(v2 == 2)
    assert(ids(path) == Set(1L, 2L, 3L, 4L, 5L, 6L, 8L, 10L))
    assert(TxLog.fastCount(spark, path).contains(8L))
    // nothing new matches → no empty commit, version unchanged
    assert(TxLog.deleteWhere(spark, path, "id = 9") == 2)
    assert(TxLog.currentVersion(spark, path) == 2)
  }

  test("pruned read paths (readKey/readRange) apply deletion vectors") {
    val path = tmp("dvprune")
    seed(path)
    TxLog.deleteWhere(spark, path, "id = 4 or id = 5")
    val byKey = TxLog.readKey(spark, path, "session_key", 0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(byKey == Set(2L, 6L, 8L, 10L)) // 4 deleted
    val byRange = TxLog.readRange(spark, path, "id", BigDecimal(3), BigDecimal(6))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(byRange == Set(3L, 6L)) // 4, 5 deleted
  }

  test("a fully-deleted file drops out of the manifest") {
    val path = tmp("dvdead")
    seed(path) // session_key 0 and 1 → one file each
    TxLog.deleteWhere(spark, path, "session_key = 1")
    assert(ids(path) == Set(2L, 4L, 6L, 8L, 10L))
    // the odd-session file is gone from the snapshot, not just DV-masked
    val files = TxLog.snapshot(spark, path).files
    assert(!files.exists(_.contains("__session_key=1")))
    assert(TxLog.fastCount(spark, path).contains(5L))
  }

  test("CDC: a DV commit is not append-only, and rowChanges yields the deleted rows") {
    val path = tmp("dvcdc")
    seed(path)
    TxLog.deleteWhere(spark, path, "id = 3")
    val (added, removed) = TxLog.changesBetween(spark, path, 0, 1)
    assert(removed.nonEmpty) // incremental consumers must NOT treat this as append-only
    val changes = TxLog.rowChanges(spark, path, 0, 1)
      .select(col("id"), col("change")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((3L, "delete")))
  }

  test("compact materializes deletes; vacuum then reclaims superseded sidecars") {
    val path = tmp("dvcompact")
    seed(path)
    TxLog.deleteWhere(spark, path, "id <= 2")
    TxLog.compact(spark, path, "session_key")
    assert(ids(path) == (3L to 10L).toSet)
    // the rewrite folded the DVs away: no entry carries a __dv triple
    assert(!TxLog.snapshot(spark, path).entries.exists(_.contains(TxLog.DvCol)))
    TxLog.vacuum(spark, path) // retain latest only
    val dvLeft = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("dv-"))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .count(_.getName.endsWith(".parquet"))
    assert(dvLeft == 0) // sidecar no longer referenced by any retained version
    assert(ids(path) == (3L to 10L).toSet)
  }

  test("a shallow clone of a DV table reads the source's live rows") {
    val dir = java.nio.file.Files.createTempDirectory("dvclone").toString
    val src = dir + "/src"; val dst = dir + "/dst"
    seed(src)
    TxLog.deleteWhere(spark, src, "id > 8")
    TxLog.cloneAt(spark, src, dst)
    assert(ids(dst) == (1L to 8L).toSet)
    // clone then diverges: deleting on the clone never touches the source
    TxLog.deleteWhere(spark, dst, "id = 1")
    assert(ids(dst) == (2L to 8L).toSet)
    assert(ids(src) == (1L to 8L).toSet)
  }

  test("updateWhere rewrites matching rows in one version; old images time-travel") {
    val path = tmp("dvupd")
    seed(path)
    val v1 = TxLog.updateWhere(spark, path, "id >= 9",
      Map("payload" -> "concat(payload, '!')"))
    assert(v1 == 1)
    val got = TxLog.read(spark, path).select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(9L) == "p9!" && got(10L) == "p10!" && got(1L) == "p1")
    assert(got.size == 10) // no rows lost, none duplicated
    // pre-update snapshot unchanged
    val old = TxLog.read(spark, path, 0).select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old(9L) == "p9" && old(10L) == "p10")
    // CDC: the update is delete(old) + insert(new)
    val changes = TxLog.rowChanges(spark, path, 0, 1)
      .select(col("change"), col("id"), col("payload")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(changes == Set(("delete", 9L, "p9"), ("delete", 10L, "p10"),
      ("insert", 9L, "p9!"), ("insert", 10L, "p10!")))
  }

  test("updateWhere may move a row across partition values; no-match update is a no-op") {
    val path = tmp("dvmove")
    seed(path)
    TxLog.updateWhere(spark, path, "id = 3", Map("session_key" -> "7"))
    val moved = TxLog.read(spark, path).filter(col("id") === 3)
      .select(col("session_key").cast("long")).head().getLong(0)
    assert(moved == 7L)
    assert(TxLog.read(spark, path).count() == 10)
    val v = TxLog.currentVersion(spark, path)
    assert(TxLog.updateWhere(spark, path, "id = 999", Map("payload" -> "'x'")) == v)
    assert(TxLog.currentVersion(spark, path) == v)
  }

  test("updateWhere does not resurrect rows a prior delete masked") {
    val path = tmp("dvres")
    seed(path)
    TxLog.deleteWhere(spark, path, "id = 5")
    TxLog.updateWhere(spark, path, "id >= 4", Map("payload" -> "'u'"))
    assert(ids(path) == Set(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L)) // 5 stays dead
    val payloads = TxLog.read(spark, path).select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(payloads(4L) == "u" && payloads(3L) == "p3")
  }

  test("compactWhere: only the named partitions rewrite; DVs materialize for them") {
    val path = tmp("dvcw")
    // three appends → 3 files per partition value
    (0 until 3).foreach { i =>
      TxLog.append(
        (1L to 4L).map(j => (i * 10 + j, s"p$i$j", j % 2))
          .toDF("id", "payload", "session_key")
          .repartition(col("session_key")), // one file per value per append
        path, "session_key", statsCols = Seq("id"))
    }
    TxLog.deleteWhere(spark, path, "id = 2") // partition 0, one masked row
    def filesOf(v: String) =
      TxLog.snapshot(spark, path).files.filter(_.contains(s"__session_key=$v"))
    val before1 = filesOf("1")
    assert(filesOf("0").size == 3 && before1.size == 3)
    val all = TxLog.read(spark, path).select("id").collect().map(_.getLong(0)).toSet
    TxLog.compactWhere(spark, path, "session_key", Seq("0"))
    assert(filesOf("0").size == 1, "compacted partition → one file")
    assert(filesOf("1") == before1, "untouched partition keeps its files")
    // rows unchanged, and the compacted partition's DV is materialized
    assert(TxLog.read(spark, path).select("id").collect().map(_.getLong(0)).toSet == all)
    assert(!TxLog.snapshot(spark, path).entries
      .filter(_.contains("__session_key=0")).exists(_.contains(TxLog.DvCol)))
    // absent values are a no-op
    val v = TxLog.currentVersion(spark, path)
    assert(TxLog.compactWhere(spark, path, "session_key", Seq("99")) == v)
  }

  test("first-committer-wins: an interleaving commit aborts the delete") {
    val path = tmp("dvocc")
    seed(path)
    val v0 = TxLog.currentVersion(spark, path)
    // racing writer lands after this delete pinned its snapshot
    TxLog.append(Seq((99L, "race", 0L)).toDF("id", "payload", "session_key"),
      path, "session_key")
    intercept[TxLog.ConcurrentWriteConflict] {
      TxLog.deleteWhere(spark, path, "id = 1", expectedVersion = v0)
    }
    assert(ids(path) == (1L to 10L).toSet + 99L) // nothing was deleted
  }
}
