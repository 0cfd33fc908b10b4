package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-schema edge cases flagged in the round-4 advisory: CDC spans
  * crossing rename/drop commits, rename collision against physical names
  * that exist only in later schema eras, UPDATE images passing the same
  * generated/CHECK gate as appends, and history timestamps that stay
  * strictly ordered on coarse-mtime filesystems.
  */
class TxLogMetadataEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("rowChanges spans a rename commit: both sides surface the TO schema") {
    val path = tmp("cdcren")
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 2L))
      .toDF("id", "payload", "session_key"), path, "session_key")
    TxLog.renameColumn(spark, path, "payload", "body")
    TxLog.append(Seq((3L, "c", 1L)).toDF("id", "body", "session_key"),
      path, "session_key")
    // v0 -> latest crosses the rename: the span must diff under the TO
    // snapshot's logical names instead of throwing on payload-vs-body
    val ch = TxLog.rowChanges(spark, path, 0)
    assert(ch.columns.contains("body") && !ch.columns.contains("payload"))
    val rows = ch.select("id", "body", "change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((3L, "c", "insert")))
  }

  test("rowChanges spans a replace after a rename: removed side logicalizes forward") {
    val path = tmp("cdcren2")
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 2L))
      .toDF("id", "payload", "session_key"), path, "session_key")
    TxLog.renameColumn(spark, path, "payload", "body")
    // replaceKeys REMOVES the partition-1 file written before the rename:
    // the removed side must rename its physical column forward to `body`
    TxLog.replaceKeys(Seq((1L, "A", 1L)).toDF("id", "body", "session_key"),
      path, "session_key")
    val rows = TxLog.rowChanges(spark, path, 1)
      .select("id", "body", "change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1L, "a", "delete"), (1L, "A", "insert")))
  }

  test("rowChanges spans a drop-column commit and a width-drifted append") {
    val path = tmp("cdcdrop")
    TxLog.append(Seq((1L, "a", "x", 1L), (2L, "b", "y", 2L))
      .toDF("id", "payload", "note", "session_key"), path, "session_key")
    TxLog.dropColumn(spark, path, "note")
    TxLog.append(Seq((3L, "c", 1L)).toDF("id", "payload", "session_key"),
      path, "session_key")
    val ch = TxLog.rowChanges(spark, path, 0)
    assert(!ch.columns.contains("note"))
    assert(ch.select("id", "change").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((3L, "insert")))
  }

  test("renameColumn rejects a target shadowing a physical name from a LATER schema era") {
    val path = tmp("renera")
    TxLog.append(Seq((1L, "a", 1L)).toDF("id", "payload", "session_key"),
      path, "session_key")
    // drifted append: `extra` exists physically ONLY in the second file;
    // dropping it removes the LOGICAL name but the physical column stays
    // in that file — the head-footer-only guard missed exactly this era
    TxLog.appendFlat(Seq((2L, "b", 2L, "e2"))
      .toDF("id", "payload", "session_key", "extra"), path)
    TxLog.dropColumn(spark, path, "extra")
    val ex = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "payload", "extra")
    }
    assert(ex.getMessage.contains("physical name"))
    // and the table still reads coherently under the old names
    assert(TxLog.readMerged(spark, path).columns.contains("payload"))
  }

  test("updateWhere regenerates GENERATED columns from the post-SET row") {
    val path = tmp("updgen")
    TxLog.setGeneratedColumn(spark, path, "bucket", "id div 10")
    TxLog.append(Seq((1L, "a"), (11L, "b"), (21L, "c")).toDF("id", "payload"),
      path, "bucket")
    // moving id 11 -> 45 must recompute bucket 1 -> 4, not keep the stale 1
    TxLog.updateWhere(spark, path, "id = 11", Map("id" -> "45"))
    val got = TxLog.read(spark, path).select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 45L -> 4L, 21L -> 2L))
  }

  test("updateWhere validates explicit generated values and CHECK constraints pre-commit") {
    val path = tmp("updval")
    TxLog.setGeneratedColumn(spark, path, "bucket", "id div 10")
    TxLog.append(Seq((1L, "a"), (11L, "b")).toDF("id", "payload"), path, "bucket")
    TxLog.setConstraint(spark, path, "pos_id", "id >= 0")
    val v = TxLog.currentVersion(spark, path)
    // explicitly-set generated value disagreeing with the expression: reject
    intercept[TxLog.ConstraintViolation] {
      TxLog.updateWhere(spark, path, "id = 11", Map("bucket" -> "99"))
    }
    // CHECK violation smuggled through an UPDATE image: reject
    intercept[TxLog.ConstraintViolation] {
      TxLog.updateWhere(spark, path, "id = 11", Map("id" -> "-5"))
    }
    assert(TxLog.currentVersion(spark, path) == v) // table untouched
    assert(TxLog.read(spark, path).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 11L))
  }

  test("history timestamps are strictly increasing even when manifest mtimes collide") {
    import org.apache.hadoop.fs.Path
    val path = tmp("histmono")
    val df = Seq((1L, 1L)).toDF("id", "b")
    TxLog.append(df, path, "b")
    TxLog.append(Seq((2L, 1L)).toDF("id", "b"), path, "b")
    TxLog.append(Seq((3L, 1L)).toDF("id", "b"), path, "b")
    // simulate a coarse-mtime filesystem: force all three manifests to the
    // same stamp, the worst case a 1 s-granularity store can produce
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = 1700000000000L
    (0L to 2L).foreach { v =>
      fs.setTimes(new Path(s"$path/_graft_log/" + f"$v%020d"), stamp, -1L)
    }
    val h = TxLog.history(spark, path)
    assert(h.map(_._2) == Seq(stamp, stamp + 1, stamp + 2))
    // TIMESTAMP AS OF each commit's reported time resolves to THAT version
    h.foreach { case (v, ts, _, _) =>
      assert(TxLog.versionAsOf(spark, path, ts).contains(v))
    }
  }
}
