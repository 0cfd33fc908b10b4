package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-only DROP COLUMN: zero files rewritten, versioned, appends
  * blocked from resurrecting the name, materialized by compact/overwrite.
  */
class TxLogDropColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def base(path: String): Long =
    TxLog.append(
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 2L))
        .toDF("id", "payload", "score", "session_key"),
      path, "session_key")

  test("drop is metadata-only; time travel and restore resurrect the column") {
    val path = tmp("txdrop")
    base(path)
    val filesBefore = TxLog.snapshot(spark, path).files.toSet
    val v1 = TxLog.dropColumn(spark, path, "score")
    assert(TxLog.snapshot(spark, path).files.toSet == filesBefore)
    assert(TxLog.read(spark, path).columns.toSeq ==
      Seq("id", "payload", "session_key"))
    assert(TxLog.read(spark, path, version = 0).columns.contains("score"))
    TxLog.restore(spark, path, 0L)
    assert(TxLog.read(spark, path).columns.contains("score"))
    TxLog.restore(spark, path, v1)
    assert(!TxLog.read(spark, path).columns.contains("score"))
  }

  test("appends without the column land cleanly; re-introducing it is rejected") {
    val path = tmp("txdrop2")
    base(path)
    TxLog.dropColumn(spark, path, "score")
    TxLog.append(Seq((3L, "c", 3L)).toDF("id", "payload", "session_key"),
      path, "session_key")
    assert(TxLog.read(spark, path).count() == 3)
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((4L, "d", 4.0, 4L))
        .toDF("id", "payload", "score", "session_key"), path, "session_key")
    }
    // compact materializes the drop and frees the name again
    TxLog.compact(spark, path, "session_key")
    assert(TxLog.snapshot(spark, path).drops.isEmpty)
    TxLog.append(Seq((4L, "d", 4.0, 4L))
      .toDF("id", "payload", "score", "session_key"), path, "session_key")
    // merged read: old files have no physical 'score' → NULLs, new row has it
    val m = TxLog.readMerged(spark, path)
    assert(m.filter(col("id") === 4L).select("score").head().getDouble(0) == 4.0)
    assert(m.filter(col("score").isNull).count() == 3)
  }

  test("drop of a RENAMED column resolves to the physical name; guards hold") {
    val path = tmp("txdrop3")
    base(path)
    TxLog.renameColumn(spark, path, "score", "quality")
    TxLog.dropColumn(spark, path, "quality")
    assert(TxLog.read(spark, path).columns.toSeq ==
      Seq("id", "payload", "session_key"))
    assert(TxLog.snapshot(spark, path).renames.isEmpty) // mapping cleaned up
    intercept[IllegalArgumentException] { // partition column protected
      TxLog.dropColumn(spark, path, "session_key")
    }
    intercept[IllegalArgumentException] { // unknown column
      TxLog.dropColumn(spark, path, "nope")
    }
    // deleteWhere over the narrowed schema still works
    TxLog.deleteWhere(spark, path, "id = 1")
    assert(TxLog.read(spark, path).count() == 1)
  }
}
