package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-only column rename (column mapping): zero files rewritten,
  * versioned like every other commit, consistent across appends, merges,
  * key-pruned reads, stats skipping, time travel, restore, and clone.
  */
class TxLogRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def base(path: String): Long =
    TxLog.append(
      Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 2L))
        .toDF("id", "payload", "session_key"),
      path, "session_key", statsCols = Seq("id"))

  test("rename is metadata-only: same files, new name reads, old name at old versions") {
    val path = tmp("txren")
    base(path)
    val filesBefore = TxLog.snapshot(spark, path).files.toSet
    val v1 = TxLog.renameColumn(spark, path, "payload", "body")
    assert(v1 == 1)
    assert(TxLog.snapshot(spark, path).files.toSet == filesBefore) // zero data churn
    assert(TxLog.read(spark, path).columns.toSeq ==
      Seq("id", "body", "session_key"))
    // time travel below the rename keeps the old schema
    assert(TxLog.read(spark, path, version = 0).columns.contains("payload"))
    assert(TxLog.read(spark, path).select("body").collect().map(_.getString(0)).toSet
      == Set("a", "b", "c"))
  }

  test("appends after a rename land under the new name; files stay physically consistent") {
    val path = tmp("txren2")
    base(path)
    TxLog.renameColumn(spark, path, "payload", "body")
    TxLog.append(Seq((4L, "d", 4L)).toDF("id", "body", "session_key"),
      path, "session_key", statsCols = Seq("id"))
    // non-mergeSchema read (one footer) proves every file stores ONE name
    val out = TxLog.read(spark, path)
    assert(out.columns.toSeq == Seq("id", "body", "session_key"))
    assert(out.select("body").collect().map(_.getString(0)).toSet ==
      Set("a", "b", "c", "d"))
    // identity continuation reads the renamed stats column correctly
    assert(TxLog.fastCount(spark, path).contains(4L))
  }

  test("renaming the partition column keeps key-pruned reads and merges working") {
    val path = tmp("txren3")
    base(path)
    TxLog.renameColumn(spark, path, "session_key", "sk")
    val two = TxLog.readKey(spark, path, "sk", 2L)
    assert(two.count() == 2)
    assert(two.columns.contains("sk"))
    TxLog.mergeKeys(Seq((2L, "B2", 2L)).toDF("id", "payload", "sk")
        .withColumnRenamed("payload", "payload"),
      path, "sk", Seq("id"))
    assert(TxLog.readKey(spark, path, "sk", 2L)
      .filter(col("id") === 2L).select("payload").head().getString(0) == "B2")
  }

  test("stats/range reads translate the renamed column; deleteWhere speaks logical") {
    val path = tmp("txren4")
    base(path)
    TxLog.renameColumn(spark, path, "id", "row_key")
    assert(TxLog.readRange(spark, path, "row_key", BigDecimal(2), BigDecimal(3))
      .count() == 2)
    TxLog.deleteWhere(spark, path, "row_key = 2")
    assert(TxLog.read(spark, path).count() == 2)
    assert(TxLog.read(spark, path).columns.contains("row_key"))
  }

  test("restore rolls a rename back; clone inherits the mapping; compact materializes it") {
    val path = tmp("txren5")
    base(path)
    val vRen = TxLog.renameColumn(spark, path, "payload", "body")
    val clonePath = tmp("txren5c")
    TxLog.cloneAt(spark, path, clonePath)
    assert(TxLog.read(spark, clonePath).columns.contains("body"))
    // compact rewrites files under the logical names and drops the mapping
    TxLog.compact(spark, path, "session_key")
    assert(TxLog.snapshot(spark, path).renames.isEmpty)
    assert(TxLog.read(spark, path).columns.toSeq ==
      Seq("id", "body", "session_key"))
    // restore to the pre-compact rename version still reads `body`
    TxLog.restore(spark, path, vRen)
    assert(TxLog.read(spark, path).columns.contains("body"))
    // and restoring to v0 resurfaces the original name
    TxLog.restore(spark, path, 0L)
    assert(TxLog.read(spark, path).columns.contains("payload"))
  }

  test("a batch written under the OLD physical name is rejected after a rename") {
    val path = tmp("txren7")
    base(path)
    TxLog.renameColumn(spark, path, "payload", "body")
    intercept[IllegalArgumentException] { // stale writer still says 'payload'
      TxLog.append(Seq((4L, "d", 4L)).toDF("id", "payload", "session_key"),
        path, "session_key")
    }
    // nothing committed; the logical-name write still works
    assert(TxLog.read(spark, path).count() == 3)
    TxLog.append(Seq((4L, "d", 4L)).toDF("id", "body", "session_key"),
      path, "session_key")
    assert(TxLog.read(spark, path).count() == 4)
  }

  test("rename validation: missing source, existing target, physical shadowing") {
    val path = tmp("txren6")
    base(path)
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "payload", "id")
    }
    TxLog.renameColumn(spark, path, "payload", "body")
    // 'payload' is now free as a LOGICAL name but still the physical name
    // behind 'body' — a second column may not take it
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "id", "payload")
    }
    // renaming 'body' back to its physical name just drops the mapping
    TxLog.renameColumn(spark, path, "body", "payload")
    assert(TxLog.snapshot(spark, path).renames.isEmpty)
    assert(TxLog.read(spark, path).columns.contains("payload"))
  }
}
