package graft.sources

import graft.SparkSpec

/** Per-version operation labels (`DESCRIBE HISTORY` operationName): each
  * commit path stamps its `#op` annotation; snapshot resolution ignores it
  * (annotations never replicate into later versions).
  */
class OperationHistorySpec extends SparkSpec {
  import spark.implicits._

  test("every commit path stamps its operation; reads are unaffected") {
    val path = java.nio.file.Files.createTempDirectory("txops").toString + "/t"
    TxLog.append(Seq((1L, "a", 1L), (2L, "b", 2L))
      .toDF("id", "payload", "session_key"), path, "session_key",
      statsCols = Seq("id"))
    TxLog.mergeKeys(Seq((2L, "B", 2L)).toDF("id", "payload", "session_key"),
      path, "session_key", Seq("id"))
    TxLog.deleteWhere(spark, path, "id = 1")
    TxLog.renameColumn(spark, path, "payload", "body")
    TxLog.restore(spark, path, 1L)
    TxLog.compact(spark, path, "session_key")
    val ops = TxLog.operationHistory(spark, path).toMap
    assert(ops == Map(0L -> "APPEND", 1L -> "MERGE", 2L -> "DELETE",
      3L -> "RENAME-COLUMN", 4L -> "RESTORE", 5L -> "COMPACT"))
    // annotations are per-version: the restored/compacted table still reads
    assert(TxLog.read(spark, path).count() == 2)
    // and time travel across annotated versions still resolves
    assert(TxLog.read(spark, path, version = 2).count() == 1)
  }
}
