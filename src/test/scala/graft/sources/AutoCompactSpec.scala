package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TxLog.maybeCompact]]: the manifest-count trigger, the partition-scoped
  * rewrite, the no-op fast path, and the yield-on-race rule.
  */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("autocompact").toString + "/t"

  private def filesPerSeg(path: String): Map[String, Int] =
    TxLog.snapshot(spark, path).files
      .groupBy(_.split('/').find(_.startsWith("__b=")).getOrElse(""))
      .view.mapValues(_.size).toMap

  test("under the threshold: no-op, version unchanged") {
    val path = tmp()
    (0 until 3).foreach(i =>
      TxLog.append(Seq((i.toLong, 1L)).toDF("id", "b"), path, "b"))
    val v = TxLog.currentVersion(spark, path)
    assert(TxLog.maybeCompact(spark, path, "b", maxFilesPerPartition = 8).isEmpty)
    assert(TxLog.currentVersion(spark, path) == v)
  }

  test("over the threshold: only the offending partition rewrites; rows exact") {
    val path = tmp()
    // partition 1 accumulates 10 single-row files; partition 2 gets two
    (0 until 10).foreach(i =>
      TxLog.append(Seq((i.toLong, 1L)).toDF("id", "b"), path, "b"))
    (0 until 2).foreach(i =>
      TxLog.append(Seq((100L + i, 2L)).toDF("id", "b"), path, "b"))
    val before = filesPerSeg(path)
    assert(before("__b=1") == 10 && before("__b=2") == 2, before.toString)
    val v = TxLog.maybeCompact(spark, path, "b", maxFilesPerPartition = 8)
    assert(v.nonEmpty)
    val after = filesPerSeg(path)
    assert(after("__b=1") == 1, s"offending partition must pack to 1: $after")
    assert(after("__b=2") == 2, s"healthy partition must pass through: $after")
    val ids = TxLog.read(spark, path).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == ((0L until 10L) ++ Seq(100L, 101L)).toSet)
    // policy satisfied now: the next call is a no-op
    assert(TxLog.maybeCompact(spark, path, "b", maxFilesPerPartition = 8).isEmpty)
    // pre-compaction version still time-travels to the same rows
    val pre = TxLog.read(spark, path, v.get - 1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(pre == ids)
  }

  test("mixed-era table (flat + partitioned files): falls back to full compact") {
    val path = tmp()
    (0 until 10).foreach(i =>
      TxLog.appendFlat(Seq((i.toLong, 1L)).toDF("id", "b"), path))
    TxLog.append(Seq((100L, 2L)).toDF("id", "b"), path, "b")
    val v = TxLog.maybeCompact(spark, path, "b", maxFilesPerPartition = 8)
    assert(v.nonEmpty)
    val after = filesPerSeg(path)
    assert(!after.contains(""),
      s"full compact must normalize segment-less files: $after")
    assert(TxLog.read(spark, path).count() == 11)
  }
}
