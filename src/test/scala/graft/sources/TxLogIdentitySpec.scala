package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Identity-column appends: dense monotone ids, manifest-stats start
  * discovery, deterministic assignment.
  */
class TxLogIdentitySpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("txid").toString + "/t"

  private def idsOf(path: String): Map[Long, Long] =
    TxLog.read(spark, path).select("k", "rid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two batches: dense 1..n, then n+1..m, ordered by the batch's key") {
    val path = tmp()
    TxLog.appendWithIdentity(Seq(30L, 10L, 20L).toDF("k"), path, "rid",
      expr("k div 15"), Seq("k"))
    TxLog.appendWithIdentity(Seq(5L, 40L).toDF("k"), path, "rid",
      expr("k div 15"), Seq("k"))
    assert(idsOf(path) == Map(10L -> 1L, 20L -> 2L, 30L -> 3L,
      5L -> 4L, 40L -> 5L))
  }

  test("assignment is deterministic and independent of input partitioning") {
    val p1 = tmp(); val p2 = tmp()
    val data = (1L to 500L).map(i => (i * 7) % 501)
    TxLog.appendWithIdentity(
      spark.createDataset(data).repartition(7).toDF("k"), p1, "rid",
      expr("k div 50"), Seq("k"))
    TxLog.appendWithIdentity(
      spark.createDataset(data).repartition(2).toDF("k"), p2, "rid",
      expr("k div 50"), Seq("k"))
    val m1 = idsOf(p1); val m2 = idsOf(p2)
    assert(m1 == m2)
    // dense: exactly 1..n, and id order follows key order (monotone bucket)
    assert(m1.values.toSeq.sorted == (1L to 500L))
    assert(m1.toSeq.sortBy(_._1).map(_._2) == (1L to 500L))
  }

  test("start continues from manifest stats even after larger ids appear") {
    val path = tmp()
    TxLog.appendWithIdentity(Seq(1L, 2L).toDF("k"), path, "rid",
      expr("k div 10"), Seq("k"))
    TxLog.appendWithIdentity(Seq(3L).toDF("k"), path, "rid",
      expr("k div 10"), Seq("k"))
    TxLog.appendWithIdentity(Seq(4L, 5L, 6L).toDF("k"), path, "rid",
      expr("k div 10"), Seq("k"))
    assert(idsOf(path).values.toSeq.sorted == (1L to 6L))
  }
}
