package graft.sources

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Persistence + incremental maintenance of corpus-key bloom filters: the
  * amortized form of the bloom anti-join (build once, delta-merge per
  * append, full rebuild only on removals).
  */
class BloomStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def keysDf(r: Range) = r.map(i => (i.toLong, s"p$i")).toDF("id", "payload")

  test("ensureCurrent builds once, delta-merges appends, and reuses the persisted filter") {
    val path = tmp("bloom")
    TxLog.appendFlat(keysDf(0 until 100), path)
    val b0 = BloomStore.ensureCurrent(spark, path, "id", expectedItems = 1000)
    val h = hashes(0 until 250)
    assert((0 until 100).forall(i => b0.mightContainLong(h(i))))
    assert(BloomStore.load(spark, path, "id").map(_._1).contains(0L))

    // append-only growth: the maintained filter covers both batches
    TxLog.appendFlat(keysDf(100 until 200), path)
    val b1 = BloomStore.ensureCurrent(spark, path, "id", expectedItems = 1000)
    assert((0 until 200).forall(i => b1.mightContainLong(h(i))))
    assert(BloomStore.load(spark, path, "id").map(_._1).contains(1L))

    // unchanged table: ensureCurrent serves the persisted filter, no new file
    val dir = new java.io.File(path, "_graft_bloom")
    val before = dir.listFiles().map(_.getName).toSet
    BloomStore.ensureCurrent(spark, path, "id", expectedItems = 1000)
    assert(dir.listFiles().map(_.getName).toSet == before)

    // an EMPTY append must not crash the delta build (Spark's bloomFilter
    // agg NPEs on an empty relation) and must not lose coverage
    TxLog.appendFlat(keysDf(0 until 0), path)
    val b2 = BloomStore.ensureCurrent(spark, path, "id", expectedItems = 1000)
    assert((0 until 200).forall(i => b2.mightContainLong(h(i))))
    // version GC: three filters were persisted (v0, v1, v2); only the two
    // newest survive, and load still serves the current one
    val left = dir.listFiles().map(_.getName).filter(_.startsWith("id-v")).toSeq
    assert(left.size == 2 && !left.contains("id-v" + "0" * 20), left.toString)
    assert(BloomStore.load(spark, path, "id").map(_._1).contains(2L))

    // the persisted filter drives the SAME anti-join answer as a fresh build
    val corpus = TxLog.read(spark, path)
    val batch = keysDf(150 until 250) // 50 dups, 50 new
    val viaStore = Dedup.bloomAntiJoinWith(batch, corpus, "id", b1)
      .select("id").collect().map(_.getLong(0)).toSet
    val fresh = Dedup.bloomAntiJoin(batch, corpus, "id", expectedItems = 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaStore == fresh && viaStore == (200 until 250).map(_.toLong).toSet)
  }

  test("a commit with removals forces a full rebuild — live keys never go missing") {
    val path = tmp("bloomrb")
    def part(r: Range, sk: Long) =
      r.map(i => (i.toLong, s"p$i", sk)).toDF("id", "payload", "session_key")
    TxLog.append(part(0 until 50, 1L), path, "session_key")
    BloomStore.ensureCurrent(spark, path, "id", expectedItems = 1000)
    // replace session 1 with different ids: manifest diff has removals
    TxLog.replaceKeys(part(1000 until 1050, 1L), path, "session_key")
    val b = BloomStore.ensureCurrent(spark, path, "id", expectedItems = 1000)
    val h = hashes(1000 until 1050)
    assert((1000 until 1050).forall(i => b.mightContainLong(h(i))))
    val batch = part(1000 until 1060, 2L)
    val out = Dedup.bloomAntiJoinWith(batch, TxLog.read(spark, path), "id", b)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == (1050 until 1060).map(_.toLong).toSet)
  }

  /** The store hashes keys through xxhash64 — reproduce it for probes. */
  private def hashes(r: Range): Map[Int, Long] =
    r.map(_.toLong).toDF("k").select(col("k"), xxhash64(col("k")).as("h"))
      .collect().map(x => (x.getLong(0).toInt, x.getLong(1))).toMap
}
