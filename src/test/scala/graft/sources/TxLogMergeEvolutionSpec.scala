package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** MERGE WITH SCHEMA EVOLUTION ([[TxLog.mergeKeys]] `allowSchemaEvolution`):
  * the widened column commits atomically with the merged rows, survivors
  * read NULL, untouched partitions widen through the merged read, and the
  * strict default still rejects unexpected source columns.
  */
class TxLogMergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mergevo").toString + "/t"

  private def base = (1L to 40L).map(k => (k, k % 4, s"v$k"))
    .toDF("k", "part", "payload")

  test("evolution merge widens, nulls survivors, and is one atomic commit") {
    val p = tmp()
    TxLog.append(base, p, "part")
    val v0 = TxLog.currentVersion(spark, p)
    val upd = Seq((2L, 2L, "UPD", "extra2"), (100L, 2L, "NEW", "extra100"))
      .toDF("k", "part", "payload", "note")
    TxLog.mergeKeys(upd, p, "part", Seq("k"), allowSchemaEvolution = true)
    val out = TxLog.readMerged(spark, p)
      .select($"k", $"payload", $"note").as[(Long, String, Option[String])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 41)
    assert(out(2L) == ("UPD", Some("extra2")))
    assert(out(100L) == ("NEW", Some("extra100")))
    // survivors — in the rewritten partition AND in untouched ones — NULL
    assert(out(6L) == ("v6", None))   // part 2, rewritten partition
    assert(out(1L) == ("v1", None))   // part 1, untouched old-schema files
    // the widened schema and the rows landed in ONE commit
    assert(TxLog.currentVersion(spark, p) == v0 + 1)
    // and the PREVIOUS version still reads the old schema (snapshot isolation)
    assert(!TxLog.readMerged(spark, p, v0).columns.contains("note"))
  }

  test("strict default rejects an unexpected source column") {
    val p = tmp()
    TxLog.append(base, p, "part")
    val upd = Seq((2L, 2L, "UPD", "extra")).toDF("k", "part", "payload", "note")
    intercept[Exception] {
      TxLog.mergeKeys(upd, p, "part", Seq("k"))
    }
    // nothing landed: same version, same rows
    assert(TxLog.read(spark, p).count() == 40)
  }

  test("a second evolving merge on the widened table round-trips") {
    val p = tmp()
    TxLog.append(base, p, "part")
    TxLog.mergeKeys(Seq((2L, 2L, "UPD", "n1")).toDF("k", "part", "payload", "note"),
      p, "part", Seq("k"), allowSchemaEvolution = true)
    // next batch does NOT carry `note` — evolution also tolerates the
    // narrower source (replaced rows read NULL in note, Delta's INSERT *)
    TxLog.mergeKeys(Seq((3L, 3L, "UPD3")).toDF("k", "part", "payload"),
      p, "part", Seq("k"), allowSchemaEvolution = true)
    val out = TxLog.readMerged(spark, p)
      .select($"k", $"payload", $"note").as[(Long, String, Option[String])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(2L) == ("UPD", Some("n1")))
    assert(out(3L) == ("UPD3", None))
    assert(out.size == 40)
  }
}
