package graft.sources

import graft.SparkSpec
import graft.operators.Preference
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted preference census: ratings-from-store must be
  * BIT-identical to re-fitting Bradley–Terry on the union of every raw
  * comparison (counts are the mergeable sufficient statistic), the fenced
  * ingest must no-op on replay, and compaction must leave ratings
  * untouched — the LangIdStore guarantees at leaderboard granularity.
  */
class PreferenceStoreSpec extends SparkSpec {
  import spark.implicits._

  // a deterministic comparison log: A strong, B middle, C weak, D mixed
  private def log(tag: Int): DataFrame =
    (1 to 30).map { i =>
      val pair = (i + tag) % 4
      pair match {
        case 0 => if (i % 5 == 0) ("B", "A") else ("A", "B")
        case 1 => if (i % 7 == 0) ("C", "B") else ("B", "C")
        case 2 => if (i % 3 == 0) ("C", "A") else ("A", "C")
        case _ => if (i % 2 == 0) ("D", "B") else ("B", "D")
      }
    }.toDF("winner", "loser")

  private def rows(df: DataFrame) =
    df.collect().sortBy(_.getString(0)).toSeq

  test("create + fenced ingest: ratings == refit on the raw union, bit-for-bit") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-prefstore").toString + "/s"
    PreferenceStore.create(log(0), "winner", "loser", path)
    PreferenceStore.ingestBatch(spark, log(1), "winner", "loser", path,
      "pref-spec", 1L)
    PreferenceStore.ingestBatch(spark, log(2), "winner", "loser", path,
      "pref-spec", 2L)
    val store = PreferenceStore.ratings(spark, path)
    val refit = Preference.bradleyTerry(
      log(0).unionByName(log(1)).unionByName(log(2)), "winner", "loser")
    assert(rows(store) == rows(refit),
      "store ratings diverged from the raw-union refit")
  }

  test("a replayed ingest batch no-ops under the fence") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-prefstore").toString + "/r"
    PreferenceStore.create(log(0), "winner", "loser", path)
    PreferenceStore.ingestBatch(spark, log(1), "winner", "loser", path,
      "pref-spec", 1L)
    val before = rows(PreferenceStore.ratings(spark, path))
    PreferenceStore.ingestBatch(spark, log(1), "winner", "loser", path,
      "pref-spec", 1L) // replay
    assert(rows(PreferenceStore.ratings(spark, path)) == before)
    val total = PreferenceStore.census(spark, path)
      .agg(sum("n")).head().getLong(0)
    assert(total == 60L, s"replay double-counted: $total")
  }

  test("census compaction: one row per pair below the watermark, ratings bit-identical") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-prefstore").toString + "/c"
    PreferenceStore.create(log(0), "winner", "loser", path)
    PreferenceStore.ingestBatch(spark, log(1), "winner", "loser", path,
      "pref-spec", 1L)
    PreferenceStore.ingestBatch(spark, log(2), "winner", "loser", path,
      "pref-spec", 2L)
    val before = rows(PreferenceStore.ratings(spark, path))
    PreferenceStore.compactCensus(spark, path, upTo = 2L)
    assert(rows(PreferenceStore.ratings(spark, path)) == before)
    // ≤ one merged row per (pair, side) below the fence + batch-2 rows
    val perPair = TxLog.read(spark, path)
      .filter(col("first_batch") < 2L)
      .groupBy("winner", "loser").agg(count(lit(1)).as("c"))
    assert(perPair.filter(col("c") > 1).count() == 0L)
    // a replayed pre-compaction batch still no-ops (watermarks survived)
    PreferenceStore.ingestBatch(spark, log(1), "winner", "loser", path,
      "pref-spec", 1L)
    assert(rows(PreferenceStore.ratings(spark, path)) == before)
  }

  test("a non-store path fails loudly") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-prefstore").toString + "/x"
    val e = intercept[IllegalArgumentException] {
      PreferenceStore.ratings(spark, path)
    }
    // TxLog.read fails first on a missing table, or the meta check does —
    // either way the error names the problem
    assert(e.getMessage != null)
  }
}
