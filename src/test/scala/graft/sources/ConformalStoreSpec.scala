package graft.sources

import graft.SparkSpec
import graft.operators.Evaluation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted conformal-score census: threshold-from-store must be
  * BIT-identical to recalibrating on the union of every raw score (counts
  * are the mergeable sufficient statistic of the rank-k threshold), the
  * fenced ingest must no-op on replay, and compaction must leave
  * thresholds untouched — the PreferenceStore guarantees at calibration
  * granularity.
  */
class ConformalStoreSpec extends SparkSpec {
  import spark.implicits._

  // a deterministic score log with duplicate values (the tie path) and a
  // NULL score (excluded by contract); tag shifts the distribution
  private def scores(tag: Int): DataFrame =
    ((1 to 40).map { i =>
      ("g" + (i % 3), Some(((i * 7 + tag * 13) % 20).toLong))
    } :+ ("g0", Option.empty[Long])).toDF("src", "s")

  private def rows(df: DataFrame) =
    df.collect().sortBy(_.getString(0)).toSeq

  test("create + fenced ingest: threshold == recalibration on the raw union, bit-for-bit") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-confstore").toString + "/s"
    ConformalStore.create(scores(0), "src", "s", path)
    ConformalStore.ingestBatch(spark, scores(1), "src", "s", path,
      "conf-spec", 1L)
    ConformalStore.ingestBatch(spark, scores(2), "src", "s", path,
      "conf-spec", 2L)
    val store = ConformalStore.threshold(spark, path)
    val recal = Evaluation.conformalThreshold(
      scores(0).unionByName(scores(1)).unionByName(scores(2)),
      "src", "s")
    assert(rows(store.withColumnRenamed("grp", "src")) == rows(recal),
      "store threshold diverged from the raw-union recalibration")
    // k > n reports NULL qhat, never a fabricated value: a tiny group
    val tiny = java.nio.file.Files
      .createTempDirectory("graft-confstore").toString + "/t"
    ConformalStore.create(Seq(("g", 5L)).toDF("src", "s"), "src", "s", tiny)
    val r = ConformalStore.threshold(spark, tiny).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L && r.isNullAt(3))
  }

  test("a replayed ingest batch no-ops under the fence") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-confstore").toString + "/r"
    ConformalStore.create(scores(0), "src", "s", path)
    ConformalStore.ingestBatch(spark, scores(1), "src", "s", path,
      "conf-spec", 1L)
    val before = rows(ConformalStore.threshold(spark, path))
    ConformalStore.ingestBatch(spark, scores(1), "src", "s", path,
      "conf-spec", 1L) // replay
    assert(rows(ConformalStore.threshold(spark, path)) == before)
    val total = ConformalStore.census(spark, path)
      .agg(sum("n")).head().getLong(0)
    assert(total == 80L, s"replay double-counted: $total")
  }

  test("census compaction: one row per (grp, score) below the watermark, threshold bit-identical") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-confstore").toString + "/c"
    ConformalStore.create(scores(0), "src", "s", path)
    ConformalStore.ingestBatch(spark, scores(1), "src", "s", path,
      "conf-spec", 1L)
    ConformalStore.ingestBatch(spark, scores(2), "src", "s", path,
      "conf-spec", 2L)
    val before = rows(ConformalStore.threshold(spark, path))
    ConformalStore.compactCensus(spark, path, upTo = 2L)
    assert(rows(ConformalStore.threshold(spark, path)) == before)
    val perCell = TxLog.read(spark, path)
      .filter(col("first_batch") < 2L)
      .groupBy("grp", "score").agg(count(lit(1)).as("c"))
    assert(perCell.filter(col("c") > 1).count() == 0L)
    // a replayed pre-compaction batch still no-ops (watermarks survived)
    ConformalStore.ingestBatch(spark, scores(1), "src", "s", path,
      "conf-spec", 1L)
    assert(rows(ConformalStore.threshold(spark, path)) == before)
  }

  test("a non-store path fails loudly") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-confstore").toString + "/x"
    val e = intercept[IllegalArgumentException] {
      ConformalStore.threshold(spark, path)
    }
    assert(e.getMessage != null)
  }
}
