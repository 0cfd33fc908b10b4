package graft.streaming

import graft.SparkSpec
import graft.operators.Preference
import graft.sources.PreferenceStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming preference accumulation: the leaderboard read after the
  * stream drains equals a batch Bradley–Terry refit over every delivered
  * comparison, and the census is exactly-once under replayed batches.
  */
class PreferenceIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def comps(pairs: (String, String)*): DataFrame =
    pairs.toDF("winner", "loser")

  test("streamed batches: ratings == batch refit over all delivered comparisons") {
    val in = tmp("graft-pref-in")
    val census = tmp("graft-pref") + "/census"
    val ck = tmp("graft-pref-ck")
    val b0 = comps(("A", "B"), ("A", "B"), ("B", "C"))
    val b1 = comps(("A", "C"), ("B", "A"), ("B", "C"))
    val b2 = comps(("C", "B"), ("A", "B"), ("A", "C"), ("B", "C"))
    PreferenceStore.create(b0, "winner", "loser", census)
    b1.coalesce(1).write.mode("append").parquet(in)
    b2.coalesce(1).write.mode("append").parquet(in)
    val q = PreferenceIngest.monitoredIngest(
      spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      "winner", "loser", census, ck)
    q.awaitTermination()

    val store = PreferenceStore.ratings(spark, census)
      .collect().sortBy(_.getString(0)).toSeq
    val refit = Preference.bradleyTerry(
      b0.unionByName(b1).unionByName(b2), "winner", "loser")
      .collect().sortBy(_.getString(0)).toSeq
    assert(store == refit, "streamed census diverged from the batch refit")
    // exactly-once: total census mass = delivered comparisons
    val total = PreferenceStore.census(spark, census)
      .agg(sum("n")).head().getLong(0)
    assert(total == 10L, s"expected 10 comparisons, census holds $total")
  }

  test("a restarted stream over the same input re-delivers nothing (fence + checkpoint)") {
    val in = tmp("graft-pref-in2")
    val census = tmp("graft-pref2") + "/census"
    val ck = tmp("graft-pref-ck2")
    val b0 = comps(("A", "B"))
    val b1 = comps(("B", "A"), ("A", "B"))
    PreferenceStore.create(b0, "winner", "loser", census)
    b1.coalesce(1).write.mode("append").parquet(in)
    def drain(): Unit = {
      val q = PreferenceIngest.monitoredIngest(
        spark.readStream.schema(b0.schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        "winner", "loser", census, ck)
      q.awaitTermination()
    }
    drain()
    val before = PreferenceStore.census(spark, census)
      .agg(sum("n")).head().getLong(0)
    drain() // same checkpoint: no new files, nothing re-lands
    val after = PreferenceStore.census(spark, census)
      .agg(sum("n")).head().getLong(0)
    assert(before == 3L && after == 3L, s"$before -> $after")
  }
}
