package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  private def blob(center: Float, ids: Range): Seq[(Long, Seq[Float])] =
    ids.map(i => (i.toLong,
      Seq(center + (i % 3) * 0.01f, center - (i % 2) * 0.01f)))

  test("simplifiedSilhouette: two tight separated blobs score near 1 in both clusters") {
    // ids 0..3 near 0.0, ids 4..7 near 10.0 — init picks ids 0 and 1, Lloyd
    // pulls one centroid into each blob within 3 iterations
    val emb = (blob(0.0f, 0 to 3) ++ blob(10.0f, 4 to 7)).toDF("id", "v")
    val rows = Similarity.simplifiedSilhouette(emb, "id", "v",
      nClusters = 2, iters = 3).orderBy("cluster").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(1) == 4L))
    assert(rows.forall(_.getDouble(2) > 0.9),
      rows.map(_.getDouble(2)).mkString(","))
  }

  test("simplifiedSilhouette: one cluster → no second-nearest → score 0 by contract") {
    val emb = blob(0.0f, 0 to 5).toDF("id", "v")
    val rows = Similarity.simplifiedSilhouette(emb, "id", "v",
      nClusters = 1, iters = 2).collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 6L)
    assert(rows.head.getDouble(2) == 0.0)
  }

  test("simplifiedSilhouette: an overlapping smear scores lower than separated blobs") {
    val sep = (blob(0.0f, 0 to 7) ++ blob(10.0f, 8 to 15)).toDF("id", "v")
    // the smear spans one line so the 2-means split has ambiguous members
    val smear = (0 to 15).map(i => (i.toLong,
      Seq(i * 1.0f, 0.0f))).toDF("id", "v")
    def overall(df: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.simplifiedSilhouette(df, "id", "v", 2, 3)
        .agg(sum(col("mean_silhouette") * col("n")) / sum(col("n")))
        .head().getDouble(0)
      r
    }
    assert(overall(sep) > overall(smear) + 0.2)
  }
}
