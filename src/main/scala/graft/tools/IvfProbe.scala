package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb0 = graft.sources.Tables.load(spark, dir, "embeddings")
    for (round <- 1 to 2) {
      val emb = emb0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var t0 = System.nanoTime()
      emb.count()
      println(f"[$round] cache build   ${(System.nanoTime()-t0)/1e9}%6.2f s")
      t0 = System.nanoTime()
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16, 3)
      println(f"[$round] centroids(3)  ${(System.nanoTime()-t0)/1e9}%6.2f s")
      t0 = System.nanoTime()
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding")).head().getSeq[Float](0)
      println(f"[$round] q fetch       ${(System.nanoTime()-t0)/1e9}%6.2f s")
      t0 = System.nanoTime()
      Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 16, 4)
        .write.format("noop").mode("overwrite").save()
      println(f"[$round] full ivfTopK  ${(System.nanoTime()-t0)/1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
