package graft.tools

import graft.pipeline.F1Synthetic
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the q38/q41 physical plans and the post-AQE partition
  * counts of the hot intermediate frames. Not part of the library surface.
  */
object ExplainF1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q38 = F1Synthetic.summary(spark, sfDir)
    println("=== q38 logical-to-physical (formatted) ===")
    println(q38.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    // materialize once so AQE final plan + actual partition sizes exist
    q38.write.format("noop").mode("overwrite").save()
    println("=== q38 AQE final plan ===")
    println(q38.queryExecution.executedPlan.toString.take(20000))
  }
}
