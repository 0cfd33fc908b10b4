package graft.tools

import graft.pipeline._
import org.apache.spark.sql.SparkSession

/** Dev-only: dump the physical plan of the end-to-end pipeline queries so
  * exchange/sort counts can be audited (see PLANS.md).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val plan = F1Synthetic.finalF1(spark, dir).queryExecution.executedPlan.toString
    val counts = Seq("Exchange hashpartitioning", "Sort ", "Window", "WholeStageCodegen")
      .map(k => s"$k -> ${plan.sliding(k.length).count(_ == k)}")
    println("== q41 finalF1 plan operator counts ==")
    counts.foreach(println)
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Sort") || l.contains("Window")
        || l.contains("Join") || l.contains("Scan parquet") || l.contains("AdaptiveSparkPlan"))
      .mkString("\n"))
    spark.stop()
  }
}
