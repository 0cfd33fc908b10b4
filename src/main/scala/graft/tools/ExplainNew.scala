package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only: plan audit of the round-3 queries (broadcast/exchange shapes). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q52_decontamination", "q53_sequence_pack", "q54_token_percentiles",
        "q55_mix_rebalance", "q56_curriculum_bins").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(s"== $q ==")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Broadcast") || l.contains("Window")
          || l.contains("Join") || l.contains("HashAggregate") || l.contains("Sort "))
        .map(_.trim.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}
