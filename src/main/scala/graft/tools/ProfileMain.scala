package graft.tools

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage profiler for the end-to-end pipeline queries (not part of
  * the driver contract; see BENCH notes). Times each DAG stage with the same
  * noop-sink methodology as [[graft.Bench]].
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"STAGE $name%-28s best ${times.min}%6.2f s  all ${times.map(x => f"$x%.2f").mkString(" ")}")
    }

    // `ProfileMain <dir> q38 q41 ...` times the named SparkEntry queries;
    // with no names it profiles the pipeline DAG stage by stage.
    if (args.length > 1) {
      args.drop(1).foreach { q =>
        t(q)(graft.SparkEntry.queries(args.drop(1).find(_ == q).map { n =>
          graft.SparkEntry.queries.keys.find(_.startsWith(n)).getOrElse(n)
        }.get)(spark, dir))
      }
    } else {
      def marts = F1Pipeline.buildTagged(F1Synthetic.rawTagged(spark, dir))
      t("q38 summary")(marts.fctDriverRaceSummary)
      t("q39 laps")(marts.fctDriverLaps)
      t("q41 final")(marts.finalF1)
    }
    spark.stop()
  }
}
