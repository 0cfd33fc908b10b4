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

    def martTrio(tag: String, persistLapsAll: Boolean): Unit = {
      def marts = F1Pipeline.buildTagged(F1Synthetic.rawTagged(spark, dir),
        persistLapsAll = persistLapsAll)
      t(s"q38 summary [$tag]")(marts.fctDriverRaceSummary)
      t(s"q39 laps    [$tag]")(marts.fctDriverLaps)
      t(s"q41 final   [$tag]")(marts.finalF1)
    }
    martTrio("single-pass", persistLapsAll = false)
    martTrio("sp+p-lapsAll", persistLapsAll = true)
    spark.stop()
  }
}
