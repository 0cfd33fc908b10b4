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
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val raw = F1Synthetic.rawTagged(spark, dir)
    t("raw.laps")(raw.laps)
    t("raw.positions")(raw.positions)
    t("stgLaps")(F1Staging.stgLapsTagged(raw.laps))
    val lapsAll = F1Intermediate.lapsAllTagged(F1Staging.stgLapsTagged(raw.laps))
    t("lapsAll (dedup)")(lapsAll)
    val posAll = F1Intermediate.positionAllTagged(F1Staging.stgPositionTagged(raw.positions))
    t("posAll")(posAll)
    val sdl = F1Intermediate.sessionDriverLapsOptimized(lapsAll, posAll)
    t("sdl (as-of)")(sdl)
    val features = F1Intermediate.driverLapFeatures(sdl)
    t("features")(features)
    t("summary mart")(F1Marts.fctDriverRaceSummary(features))
    t("laps mart")(F1Marts.fctDriverLaps(features))
    t("finalF1 windowed")(F1Marts.finalF1Windowed(features))
    t("q38 full")(F1Synthetic.summary(spark, dir))
    spark.stop()
  }
}
