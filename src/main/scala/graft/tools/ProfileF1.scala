package graft.tools

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: variant matrix for the end-to-end F1 pipeline queries (q38/q39/
  * q40/q41) so perf work attacks measured hot paths. Materializes via the
  * noop sink (same convention as [[graft.Bench]]); best-of-2 per variant.
  * Not part of the shipped library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileF1"
  */
object ProfileF1 {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      val t = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      println(f"[profile] $name%-44s $t%8.2f s")
    }

    // warm-up (footer reads, codegen compile of the scan)
    graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    graft.sources.Tables.load(spark, sfDir, "orders").count()

    def classic: F1Pipeline.Marts = F1Pipeline.build(F1Synthetic.raw(spark, sfDir))
    def tagged: F1Pipeline.Marts = F1Pipeline.buildTagged(F1Synthetic.rawTagged(spark, sfDir))

    time("q38 classic")(classic.fctDriverRaceSummary)
    time("q38 tagged")(tagged.fctDriverRaceSummary)
    time("q39 classic")(classic.fctDriverLaps)
    time("q39 tagged")(tagged.fctDriverLaps)
    time("q40 classic")(classic.raceControlAll)
    time("q40 tagged")(tagged.raceControlAll)
    time("q41 classic joinForm")(classic.finalF1)
    time("q41 tagged windowForm")(tagged.finalF1)
    spark.stop()
  }
}
