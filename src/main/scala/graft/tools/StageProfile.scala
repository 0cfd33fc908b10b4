package graft.tools

import graft.pipeline._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev tool: per-stage wall/task-time breakdown of one q38 and one q41 run.
  * Not part of the shipped library surface.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long,
                  inRows: Long, outRows: Long)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks, wall,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleReadMetrics.recordsRead,
          si.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })

    graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    graft.sources.Tables.load(spark, sfDir, "orders").count()

    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      // second run is the steady-state one; profile it
      f.write.format("noop").mode("overwrite").save()
      stages.clear()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"=== $label total $dt%.2f s, ${stages.size} stages ===")
      stages.sortBy(-_.wallMs).take(18).foreach { s =>
        println(f"  wall ${s.wallMs}%6d ms  taskSum ${s.taskMs}%7d ms  tasks ${s.tasks}%3d  shufIn ${s.inRows}%8d  shufOut ${s.outRows}%8d  [${s.id}] ${s.name}")
      }
    }

    // default: the two historical subjects; args select any registry query
    if (args.isEmpty) {
      run("q38")(F1Synthetic.summary(spark, sfDir))
      run("q41")(F1Synthetic.finalF1(spark, sfDir))
    } else args.flatMap(_.split(',')).foreach { name =>
      run(name)(graft.SparkEntry.queries(name)(spark, sfDir))
    }
    spark.stop()
  }
}
