package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle/spill audit: run named `SparkEntry` queries and report, per
  * query, the bytes that actually crossed a shuffle boundary and the bytes
  * that spilled — the "minimize shuffles" posture measured instead of
  * claimed. Listener-based (stage-aggregated task metrics), so the numbers
  * are the executor truth, not plan estimates.
  *
  * Usage: `runMain graft.tools.ShuffleAudit <sfDir> q1,q2,...`
  */
object ShuffleAudit {

  private final class Totals extends SparkListener {
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val inputBytes = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def snapshot: (Long, Long, Long, Long, Long) =
      (shuffleRead.get, shuffleWrite.get, memSpill.get, diskSpill.get,
        inputBytes.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = new Totals
    spark.sparkContext.addSparkListener(t)
    println("[audit] | query | sec | input MB | shuffle write MB | " +
      "shuffle read MB | spill mem/disk MB |")
    println("[audit] |---|---|---|---|---|---|")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val before = { Thread.sleep(300); t.snapshot } // drain prior stages
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(700) // listener bus is async; let the last stages land
      val after = t.snapshot
      def mb(a: Long, b: Long) = (b - a) / 1e6
      println(f"[audit] | $name | $sec%.2f | ${mb(before._5, after._5)}%.1f" +
        f" | ${mb(before._2, after._2)}%.1f | ${mb(before._1, after._1)}%.1f" +
        f" | ${mb(before._3, after._3)}%.1f/${mb(before._4, after._4)}%.1f |")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
