package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Measurement choices:
  *   - materialize via the `noop` sink, not `count()` — a bare count lets
  *     Catalyst prune every computed column and under-measures projection/
  *     window work;
  *   - a table-scan warm-up precedes timing so footer reads / first-job
  *     session costs don't land on whichever query happens to run first;
  *   - queries run in sorted name order for stable, comparable output.
  */
object Bench {
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

    Seq("lineitem", "orders", "customer", "part", "supplier",
        "documents", "embeddings", "events").foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    // best of three runs per query: single-JVM timings vary ±15% and the
    // allocation-heavy queries (shingle joins) occasionally catch a G1 mixed
    // cycle mid-run for a 5-10x outlier — three samples shed those flukes,
    // and the steady-state (post-codegen-compile) figure is the comparable one
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (0 until 3).map { _ =>
        // start every rep from a clean heap: an explicit full GC BETWEEN
        // queries (outside the timed window) stops garbage from query N
        // landing as a concurrent-mark stall inside query N+1's timing —
        // measured as 10x per-query swings on the shingle-heavy family
        System.gc()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // queries are independent — drop any intra-query persisted data so
        // later queries aren't taxed by cache residue / GC pressure
        spark.catalog.clearCache()
        dt
      }
      (name, times.min, failed)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a throwing query fails fast and would SHRINK the total — surface
    // failures as a first-class JSON field plus a nonzero exit so a
    // regression can never read as a speedup
    val failedQs = results.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedQs,"sf":"$sfDir"}"""
    // the one-line contract must survive log-tail truncation: persist it
    // to a file as well as stdout (best-effort — never fail the bench)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_last.json"), line)
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
    if (results.exists(_._3)) sys.exit(2)
  }
}
