package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main (not part of the driver contract): time one or more
  * declared queries in the EXACT session shape `Bench` uses (local[N],
  * shuffle.partitions=N, AQE on, noop sink, table-scan warm-up), print
  * per-rep times and optionally the formatted physical plan.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <q1,q2,...> [reps] [explain]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.length > 3 && args(3) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // keep the profiling session shape identical to Bench (see its
      // round-11 coalescing note)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "128k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "customer", "part", "supplier",
        "documents", "embeddings", "events").foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count(): Unit
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        // analysis + optimization + physical planning of the read side —
        // a planning-cost probe (the write below re-plans its own tree)
        df.queryExecution.executedPlan
        val tPlan = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = System.nanoTime()
        val dt = (tExec - t0) / 1e9
        spark.catalog.clearCache()
        // match Bench: block-manager residue (localCheckpoint / persist)
        // is dropped between reps, not just the SQL cache
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        println(f"[profile] $name rep$i: $dt%.3f s " +
          f"(build ${(tBuild - t0) / 1e9}%.3f, plan ${(tPlan - tBuild) / 1e9}%.3f, " +
          f"exec ${(tExec - tPlan) / 1e9}%.3f)")
      }
    }
    spark.stop()
  }
}
