package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-side semantics of the reference's ingest controller (SURVEY §2.1
  * S3–S7), re-expressed over partitioned Parquet:
  *
  *   - S3/S4 auto-create + batched transactional append → a plain partitioned
  *     `append` write (Spark batches per partition; the commit protocol gives
  *     all-or-nothing visibility at the job level).
  *   - S6 key-scoped delete-then-insert (`delete_session_rows`,
  *     `dags/open_f1_realtime.py:153-170,221-246`) → dynamic partition
  *     overwrite on a `session_key`-partitioned layout: replacing a session
  *     touches exactly that partition.
  *   - S7 + J3 read-back idempotency (`get_loaded_session_keys`,
  *     `dags/open_f1_historical.py:159-168,226-231`) → a left-anti join
  *     against the sink's distinct keys — no driver-side key set.
  *   - S5 drift recovery (drop-and-recreate, `:141-152`) → `mergeSchema` on
  *     read; additive drift needs no rewrite at all.
  */
object Sinks {

  /** Append partitioned by the replace key (enables S6-style surgical
    * replacement and partition pruning on session-scoped reads).
    */
  def appendPartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** S6: replace exactly the partitions present in `df`, leave the rest —
    * the session-level delete+reload of the realtime DAG, atomic per
    * partition via dynamic partition overwrite.
    */
  def replaceByKey(df: DataFrame, path: String, partitionCol: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** S7/J3: append only rows whose key is not already in the sink. */
  def idempotentAppend(spark: SparkSession, df: DataFrame, path: String, keyCol: String): Unit = {
    val fresh =
      if (!hasData(spark, path)) df
      else {
        val loaded = spark.read.parquet(path).select(keyCol).distinct()
        df.join(loaded, Seq(keyCol), "left_anti")
      }
    appendPartitioned(fresh, path, keyCol)
  }

  /** Small-file compaction: append-heavy sinks (S4/S6 patterns) accumulate
    * files; rewrite a partition's worth of data into ~targetFileMB files.
    * At 100 TB this runs per partition on a schedule, not whole-table.
    *
    * Crash/reader safety (swap, not delete-then-rename): the compacted copy
    * is fully written to `path__compacting` first, then two metadata-only
    * renames swap it in (`path` → `path__old`, tmp → `path`) and the old
    * data is deleted LAST. Every crash point leaves a complete copy of the
    * data on disk — [[recoverCompact]] (run on open, or at the top of the
    * next compact) rolls a half-finished swap forward/backward. A reader
    * holding the old file list keeps reading the old files until the final
    * delete; the visible-empty window of the previous delete-first scheme
    * (and its total-data-loss crash window) is gone.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 256): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompact(spark, path)
    val df = spark.read.parquet(path)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.rename(p, old)
    fs.rename(tmp, p)
    fs.delete(old, true)
  }

  /** Roll a crashed [[compact]] to a consistent state. Exactly one of three
    * on-disk shapes exists after a crash, each holding ≥1 complete copy:
    *   1. `path` present, maybe a stale tmp → delete tmp (compact never ran
    *      its renames; the tmp may be half-written, the live dir is intact);
    *   2. `path` missing, tmp present (crash between the two renames) → the
    *      tmp copy is complete (written before any rename): promote it and
    *      drop `path__old`;
    *   3. `path` present and `path__old` present (crash before the final
    *      delete) → new data already live: just delete `path__old`.
    */
  def recoverCompact(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (!fs.exists(p) && fs.exists(tmp)) fs.rename(tmp, p)
    else if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** S5: read tolerating additive schema drift across files. */
  def readMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed, bucket-sorted table write — the co-located-join layout: two
    * tables bucketed by their join key into the same bucket count join with
    * NO shuffle. The frame is repartitioned by the bucket column first so
    * each bucket lands in a single file (Spark only elides the join-side
    * sort for single-file buckets). This is the at-rest answer to the
    * reference's repeated key-joins; at 100 TB it converts every
    * detail⋈summary / laps⋈positions recurrence into a local zip of buckets.
    * Spec asserts the Exchange-free plan.
    *
    * Rerun-safe: the in-memory catalog dies with the JVM while the warehouse
    * directory survives, so a stale location is dropped before the write
    * (otherwise `saveAsTable` fails with LOCATION_ALREADY_EXISTS even in
    * Overwrite mode).
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$tableName")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.repartition(nBuckets, df.col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** True only when the sink path exists AND already holds data — a freshly
    * created empty directory is not a sink yet.
    */
  /** Z-order-clustered write (extension scope; the layout behind Delta/
    * Iceberg `OPTIMIZE ZORDER BY`): range-partition on the Morton interleave
    * of two columns ([[graft.functions.ZOrder.zValue]]) so each of the
    * `nFiles` output files covers a compact 2-D tile of the (x, y) domain —
    * its parquet footer min/max on EITHER column is then tight, and a range
    * query on either dimension prunes to O(√nFiles) files where a
    * single-column sort layout prunes on one dimension only and scans every
    * file for the other. Row order within a file follows z too (row-group
    * stats stay tight for free).
    *
    * `bits` must cover the columns' range-reduced domain; inputs are taken
    * modulo `2^bits` — pre-scale wider domains. The z column is layout-only
    * and is not written.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, nFiles: Int): Unit = {
    val z = graft.functions.ZOrder.zValue(
      col(xCol).bitwiseAND(lit((1L << bits) - 1)),
      col(yCol).bitwiseAND(lit((1L << bits) - 1)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
