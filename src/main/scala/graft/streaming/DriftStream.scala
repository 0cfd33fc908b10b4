package graft.streaming

import graft.operators.Expectations
import graft.sources.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest with a built-in DATA-DRIFT monitor — the continuous
  * twin of [[Expectations.snapshotDrift]]: every micro-batch lands as one
  * exactly-once [[TxLog]] commit, and the per-column profile delta between
  * the pre-batch and post-batch snapshots is appended to a monitor table
  * in the SAME pass, tagged with the data version it audited. The monitor
  * table is itself a TxLog table, so the audit trail has the same
  * time-travel/atomicity guarantees as the data — "what did the profile
  * look like when version 7 landed" is one `versionAsOf`-free read of the
  * monitor rows tagged `data_version = 7`.
  *
  * Why in-stream rather than a nightly job: range expansion and
  * null-fraction jumps are UPSTREAM break signals — the value of the
  * monitor is catching them before a day of bad batches lands. Cost per
  * batch: one profile pass over the batch-sized delta's snapshot... no —
  * honestly two snapshot scans (before/after), which at 100 TB is the one
  * deliberate trade here; the deployment lever is profiling a column
  * subset (`cols`) and relying on snapshot scans being partition-pruned by
  * the monitor's caller. Replays are absorbed by `appendOnce`: a
  * re-delivered micro-batch commits nothing, and the monitor append is
  * keyed by the SAME (appId, batchVersion) fence, so the audit trail
  * never duplicates either (spec'd).
  */
object DriftStream {

  /** Batch body (same code path streaming and batch, like
    * [[AnnIngest.ingestBatch]]): commit the batch exactly-once; if it
    * actually landed (not a replay), profile before vs after and append
    * the drift rows to the monitor table under the same fence.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, dataPath: String,
                  monitorPath: String, partitionCol: String,
                  cols: Seq[String], appId: String,
                  batchVersion: Long): Unit = {
    val preVersion = TxLog.currentVersion(spark, dataPath)
    val v = TxLog.appendOnce(batch, dataPath, appId, batchVersion,
      partitionCol = Some(partitionCol))
    if (v <= preVersion) return // replay — data unchanged, audit unchanged
    val before =
      if (preVersion < 0) batch.filter(lit(false)) // first batch: empty base
      else TxLog.read(spark, dataPath, preVersion)
    val drift = Expectations
      .snapshotDrift(before.select(cols.map(col): _*),
        TxLog.read(spark, dataPath, v).select(cols.map(col): _*), cols)
      .withColumn("data_version", lit(v))
    TxLog.appendOnce(drift, monitorPath, appId + "#monitor", batchVersion,
      partitionCol = Some("data_version"))
  }

  /** The stream: micro-batches drain into `dataPath` with the drift audit
    * riding along into `monitorPath`.
    */
  def monitoredIngest(stream: DataFrame, dataPath: String,
                      monitorPath: String, checkpoint: String,
                      partitionCol: String, cols: Seq[String],
                      appId: Option[String] = None): StreamingQuery = {
    // TxLog appIds are manifest tokens (no '/', tabs, newlines) — fold the
    // path separators out of the default identity, like AnnIngest
    val id = appId.getOrElse(s"drift-ingest:${dataPath.replace('/', '|')}")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch.sparkSession, batch, dataPath, monitorPath,
          partitionCol, cols, id, batchId)
      }
      .start()
  }
}
