package graft.sources

import graft.operators.TextDedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted LINE-CENSUS store for CCNet line/paragraph dedup — the
  * [[GramStore]] pattern at unit granularity, making
  * [[TextDedup.dropDuplicatedLinesAgainst]]'s deployment story real: at
  * corpus scale the "existing" side must not be re-exploded per batch, so
  * the census of normalized-unit md5s lives as a [[TxLog]] table that
  * incoming batches equi-join by line hash. Unlike the gram census
  * (presence-only: any recurrence of a ≥minTokens gram is a duplicate),
  * the line census is COUNTED — the drop rule is `existing count +
  * within-batch count ≥ minCount` — so the store keeps one
  * (h, cnt, first_batch) row PER BATCH per hash and the probe aggregates
  * `sum(cnt)` per hash: counts stay append-only (no read-modify-write
  * commit races), and the per-hash row count is bounded by the number of
  * batches that saw the hash. The corpus TEXT never reshuffles after its
  * one explode pass; `unitPattern` (line vs paragraph granularity) and
  * `minCount` are frozen as table state — a probe with a different split
  * would miss the census keys, the [[GramStore]] frozen-minTokens rule.
  *
  * Exactly-once streaming ingest: each batch is cleaned against the
  * census rows of STRICTLY EARLIER batches (`first_batch < batchVersion`,
  * a pushed predicate), then the batch's own per-hash counts land tagged
  * `first_batch = batchVersion` under an (appId, batchVersion) fence. A
  * replayed batch sees exactly the census its first delivery saw — its
  * own landed counts are excluded by the tag — and returns byte-identical
  * cleaned rows while the store append no-ops (spec'd).
  */
object LineStore {

  private def metaPath(path: String) = new Path(path, "_graft_line_meta")

  private def writeMeta(spark: SparkSession, path: String,
                        entries: Seq[(String, String)]): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(entries.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def readMeta(spark: SparkSession,
                              path: String): Map[String, String] = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no _graft_line_meta under $path — not a graft line store; build " +
        "via LineStore.create.")
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      buf.toString("UTF-8")
    } finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      require(i > 0,
        s"malformed _graft_line_meta line under $path: '$line' — not a " +
          "graft line store (expected key=value lines)")
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
  }

  // the meta file is line-based key=value — a unit pattern containing
  // literal newlines ("\n", "\n\n+") must round-trip through an escape
  private def encodePattern(p: String): String =
    p.replace("\\", "\\\\").replace("\n", "\\n")
  private def decodePattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      if (p.charAt(i) == '\\' && i + 1 < p.length) {
        p.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(p.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private[graft] def unitPatternOf(spark: SparkSession, path: String): String =
    decodePattern(readMeta(spark, path)("unitPattern"))

  private def bucketed(census: DataFrame, nBuckets: Int): DataFrame =
    census.withColumn("bucket", pmod(xxhash64(col("h")), lit(nBuckets)))

  /** Per-hash occurrence counts of the non-blank normalized units of
    * `docs` — the append-only census delta one corpus slice contributes.
    */
  private def censusOf(docs: DataFrame, idCol: String, textCol: String,
                       unitPattern: String): DataFrame =
    TextDedup.unitRows(docs, idCol, textCol, unitPattern)
      .filter(trim(col("line")) =!= "")
      .groupBy("h").agg(count(lit(1)).as("cnt"))

  /** One-time census build from the existing corpus. Pre-existing counts
    * are tagged `first_batch = -1`: earlier than every real batch, so
    * every ingest sees them.
    */
  def create(docs: DataFrame, idCol: String, textCol: String, path: String,
             minCount: Int = 2, unitPattern: String = "\n",
             nBuckets: Int = 16): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val census = bucketed(censusOf(docs, idCol, textCol, unitPattern),
      nBuckets).withColumn("first_batch", lit(-1L))
    TxLog.overwrite(census, path, partitionCol = "bucket")
    writeMeta(docs.sparkSession, path, Seq(
      "kind" -> "line", "minCount" -> minCount.toString,
      "unitPattern" -> encodePattern(unitPattern),
      "nBuckets" -> nBuckets.toString))
  }

  /** Read-only probe: `batch` cleaned against (census ∪ batch) —
    * [[TextDedup.dropDuplicatedLinesAgainst]] with the existing side
    * served from the store instead of re-exploded.
    * Returns (id, n_lines, n_kept, clean_text) for batch docs.
    */
  def probeClean(spark: SparkSession, path: String, batch: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val meta = readMeta(spark, path)
    cleanAgainst(batch, idCol, textCol, meta("minCount").toInt,
      decodePattern(meta("unitPattern")), TxLog.read(spark, path))
  }

  private def cleanAgainst(batch: DataFrame, idCol: String, textCol: String,
                           minCount: Int, unitPattern: String,
                           censusRows: DataFrame): DataFrame = {
    // per-batch count rows sum to the corpus-wide count per hash
    val census = censusRows.groupBy("h").agg(sum(col("cnt")).as("cnt"))
    TextDedup.cleanAgainstCensus(
      TextDedup.unitRows(batch, idCol, textCol, unitPattern),
      census, minCount)
  }

  /** Exactly-once batch ingest: the batch cleaned against the
    * strictly-earlier census, its own per-hash counts appended under the
    * (appId, batchVersion) fence. The cleaned frame is LAZY — materialize
    * (or sink) it after this call returns; it reads only
    * `first_batch < batchVersion` rows, so the just-landed append cannot
    * leak into its own audit, replayed or not.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                  textCol: String, path: String, appId: String,
                  batchVersion: Long): DataFrame = {
    val meta = readMeta(spark, path)
    val (minCount, unitPattern) =
      (meta("minCount").toInt, decodePattern(meta("unitPattern")))
    val nBuckets = meta("nBuckets").toInt
    val fresh = bucketed(censusOf(batch, idCol, textCol, unitPattern),
      nBuckets).withColumn("first_batch", lit(batchVersion))
    TxLog.appendOnce(fresh, path, appId, batchVersion,
      partitionCol = Some("bucket"))
    cleanAgainst(batch, idCol, textCol, minCount, unitPattern,
      TxLog.read(spark, path).filter(col("first_batch") < batchVersion))
  }

  /** CENSUS COMPACTION — bound the per-hash row growth (the append-only
    * design keeps one counted row per batch that saw a hash, so a hot
    * boilerplate hash accumulates a row per ingest forever): sum-merge
    * every census row of batches STRICTLY EARLIER than `upTo` into ONE row
    * per hash. The merged row carries `first_batch = max(merged
    * first_batch)` — so any strictly-earlier-batch fence with
    * `batchVersion >= upTo` (every future ingest, and a replay of the
    * latest batch) sees EXACTLY the per-hash sums it saw before: the
    * merged row is inside its `first_batch < batchVersion` window and
    * carries the same total (probe bit-identity is spec'd). Rows of
    * batches `>= upTo` are kept as-is.
    *
    * One [[TxLog.overwrite]] manifest swap — readers see the old or the
    * new census, never a mix, and the `@txn:` exactly-once watermarks ride
    * through the overwrite untouched, so a replayed batch's append still
    * no-ops after compaction.
    *
    * CALLER CONTRACT: only compact past batches that can no longer replay
    * — `upTo` at most the ingest watermark (a replay of a batch `< upTo`
    * would see the merged row excluded by its own fence and under-count;
    * streaming restarts only ever replay the latest uncommitted batch, so
    * `upTo = <last committed batchVersion>` is always safe). Run every
    * K-th ingest, the [[TxLog]] checkpoint cadence.
    *
    * Returns the new table version. Scale shape: one census-sized
    * hash-aggregate (the census is distinct-lines-sized, not corpus-
    * sized), bucket partitioning preserved so probes keep their pruning.
    */
  def compactCensus(spark: SparkSession, path: String, upTo: Long): Long = {
    readMeta(spark, path) // fail loudly on a non-line-store path
    val cur = TxLog.read(spark, path)
    val cols = Seq("h", "cnt", "bucket", "first_batch").map(col)
    val merged = cur.filter(col("first_batch") < upTo)
      .groupBy("bucket", "h")
      .agg(sum(col("cnt")).as("cnt"),
        max(col("first_batch")).as("first_batch"))
      .select(cols: _*)
    val recent = cur.filter(col("first_batch") >= upTo).select(cols: _*)
    TxLog.overwrite(merged.unionByName(recent), path,
      partitionCol = "bucket")
  }
}
