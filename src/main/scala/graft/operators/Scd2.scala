package graft.operators

import graft.sources.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 maintenance on the versioned transaction
  * log: every attribute change closes the key's current row
  * (`valid_to` = change time, `is_current` = false) and opens a new one, so
  * the dimension carries its full history and any fact can join the version
  * that was current at its event time (the Kimball SCD2 pattern — the
  * warehouse operator the reference's dbt staging layer would reach for the
  * moment a driver changed teams mid-season).
  *
  * Storage/scale shape: the dimension lives as a [[TxLog]] table partitioned
  * by a stable hash bucket of the key. A merge reads ONLY the buckets the
  * update batch touches (manifest-side pruning), detects real changes with
  * one join against the current rows, and commits the rewritten buckets +
  * new versions as ONE manifest swap with first-committer-wins OCC
  * (`expectedVersion` = the snapshot the merge derived from) — the same
  * serializable-merge rule as [[TxLog.mergeKeys]]. Rewrite volume is bounded
  * by the touched buckets, never the dimension; no-op updates (attributes
  * unchanged) rewrite nothing at the row level and produce no new version
  * rows. History rows are immutable once closed.
  *
  * Contract: at most one update row per key per batch (pre-aggregate
  * upstream if a feed can repeat keys), batches applied in nondecreasing
  * `effectiveCol` order, keys non-null.
  */
object Scd2 {

  val BucketCol = "scd_bucket"

  private def withBucket(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(keyCol)), lit(buckets)))

  /** Shape an update batch (key, attrs, __eff) as open version rows. */
  private def asOpenRows(u: DataFrame, keyCol: String, attrCols: Seq[String]): DataFrame =
    u.select(
      (col(keyCol) +: attrCols.map(col)) ++ Seq(
        col("__eff").as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)

  /** Apply one update batch to the dimension at `path`. Creates the table on
    * first call. Returns the committed version.
    */
  def merge(updates0: DataFrame, path: String, keyCol: String,
            attrCols: Seq[String], effectiveCol: String,
            buckets: Int = 16): Long = {
    val spark = updates0.sparkSession
    val updates = updates0.select(
      (col(keyCol) +: attrCols.map(col)) :+
        col(effectiveCol).cast("long").as("__eff"): _*)
    val v0 = TxLog.currentVersion(spark, path)
    if (v0 < 0)
      return TxLog.append(
        withBucket(asOpenRows(updates, keyCol, attrCols), keyCol, buckets),
        path, BucketCol)

    val upd = withBucket(updates, keyCol, buckets)
    // bucket count is a small constant — driver state is bounded by design
    val touched = upd.select(col(BucketCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val cur = TxLog.read(spark, path, v0)
      .filter(col(BucketCol).cast("string").isin(touched.toSeq: _*))
    val curNow = cur.filter(col("is_current"))

    // updates whose attribute tuple actually differs from the current row
    // (NULL-safe compare — a NULL→value flip is a real change)
    val attrsDiffer = attrCols.map(a => !(col(s"c.$a") <=> col(s"u.$a"))).reduce(_ || _)
    val changed = curNow.as("c")
      .join(upd.as("u"), col(s"c.$keyCol") === col(s"u.$keyCol"))
      .filter(attrsDiffer)
      .select(
        (col(s"u.$keyCol").as(keyCol) +: attrCols.map(a => col(s"u.$a").as(a))) ++
          Seq(col("u.__eff").as("__eff"), col(s"u.$BucketCol").as(BucketCol)): _*)
    val newKeys = upd.join(curNow, Seq(keyCol), "left_anti")
    val inserts = withBucket(
      asOpenRows(changed.unionByName(newKeys), keyCol, attrCols), keyCol, buckets)

    // close the changed keys' current rows; history rows pass through as-is
    val closeAt = changed.select(col(keyCol), col("__eff").as("__close_at"))
    val adjusted = cur.join(closeAt, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("__close_at").isNotNull && col("is_current"), col("__close_at"))
          .otherwise(col("valid_to")))
      .withColumn("is_current",
        when(col("__close_at").isNotNull, lit(false)).otherwise(col("is_current")))
      .drop("__close_at")

    TxLog.replaceKeys(adjusted.unionByName(inserts), path, BucketCol,
      expectedVersion = v0)
  }

  /** The dimension as of event time `t`: the version rows whose validity
    * interval contains `t` (half-open [valid_from, valid_to)).
    */
  def asOf(spark: SparkSession, path: String, t: Long): DataFrame =
    TxLog.read(spark, path)
      .filter(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .drop(BucketCol)

  /** Current dimension rows only. */
  def current(spark: SparkSession, path: String): DataFrame =
    TxLog.read(spark, path).filter(col("is_current")).drop(BucketCol)

  /** Enrich facts with the dimension version valid at each fact's event time
    * — THE point of keeping SCD2 history: `fact ⋈ dim ON key AND
    * valid_from ≤ t < valid_to` (half-open; `valid_to IS NULL` = current).
    * LEFT join: facts predating their key's first version (or with no
    * dimension key at all) keep NULL attributes rather than dropping.
    *
    * Scale shape: this is ONE equi-join on the key — Spark shuffles/AQE-
    * broadcasts it like any dimension join — with the interval containment
    * as a residual over each key's handful of version rows (version count
    * is bounded by the key's change history, not the table), so there is no
    * range-explosion and no window pass over the facts.
    */
  def temporalJoin(facts: DataFrame, factKeyCol: String, factTimeCol: String,
                   path: String, dimKeyCol: String): DataFrame = {
    val dim = TxLog.read(facts.sparkSession, path).drop(BucketCol)
    val t = facts(factTimeCol).cast("long")
    facts.join(dim,
      facts(factKeyCol) === dim(dimKeyCol) &&
        dim("valid_from") <= t &&
        (dim("valid_to").isNull || dim("valid_to") > t),
      "left")
      .drop(dim(dimKeyCol))
  }
}
