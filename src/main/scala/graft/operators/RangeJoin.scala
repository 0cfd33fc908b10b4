package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan (extension
  * scope; the general form of the reference's interval-endpoint semantics,
  * `dags/open_f1_historical.py:267-268`, closed as q43 — here for ARBITRARY
  * interval tables, not just as-of ordering).
  *
  * Spark plans `p.v BETWEEN i.lo AND i.hi` with no equi-key as
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) compared pairs, the
  * classic 100 TB killer. The standard fix (bucketed/bin range join, what
  * Databricks' range-join hints and GeoSpark grids do): quantize the domain
  * into fixed-width bins, explode each interval into every bin it touches,
  * equi-join on the bin id (hash shuffle, partial-aggregable, AQE-skew-
  * splittable), then apply the BETWEEN as a residual filter. A point lands
  * in exactly ONE bin, so no post-join dedup is needed; compared pairs drop
  * to Σ_bins |points_b|·|intervals_b|.
  *
  * `binWidth` trades replication against selectivity: intervals explode into
  * `len/binWidth + 1` rows (choose ≈ the median interval length), and a bin
  * join key means wildly-long intervals replicate proportionally — cap or
  * split outliers upstream if the interval-length distribution is heavy-
  * tailed (same salting logic as any skewed key).
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them:
    * `points.pointCol ∈ [intervals.loCol, intervals.hiCol]` (both ends
    * inclusive). Columns of both inputs pass through; bounds must be
    * numeric and non-null.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / lit(binWidth)).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / lit(binWidth)).cast("long"),
        floor(col(hiCol) / lit(binWidth)).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
