package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling to a fixed bucket grid with last-observation-
  * carried-forward (LOCF) gap-fill: for every key and every bucket in the
  * observed time span, the value of the latest observation at or before the
  * bucket's end — the "as-of sampled" series feature stores and training
  * pipelines materialize from irregular event streams.
  *
  * Scale shape: this is the UNION-window formulation, not a join — grid
  * rows (one per key × bucket, value NULL) and observation rows merge into
  * one stream, and a single per-key ordered window pass carries the last
  * non-NULL value forward. One shuffle + sort total, the same cost as any
  * per-key window; no per-bucket as-of join, no range join, no driver loop.
  * The carried value is SELECTED, never recomputed arithmetically, so the
  * output is deterministic and engine-portable wherever the (ts, tag, seq)
  * ordering is total — the observation sequence column breaks ts ties, and
  * grid rows sort AFTER observations at the same microsecond so a bucket
  * boundary sees every event on it.
  *
  * Buckets are epoch-based (`bucket = ts div bucketUs`), so the grid needs
  * no anchor row and two tables resampled independently land on the same
  * grid. The span is [min bucket, max bucket] across the whole input (one
  * metadata-sized aggregate, broadcast into the grid build); keys with no
  * observation before a bucket report NULL (honest leading gap, exactly
  * what LOCF means).
  *
  * Returns (keyCol, bucket, value_locf).
  */
object Resample {

  def locf(obs: DataFrame, keyCol: String, tsUsCol: String, valCol: String,
           seqCol: String, bucketUs: Long = 86400000000L): DataFrame = {
    val ev = obs.select(col(keyCol).as("k"), col(tsUsCol).cast("long").as("ts_us"),
      col(seqCol).cast("long").as("seq"), col(valCol).cast("double").as("v"))
    // exact integer division (`div`), not `/`: double-rounded quotients at
    // epoch-µs magnitudes are a latent off-by-one at bucket boundaries
    val bucketOf = expr(s"ts_us div ${bucketUs}L")
    val bounds = ev.agg(min(bucketOf).as("b0"), max(bucketOf).as("b1"))
    val grid = ev.select(col("k")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
      .select(col("k"), col("bucket"),
        ((col("bucket") + 1) * bucketUs - 1).as("ts_us"),
        lit(1).as("is_grid"), lit(null).cast("double").as("v"),
        lit(Long.MaxValue).as("seq"))
    val tagged = ev.select(col("k"), lit(null).cast("long").as("bucket"),
      col("ts_us"), lit(0).as("is_grid"), col("v"), col("seq"))
    val w = Window.partitionBy("k")
      .orderBy(col("ts_us"), col("is_grid"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(tagged)
      .withColumn("value_locf", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("k").as(keyCol), col("bucket"), col("value_locf"))
  }

  /** Linear-interpolation resampling: the same fixed grid as [[locf]], but
    * interior gaps take the straight line between the surrounding
    * observations — `v_p + (v_n − v_p)·(t − t_p)/(t_n − t_p)` at the
    * bucket-end instant `t` — the gap-fill numeric feature stores prefer
    * when the series is a level, not an event count.
    *
    * Same UNION-window shape and cost as LOCF — ONE shuffle + ONE ordered
    * sort per key serves BOTH window directions (last-before runs
    * unbounded-preceding→current, first-after runs current→following over
    * the identical ordering, so Catalyst plans them in one Window node
    * pair on one Exchange). The carried (value, ts) pairs are SELECTED
    * from real observation rows; the one interpolation division is a
    * single double expression over exact integer timestamps — identical
    * IEEE ops in any replaying engine.
    *
    * Edge semantics: before the first observation → NULL (nothing to
    * anchor the line); after the last → carry-forward (the line has no
    * right anchor; LOCF is the honest tail). An observation exactly on a
    * bucket boundary anchors both sides (obs rows sort before the grid row
    * at the same microsecond).
    *
    * Returns (keyCol, bucket, value_interp).
    */
  def linear(obs: DataFrame, keyCol: String, tsUsCol: String, valCol: String,
             seqCol: String, bucketUs: Long = 86400000000L): DataFrame = {
    val ev = obs.select(col(keyCol).as("k"), col(tsUsCol).cast("long").as("ts_us"),
      col(seqCol).cast("long").as("seq"), col(valCol).cast("double").as("v"))
    val bucketOf = expr(s"ts_us div ${bucketUs}L")
    val bounds = ev.agg(min(bucketOf).as("b0"), max(bucketOf).as("b1"))
    val grid = ev.select(col("k")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
      .select(col("k"), col("bucket"),
        ((col("bucket") + 1) * bucketUs - 1).as("ts_us"),
        lit(1).as("is_grid"), lit(null).cast("double").as("v"),
        lit(null).cast("long").as("ots"), lit(Long.MaxValue).as("seq"))
    val tagged = ev.select(col("k"), lit(null).cast("long").as("bucket"),
      col("ts_us"), lit(0).as("is_grid"), col("v"),
      col("ts_us").as("ots"), col("seq"))
    val ord = Seq(col("ts_us"), col("is_grid"), col("seq"))
    val wPrev = Window.partitionBy("k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("k").orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.unionByName(tagged)
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(col("ots"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(col("ots"), ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .select(col("k").as(keyCol), col("bucket"),
        when(col("pv").isNull, lit(null).cast("double"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("ts_us") - col("pt")).cast("double") /
            (col("nt") - col("pt")).cast("double"))
          .as("value_interp"))
  }
}
