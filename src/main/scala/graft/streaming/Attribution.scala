package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-to-event attribution — the stream-stream INTERVAL join (§2.10
  * extension): purchases matched to the views that preceded them within an
  * attribution window, per user. The canonical Structured Streaming
  * stream-stream join shape: equi-key (user) + event-time range condition,
  * with watermarks on BOTH sides bounding join state — a view's state can be
  * dropped once the purchase-side watermark passes `view_ts + window`, so
  * state is O(open window), not O(history).
  *
  * The batch twins run the same semantics over epoch-µs longs (exact integer
  * arithmetic → DuckDB-replayable, q73): an equi-join on user + residual
  * range filter — never a time-theta nested loop — then last-touch
  * attribution as a `max_by` aggregate (map-side combined; the shuffle
  * carries one candidate per (purchase, map partition), not every pair).
  */
object Attribution {

  /** All (view, purchase) pairs with `0 < purchase_ts - view_ts ≤ windowUs`,
    * same user. Batch twin of [[attributionPairsStream]]; inputs carry
    * `(event_id, user_id, ts_us)`.
    */
  def attributionPairsBatch(views: DataFrame, purchases: DataFrame,
                            windowUs: Long): DataFrame = {
    val v = views.select(col("event_id").as("view_id"), col("user_id"),
      col("ts_us").as("view_us"))
    val p = purchases.select(col("event_id").as("purchase_id"), col("user_id"),
      col("ts_us").as("purchase_us"))
    p.join(v, Seq("user_id"))
      .filter(col("purchase_us") > col("view_us") &&
        col("purchase_us") - col("view_us") <= windowUs)
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("view_id"), (col("purchase_us") - col("view_us")).as("delay_us"))
  }

  /** Last-touch attribution: ONE row per purchase, credited to the latest
    * in-window view (ties broken by highest view id — total order, so the
    * result is engine-exact). `max_by` over the joined candidates, not a
    * window sort: the aggregate partial-combines map-side.
    */
  def lastTouchBatch(views: DataFrame, purchases: DataFrame,
                     windowUs: Long): DataFrame =
    attributionPairsBatch(views, purchases, windowUs)
      .groupBy(col("purchase_id"), col("user_id"), col("purchase_us"))
      .agg(
        max_by(col("view_id"),
          struct((-col("delay_us")).as("o1"), col("view_id").as("o2"))).as("view_id"),
        min(col("delay_us")).as("delay_us"))

  /** Linear multi-touch attribution: every in-window view shares a
    * purchase's credit equally (1/n each) — the fairness counterpoint to
    * [[lastTouchBatch]]. Per-view credit is the sum of its shares across
    * purchases. The per-purchase candidate count is a purchase-partitioned
    * window over the pair frame (bounded by the window's view fan-in), and
    * the final credit aggregate partial-combines map-side.
    */
  def linearTouchBatch(views: DataFrame, purchases: DataFrame,
                       windowUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = attributionPairsBatch(views, purchases, windowUs)
    val perPurchase = Window.partitionBy(col("purchase_id"))
    pairs.withColumn("__n", count(lit(1)).over(perPurchase))
      .groupBy(col("view_id"), col("user_id"))
      .agg(sum(lit(1.0) / col("__n")).as("credit"),
        count(lit(1)).as("n_purchases"))
  }

  /** Unattributed conversions — purchases with NO view inside the window
    * (the funnel-health signal an alerting job watches): one anti-join on
    * the same equi-key + range condition, so the non-answer is computed as
    * cheaply as the answer. Batch twin of [[attributionLeftStream]]'s
    * NULL-view rows.
    */
  def unattributedBatch(views: DataFrame, purchases: DataFrame,
                        windowUs: Long): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
      col("user_id").as("v_user"), col("ts_us").as("view_us"))
    val p = purchases.select(col("event_id").as("purchase_id"), col("user_id"),
      col("ts_us").as("purchase_us"))
    p.join(v, col("user_id") === col("v_user") &&
        col("purchase_us") > col("view_us") &&
        col("purchase_us") - col("view_us") <= windowUs, "left_anti")
  }

  /** LEFT-OUTER stream-stream join: every purchase emits exactly once —
    * paired with each in-window view when views exist, or as ONE NULL-view
    * row once the view-side watermark proves no match can still arrive
    * (Structured Streaming holds the outer row in state until then; same
    * state bound as the inner join plus the pending-outer rows). The
    * NULL-view rows are the streaming form of [[unattributedBatch]].
    */
  def attributionLeftStream(views: DataFrame, purchases: DataFrame,
                            maxDelay: String = "30 minutes",
                            watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
      col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(v, expr(
      s"""user_id = v_user AND
         |purchase_ts > view_ts AND
         |purchase_ts <= view_ts + interval $maxDelay""".stripMargin),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))
  }

  /** The streaming form: both inputs carry `(event_id, user_id, ts)` with a
    * real timestamp `ts`. Watermarks bound the join state on both sides;
    * `maxDelay` is the attribution window. Emits the same pair rows as
    * [[attributionPairsBatch]] once both sides' watermarks pass.
    */
  def attributionPairsStream(views: DataFrame, purchases: DataFrame,
                             maxDelay: String = "30 minutes",
                             watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"), col("user_id"),
      col("ts").as("view_ts")).withWatermark("view_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    v.join(p, expr(
      s"""user_id = p_user AND
         |purchase_ts > view_ts AND
         |purchase_ts <= view_ts + interval $maxDelay""".stripMargin))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))
  }
}
