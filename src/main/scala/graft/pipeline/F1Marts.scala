package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mart models (`/root/reference/dbt/models/marts *.sql`) — the reference
  * materializes these as tables; the runner ([[F1Pipeline]]) writes them as
  * partitioned Parquet.
  */
object F1Marts {

  private val lapDetailCols = Seq(
    "meeting_key", "session_key", "driver_number", "lap_number", "lap_start_time",
    "lap_time", "sector1_time", "sector2_time", "sector3_time",
    "i1_speed_kph", "i2_speed_kph", "st_speed_kph", "is_pit_out_lap",
    "season_year", "is_realtime", "race_position",
    "prev_lap_time", "next_lap_time", "rolling_avg_5_laps", "pace_momentum",
    "pace_stability_index", "degradation_index", "position_momentum",
    "performance_score_raw", "pace_state", "track_position_state")

  /** `fct_driver_laps.sql`: per-lap projection of the feature layer. */
  def fctDriverLaps(features: DataFrame): DataFrame =
    features.select(lapDetailCols.map(col): _*)

  private def summaryAgg(laps: DataFrame): DataFrame =
    laps.groupBy("meeting_key", "session_key", "driver_number").agg(
      min("lap_number").as("first_lap"), max("lap_number").as("last_lap"),
      min("race_position").as("best_position"), max("race_position").as("worst_position"),
      min("lap_time").as("best_lap_time"), avg("lap_time").as("avg_lap_time"),
      avg("pace_stability_index").as("avg_psi"),
      avg("degradation_index").as("avg_degradation"),
      avg("performance_score_raw").as("avg_performance_score"),
      sum(when(col("is_pit_out_lap"), 1).otherwise(0)).as("pit_stop_count"))

  /** `fct_driver_race_summary.sql:7-30` (A1–A3). */
  def fctDriverRaceSummary(features: DataFrame): DataFrame =
    summaryAgg(features)

  /** `final_f1.sql:37-83` (J2): every lap row carries its session-level
    * aggregates. Reference-faithful detail⋈aggregate back-join — the
    * aggregate side is small (drivers × sessions), so Catalyst/AQE
    * broadcasts it. The scale path is [[finalF1Windowed]].
    */
  def finalF1(features: DataFrame): DataFrame = {
    val laps = features.select(lapDetailCols.map(col): _*)
    laps.join(summaryAgg(laps), Seq("meeting_key", "session_key", "driver_number"), "left")
  }

  /** Scale-path twin of [[finalF1]]: the per-driver aggregates as unbounded
    * window functions over the SAME partition keys the feature layer is
    * already hash-partitioned on — no self-join, no second evaluation of the
    * feature lineage, no extra exchange (the join form re-reads `features`
    * for the aggregate side, and Spark re-evaluates everything above the last
    * exchange per consumer). Aggregation buffers are per-group scalars, so
    * memory is O(1) per key at any scale. Row-equal to [[finalF1]]
    * (spec-proven; the join is a left join against an aggregate of the same
    * frame, so every detail row matches exactly one summary row).
    */
  def finalF1Windowed(features: DataFrame): DataFrame = {
    val w = Window.partitionBy("meeting_key", "session_key", "driver_number")
    // the single-pass feature layer arrives hash-partitioned by (meeting,
    // session) — which SATISFIES this window's clustering, so Spark would run
    // the whole 10-window stack at session granularity (few, large
    // partitions). Re-partitioning to the per-driver grain costs one exchange
    // of the projected frame and buys back full-cluster parallelism for the
    // heaviest mart stage (measured net win from 20 → 32-way locally; at
    // scale, drivers×sessions ≫ executors while sessions alone may not be).
    features.select(lapDetailCols.map(col): _*)
      .repartition(col("meeting_key"), col("session_key"), col("driver_number"))
      .withColumn("first_lap", min(col("lap_number")).over(w))
      .withColumn("last_lap", max(col("lap_number")).over(w))
      .withColumn("best_position", min(col("race_position")).over(w))
      .withColumn("worst_position", max(col("race_position")).over(w))
      .withColumn("best_lap_time", min(col("lap_time")).over(w))
      .withColumn("avg_lap_time", avg(col("lap_time")).over(w))
      .withColumn("avg_psi", avg(col("pace_stability_index")).over(w))
      .withColumn("avg_degradation", avg(col("degradation_index")).over(w))
      .withColumn("avg_performance_score", avg(col("performance_score_raw")).over(w))
      .withColumn("pit_stop_count",
        sum(when(col("is_pit_out_lap"), 1).otherwise(0)).over(w))
  }
}
