package graft.pipeline

import graft.functions.GapParser
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staging models — typed cast-projections over the all-string raw layer,
  * each a pure `DataFrame => DataFrame` mirroring one dbt view
  * (`/root/reference/dbt/models/staging *.sql`). Casts use DoubleType where
  * the reference says `float` (Snowflake FLOAT is 64-bit — SURVEY §1.2).
  */
object F1Staging {

  /** `stg_openf1_laps_historical.sql:4-41` (realtime twin differs only by the
    * W1 dedup and the literal flag).
    */
  private def lapsTyped(src: DataFrame, isRealtime: Boolean): DataFrame =
    lapsTypedCols(src, lit(isRealtime))

  private def lapsTypedCols(src: DataFrame, isRealtime: Column,
                            extra: Seq[Column] = Nil): DataFrame =
    src.select(Seq(
      col("meeting_key").cast("int").as("meeting_key"),
      col("session_key").cast("int").as("session_key"),
      col("driver_number").cast("int").as("driver_number"),
      col("lap_number").cast("int").as("lap_number"),
      col("date_start").cast("timestamp").as("lap_start_time"),
      col("duration_sector_1").cast("double").as("sector1_time"),
      col("duration_sector_2").cast("double").as("sector2_time"),
      col("duration_sector_3").cast("double").as("sector3_time"),
      col("lap_duration").cast("double").as("lap_time"),
      col("i1_speed").cast("double").as("i1_speed_kph"),
      col("i2_speed").cast("double").as("i2_speed_kph"),
      col("st_speed").cast("double").as("st_speed_kph"),
      col("is_pit_out_lap").cast("boolean").as("is_pit_out_lap"),
      col("year").cast("int").as("season_year"),
      col("segments_sector_1"), col("segments_sector_2"), col("segments_sector_3"),
      isRealtime.as("is_realtime")) ++ extra: _*)

  private def lapsKeyFilter(raw: DataFrame): DataFrame =
    raw.filter(col("meeting_key").isNotNull && col("session_key").isNotNull &&
      col("driver_number").isNotNull && col("lap_number").isNotNull)

  def stgLapsHistorical(raw: DataFrame): DataFrame =
    lapsTyped(lapsKeyFilter(raw), isRealtime = false)

  /** `stg_openf1_laps_realtime.sql:5-25`: latest-record-per-lap dedup BEFORE
    * typing, ordered on the raw `date_start` STRING descending — Snowflake
    * DESC defaults to NULLS FIRST, hence `desc_nulls_first` (SURVEY §2.6).
    * ISO-8601 strings order like their timestamps, so string ordering is
    * faithful to the reference.
    */
  def stgLapsRealtime(raw: DataFrame): DataFrame =
    lapsTyped(
      Dedup.latestPerKey(lapsKeyFilter(raw),
        Seq("meeting_key", "session_key", "driver_number", "lap_number"),
        Seq(col("date_start").desc_nulls_first)),
      isRealtime = true)

  /** Tagged-union staging (scale path): ONE frame carrying both historical
    * and realtime rows (`__is_realtime` boolean), typed and key-filtered in a
    * single pass — no union of two branches, so a shared upstream (one source
    * scan) is evaluated exactly once. The raw `date_start` STRING survives as
    * `__raw_date_start` so [[F1Intermediate.lapsAllTagged]] can replay the W1
    * realtime dedup ordering (raw-string DESC, `stg_openf1_laps_realtime
    * .sql:5-25`) inside the fused dedup.
    */
  def stgLapsTagged(raw: DataFrame): DataFrame =
    lapsTypedCols(lapsKeyFilter(raw), col("__is_realtime"),
      extra = Seq(col("date_start").as("__raw_date_start")))

  /** `stg_openf1_position_historical.sql:4-24` + realtime twin. */
  def stgPosition(raw: DataFrame, isRealtime: Boolean): DataFrame =
    stgPositionCols(raw, lit(isRealtime))

  /** Tagged-union twin of [[stgPosition]] (see [[stgLapsTagged]]). */
  def stgPositionTagged(raw: DataFrame): DataFrame =
    stgPositionCols(raw, col("__is_realtime"))

  private def stgPositionCols(raw: DataFrame, isRealtime: Column): DataFrame =
    raw.filter(col("meeting_key").isNotNull && col("session_key").isNotNull &&
        col("driver_number").isNotNull && col("date").isNotNull)
      .select(
        col("date").cast("timestamp").as("event_timestamp"),
        col("session_key").cast("int").as("session_key"),
        col("meeting_key").cast("int").as("meeting_key"),
        col("driver_number").cast("int").as("driver_number"),
        col("position").cast("int").as("race_position"),
        col("year").cast("int").as("season_year"),
        isRealtime.as("is_realtime"))

  /** `stg_openf1_race_control_historical.sql:41-76`: nullif-'None' cleanup and
    * the guarded `try_to_double` on `sector`. The realtime twin
    * (`stg_openf1_race_control_realtime.sql:28`) uses a plain
    * `cast(nullif(sector,'None'))` — replicated including that asymmetry.
    */
  def stgRaceControl(raw: DataFrame, isRealtime: Boolean): DataFrame =
    stgRaceControlCols(raw,
      if (isRealtime) expr("nullif(sector, 'None')").cast("double")
      else when(trim(lower(col("sector"))).isin("nan", "none", ""), lit(null).cast("double"))
        .otherwise(GapParser.tryDouble(col("sector"))),
      lit(isRealtime))

  /** Tagged-union twin of [[stgRaceControl]]: the per-side `sector` cast
    * asymmetry (guarded historical vs the reference's unguarded realtime
    * cast) is preserved via a row-level branch — `when` evaluates lazily, so
    * the unguarded ANSI cast still only ever sees realtime values.
    */
  def stgRaceControlTagged(raw: DataFrame): DataFrame =
    stgRaceControlCols(raw,
      when(col("__is_realtime"), expr("nullif(sector, 'None')").cast("double"))
        .otherwise(
          when(trim(lower(col("sector"))).isin("nan", "none", ""), lit(null).cast("double"))
            .otherwise(GapParser.tryDouble(col("sector")))),
      col("__is_realtime"))

  private def stgRaceControlCols(raw: DataFrame, sector: Column,
                                 isRealtime: Column): DataFrame = {
    val base = raw.filter(col("meeting_key").isNotNull && col("session_key").isNotNull &&
      col("date").isNotNull && col("message").isNotNull)
    base.select(
      col("meeting_key").cast("int").as("meeting_key"),
      col("session_key").cast("int").as("session_key"),
      col("date").cast("timestamp").as("event_timestamp"),
      expr("nullif(driver_number, 'None')").cast("int").as("driver_number"),
      expr("nullif(lap_number, 'None')").cast("int").as("lap_number"),
      expr("nullif(category, 'None')").as("category"),
      expr("nullif(flag, 'None')").as("flag"),
      expr("nullif(scope, 'None')").as("scope"),
      sector.as("sector"),
      col("message"),
      isRealtime.as("is_realtime"))
  }

  /** Intervals normalization (F4) — ingested and normalized by the reference
    * (`dags/open_f1_historical.py:81-108,267-268`) though no mart consumes it
    * (SURVEY §2.1 note); kept for parity.
    */
  def normalizeIntervals(raw: DataFrame): DataFrame =
    raw.withColumn("gap_to_leader", GapParser.parseGap(col("gap_to_leader")))
      .withColumn("driver_number", GapParser.parseIntFloored(col("driver_number")).cast("string"))
}
