package graft.pipeline

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Raw ("bronze") schemas for the five OpenF1 endpoints — all-string, exactly
  * as the reference stores them (every value stringified,
  * `/root/reference/dags/open_f1_historical.py:72-77`; tables auto-created
  * all-VARCHAR `:112-113`). Column sets are what the staging models consume
  * plus the keys backfilled at ingest (`:260-265`); see FIXTURES.md §A.
  */
object F1Schemas {

  private def strings(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  val laps: StructType = strings(
    "meeting_key", "session_key", "driver_number", "lap_number", "date_start",
    "duration_sector_1", "duration_sector_2", "duration_sector_3", "lap_duration",
    "i1_speed", "i2_speed", "st_speed", "is_pit_out_lap", "year",
    "segments_sector_1", "segments_sector_2", "segments_sector_3")

  val position: StructType = strings(
    "date", "session_key", "meeting_key", "driver_number", "position", "year")

  val raceControl: StructType = strings(
    "meeting_key", "session_key", "date", "driver_number", "lap_number",
    "category", "flag", "scope", "sector", "message", "year")

  val intervals: StructType = strings(
    "meeting_key", "session_key", "year", "driver_number",
    "gap_to_leader", "interval", "date")

  val sessions: StructType = strings(
    "session_key", "meeting_key", "year", "date_start", "date_end",
    "session_name", "session_type", "meeting_name")
}
