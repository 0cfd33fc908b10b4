package graft.pipeline

import graft.operators.Cleaning
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's ingest orchestration semantics
  * (`/root/reference/dags/open_f1_historical.py:173-231`,
  * `dags/open_f1_realtime.py:175-218`), as pure DataFrame transforms: which
  * sessions does a run load, in what order, and which one does the realtime
  * path own. `now` is always passed explicitly (determinism — SURVEY §2.9 Q3).
  */
object IngestController {

  val SessionsFilter: Seq[String] = Seq("Race", "Qualifying") // SESSIONS_FILTER :34
  val WindowDays = 120                                        // WINDOW_DAYS :31

  /** Parse + default-fill the raw all-string sessions table (F5/F6/F7):
    * coercing timestamp parse, `meeting_name` → 'Unknown GP',
    * `session_name` falls back to `session_type` then 'Unknown',
    * `type_priority` = 1 for Race.
    */
  def prepared(rawSessions: DataFrame): DataFrame = {
    val base = rawSessions
      .withColumn("date_start", Cleaning.parseTimestampCoercing(col("date_start")))
      .withColumn("date_end", Cleaning.parseTimestampCoercing(col("date_end")))
      .withColumn("session_name",
        coalesce(col("session_name"), col("session_type"), lit("Unknown")))
    Cleaning.fillDefault(base, "meeting_name", "Unknown GP")
      .withColumn("type_priority", Cleaning.typePriority(col("session_name"), "Race"))
  }

  private def completedRaceQuali(s: DataFrame, now: Column): DataFrame =
    s.filter(col("session_name").isin(SessionsFilter: _*) && col("date_end") <= now)

  /** O1: the session the realtime path owns — completed Race/Qualifying,
    * Race preferred over Qualifying, then most recent
    * (`dags/open_f1_realtime.py:208-215`). Key tie-break appended for
    * determinism.
    */
  def latestCompletedSession(sessions: DataFrame, now: Column): DataFrame =
    completedRaceQuali(prepared(sessions), now)
      .orderBy(col("type_priority").desc, col("date_end").desc, col("session_key").desc)
      .limit(1)

  /** Q1/Q2/Q3/Q4: the historical run's scope — completed Race/Qualifying
    * within the trailing window, EXCLUDING the latest session (owned by the
    * realtime path; the handoff rule of SURVEY §2.10), ordered ascending by
    * end time for the load loop (O2, `dags/open_f1_historical.py:228`).
    */
  def historicalScope(sessions: DataFrame, now: Column,
                      windowDays: Int = WindowDays): DataFrame = {
    val s = completedRaceQuali(prepared(sessions), now)
      .filter(col("date_end") >= now - expr(s"INTERVAL $windowDays DAYS"))
    val latest = latestCompletedSession(sessions, now)
      .select(col("session_key").as("__latest_key"))
    s.join(broadcast(latest), col("session_key") === col("__latest_key"), "left_anti")
      .orderBy(col("date_end").asc)
  }
}
