package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Session-selection semantics of the ingest DAGs (SURVEY §3.1/§3.3): the
  * priority top-1, the trailing-window scope, the realtime/historical
  * handoff, and the FIXTURES.md edge rows (missing session_name, future
  * date_end, Qualifying newer than the latest Race).
  */
class IngestControllerSpec extends SparkSpec {

  private val N: String = null
  private val now = lit("2023-11-30 00:00:00").cast("timestamp")

  //                 sk    mk    year    date_start                date_end                  session_name  session_type meeting_name
  private def sessions = strDf(F1Schemas.sessions, Seq(
    Seq("1", "100", "2023", "2023-11-01 10:00:00", "2023-11-01 12:00:00", "Race", "Race", "GP A"),
    Seq("2", "100", "2023", "2023-11-20 10:00:00", "2023-11-20 12:00:00", "Race", "Race", "GP B"),
    // Qualifying NEWER than the latest Race — Race must still win the top-1
    Seq("3", "100", "2023", "2023-11-25 10:00:00", "2023-11-25 12:00:00", "Qualifying", "Qualifying", "GP C"),
    // future date_end — excluded by completed-only
    Seq("4", "100", "2023", "2023-12-05 10:00:00", "2023-12-05 12:00:00", "Race", "Race", "GP D"),
    // Practice — excluded by SESSIONS_FILTER
    Seq("5", "100", "2023", "2023-11-22 10:00:00", "2023-11-22 12:00:00", "Practice", "Practice", "GP E"),
    // missing session_name → falls back to session_type ('Race'), missing meeting_name
    Seq("6", "100", "2023", "2023-06-01 10:00:00", "2023-06-01 12:00:00", N, "Race", N)))

  test("O1: Race beats a newer Qualifying; completed-only") {
    val top = IngestController.latestCompletedSession(sessions, now).collect()
    assert(top.length == 1)
    assert(top.head.getAs[String]("session_key") == "2") // not quali 3, not future 4
  }

  test("F6 fallbacks applied: session_name from type, Unknown GP") {
    val p = IngestController.prepared(sessions)
    val s6 = p.filter(col("session_key") === "6").head()
    assert(s6.getAs[String]("session_name") == "Race")
    assert(s6.getAs[String]("meeting_name") == "Unknown GP")
    assert(s6.getAs[Int]("type_priority") == 1)
  }

  test("historical scope: windowed, filtered, latest excluded, ascending order") {
    val scope = IngestController.historicalScope(sessions, now).collect()
    val keys = scope.map(_.getAs[String]("session_key")).toSeq
    // within 120d of now-ish: sk 1,2,3 qualify by type+completion; 2 is the
    // latest (realtime-owned) → excluded; 6 is outside the 120-day window
    assert(keys == Seq("1", "3"))
  }
}
