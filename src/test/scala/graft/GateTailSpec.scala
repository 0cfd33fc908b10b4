package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate-tail guard (round-10 item 2, third-round-running gap-class):
  * every registry query MUST have a per-query budget row in
  * SHUFFLE_BASELINE.json and a ×10 sweep row in BENCH_sf1.json — a query
  * missing from either is invisible to the ghost adjudicator and the
  * cross-scale audit. This spec fails `sbt test` the moment a new query
  * lands without its artifacts; Bench additionally reports the same set as
  * `no_budget` at run time.
  *
  * Pure file check — no Spark session, costs nothing.
  */
class GateTailSpec extends AnyFunSuite {

  private def queryKeysOf(file: String): Set[String] = {
    val p = java.nio.file.Paths.get(file)
    assert(java.nio.file.Files.exists(p), s"$file missing from repo root")
    val json = java.nio.file.Files.readString(p)
    val body = "\"queries\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(fail(s"$file has no queries map"))
    "\"(q\\d+[a-z0-9_]*)\"\\s*:".r.findAllMatchIn(body).map(_.group(1)).toSet
  }

  private val registry = SparkEntry.queries.keySet

  test("every registry query has a SHUFFLE_BASELINE budget row") {
    val missing = registry -- queryKeysOf("SHUFFLE_BASELINE.json")
    assert(missing.isEmpty,
      s"queries with NO budget row (ghost adjudication blind): " +
        missing.toSeq.sorted.mkString(", ") +
        " — run the query at sf0.1 and merge via tools/refresh_baseline.py")
  }

  test("every registry query has a x10 sweep row in BENCH_sf1.json") {
    val missing = registry -- queryKeysOf("BENCH_sf1.json")
    assert(missing.isEmpty,
      s"queries missing from the x10 sweep: " +
        missing.toSeq.sorted.mkString(", ") +
        " — regenerate target/scale10x (graft.tools.ScaleStress) and " +
        "re-run Bench with SPARK_GRAFT_SF_DIR=target/scale10x")
  }

  test("budgets carry shuffle-byte rows (the ratchet guard's evidence)") {
    val budgets = queryKeysOf("SHUFFLE_BASELINE.json")
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SHUFFLE_BASELINE.json"))
    val wireBody = "\"shuffle_write_mb\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(fail("SHUFFLE_BASELINE.json has no shuffle_write_mb map"))
    val wire = "\"(q\\d+[a-z0-9_]*)\"\\s*:".r
      .findAllMatchIn(wireBody).map(_.group(1)).toSet
    val missing = budgets -- wire
    assert(missing.isEmpty,
      s"budget rows without shuffle-byte evidence (min-merge can't tell " +
        s"plan changes from noise): ${missing.toSeq.sorted.mkString(", ")}")
  }
}
