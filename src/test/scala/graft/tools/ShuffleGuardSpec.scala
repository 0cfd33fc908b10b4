package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-regression guard, self-enforced: the pure comparison must go
  * red on injected regressions and stay green on noise, and — whenever the
  * bench has produced `target/bench_last.json` — HEAD's measured shuffle
  * bytes must sit within the committed `SHUFFLE_BASELINE.json` budget.
  */
class ShuffleGuardSpec extends AnyFunSuite {

  test("injected 2x+ shuffle growth is flagged; noise-floor growth is not") {
    val base = Map("q1" -> 10.0, "q2" -> 0.2, "q3" -> 50.0)
    // q1 regresses 3x -> flagged; q2 grows 4x but stays under the 1 MB
    // noise floor -> clean; q3 shrinks -> clean; q9 is new -> skipped
    val cur = Map("q1" -> 30.0, "q2" -> 0.8, "q3" -> 40.0, "q9" -> 99.0)
    val fs = ShuffleGuard.flags(base, cur, Map.empty, Map.empty)
    assert(fs.length == 1 && fs.head.startsWith("q1:"), fs.mkString("; "))
    // exactly at the 2x boundary: not flagged (strict >)
    assert(ShuffleGuard.flags(Map("q" -> 10.0), Map("q" -> 20.0),
      Map.empty, Map.empty).isEmpty)
    assert(ShuffleGuard.flags(Map("q" -> 10.0), Map("q" -> 20.1),
      Map.empty, Map.empty).nonEmpty)
  }

  test("a query that starts spilling is flagged even with flat shuffle bytes") {
    val w = Map("q1" -> 10.0)
    assert(ShuffleGuard.flags(w, w, Map("q1" -> 0.0), Map("q1" -> 64.0))
      .exists(_.contains("NEW SPILL")))
    // spill under the noise floor, or already present in the baseline: clean
    assert(ShuffleGuard.flags(w, w, Map("q1" -> 0.0), Map("q1" -> 0.5)).isEmpty)
    assert(ShuffleGuard.flags(w, w, Map("q1" -> 32.0), Map("q1" -> 64.0)).isEmpty)
  }

  test("HEAD: the last bench run stays within the committed shuffle baseline") {
    val baseline = new java.io.File("SHUFFLE_BASELINE.json")
    val last = new java.io.File("target/bench_last.json")
    assume(baseline.exists(), "no committed SHUFFLE_BASELINE.json")
    assume(last.exists(), "bench has not run in this workspace")
    val fs = ShuffleGuard.checkFiles(baseline.getPath, last.getPath)
    assert(fs.isEmpty, "shuffle regressions vs baseline:\n  " + fs.mkString("\n  "))
  }
}
