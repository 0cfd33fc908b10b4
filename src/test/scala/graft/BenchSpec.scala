package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's sub-floor regression marker (round-12 verdict item
  * 7): the 0.25 s ghost floor must keep absorbing box-noise walls from the
  * re-run protocol, but a sub-floor query sitting >1.5x its budget has to
  * stay VISIBLE in the artifact.
  */
class BenchSpec extends AnyFunSuite {

  test("subFloorRatio marks sub-floor >1.5x-budget queries and nothing else") {
    // under the floor AND regressed: marked with the budget ratio
    assert(Bench.subFloorRatio(0.20, Some(0.10), failed = false)
      .contains(2.0))
    // over the floor: the ghost adjudicator owns it — not marked here
    assert(Bench.subFloorRatio(0.30, Some(0.10), failed = false).isEmpty)
    // under the floor but within budget: clean
    assert(Bench.subFloorRatio(0.12, Some(0.10), failed = false).isEmpty)
    // exactly at 1.5x: not a regression (strict inequality)
    assert(Bench.subFloorRatio(0.15, Some(0.10), failed = false).isEmpty)
    // no budget row: GateTailSpec owns that invariant — not marked here
    assert(Bench.subFloorRatio(0.20, None, failed = false).isEmpty)
    // a failed query is reported by the failed field, never as sub-floor
    assert(Bench.subFloorRatio(0.20, Some(0.10), failed = true).isEmpty)
  }
}
