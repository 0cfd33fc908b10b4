package graft.operators

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  test("two triangles with one bridge: each triangle converges to one label") {
    // triangle A: 1-2-3; triangle B: 10-11-12; bridge 3-10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("s", "d")
    val out = LabelProp.propagate(edges, "s", "d", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle A all agree; min-label tie-breaking pulls toward 1
    assert(Set(1L, 2L, 3L).map(out).size == 1)
    assert(out(1L) == 1L)
    // triangle B agrees internally (the bridge may pull node 10 toward A's
    // label only if its majority says so — 10's neighbors are 11, 12, 3)
    assert(out(11L) == out(12L))
  }

  test("self-loops and duplicate/reversed edges are normalized away") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("s", "d")
    // one undirected edge 1-2 survives; a lone pair OSCILLATES under
    // synchronous update (the documented LPA behavior the fixed round
    // count exists for): swap after odd rounds, home after even rounds
    def run(r: Int) = LabelProp.propagate(edges, "s", "d", rounds = r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) == Map(1L -> 2L, 2L -> 1L))
    assert(run(2) == Map(1L -> 1L, 2L -> 2L))
  }

  test("adaptive convergence: converged labels exit early with identical output") {
    // two disjoint triangles converge in 2 rounds; a 40-round budget must
    // not pay 40 vote shuffles. Synchronous LPA is a pure function of the
    // previous labeling, so one unchanged round proves all the rest.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("s", "d")
    val (adaptive, executed) =
      LabelProp.propagateWithStats(edges, "s", "d", rounds = 40)
    assert(executed < 40, s"expected early exit, ran $executed rounds")
    val forced = LabelProp.propagate(edges, "s", "d", rounds = 40,
      adaptive = false)
    assert(adaptive.collect().map(_.toSeq).toSet ==
      forced.collect().map(_.toSeq).toSet)
  }
}
