package graft.operators

import graft.SparkSpec

/** Fixture semantics for the bounded graph operators (k-core, BFS). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("k-core: a pendant chain peels away, the clique core survives with its degrees") {
    // K4 on {1,2,3,4} plus chain 4-5-6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("s", "d")
    val core = KCore.peel(edges, "s", "d", k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 peels 6 (deg 1) and 5 (deg 2); K4 keeps degree 3 everywhere
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("k-core: cascade — removing the first layer drags the next below k") {
    // path 1-2-3-4: degree-2 interior, degree-1 ends; k=2 unravels entirely
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(KCore.peel(edges, "s", "d", k = 2, rounds = 3).count() == 0)
  }

  test("adaptive convergence: a converged k-core exits early with identical output") {
    // K4 + pendant chain stabilizes after 2 peels; a 40-round budget must
    // not pay 40 degree shuffles
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("s", "d")
    val (adaptive, executed) =
      KCore.peelWithStats(edges, "s", "d", k = 3, rounds = 40)
    assert(executed < 40, s"expected early exit, ran $executed rounds")
    val forced = KCore.peel(edges, "s", "d", k = 3, rounds = 40,
      adaptive = false)
    assert(adaptive.collect().map(_.toSeq).toSet ==
      forced.collect().map(_.toSeq).toSet)
  }

  test("adaptive convergence: PageRank on a regular graph hits the IEEE fixpoint and exits early, bits identical") {
    // a cycle is 2-regular: every node follows ONE scalar recurrence, so
    // the power iteration reaches an exact floating-point fixpoint fast
    val n = 24
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("s", "d")
    val (adaptive, executed) =
      PageRank.pageRankWithStats(edges, "s", "d", rounds = 60)
    assert(executed < 60, s"expected early exit, ran $executed rounds")
    val forced = PageRank.pageRank(edges, "s", "d", rounds = 60, tol = -1.0)
    val a = adaptive.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val f = forced.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == f) // exact double equality: the fixpoint IS the fixed-round value
  }

  test("BFS levels: hop distances with an anti-joined settled set") {
    // 0-1, 1-2, 2-3, 0-4; maxHops 2 reaches {0},{1,4},{2}; node 3 is out
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L)).toDF("s", "d")
    val src = Seq(0L).toDF("n")
    val out = Bfs.levels(edges, "s", "d", src, "n", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 4L -> 1L, 2L -> 2L))
  }

  test("BFS levels: a node reachable two ways settles at the SHORTER level") {
    // triangle 0-1, 0-2, 1-2: node 2 is level 1 (direct), not 2 (via 1)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("s", "d")
    val out = Bfs.levels(edges, "s", "d", Seq(0L).toDF("n"), "n", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("BFS maxHops=0: returns the source set itself, materializable") {
    // frontier aliases settled at 0 hops — the release guard must not
    // truncate the returned frame's lineage
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("s", "d")
    val out = Bfs.levels(edges, "s", "d", Seq(0L).toDF("n"), "n", maxHops = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L))
  }

  test("PageRank rounds=0: uniform init ranks stay materializable after return") {
    // the init projection reads deg's checkpoint — a rounds-gated release
    // bug would throw 'checkpoint block not found' at collect time
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("s", "d")
    val out = PageRank.pageRank(edges, "s", "d", rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    out.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("recursive-CTE BFS (q164) ≡ iterative frontier BFS (q154) on real data") {
    val dir = "/root/testdata/sf0.001"
    def rows(q: String) = graft.SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val iterative = rows("q154_bfs_levels")
    val recursive = rows("q164_recursive_cte")
    assert(recursive == iterative)
    assert(recursive.nonEmpty)
  }
}
