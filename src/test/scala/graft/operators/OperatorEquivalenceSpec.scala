package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence proofs between the reference-faithful formulations and the
  * scale-path formulations (SURVEY §7.4), run over the real sf0.001 tables so
  * the distributions are non-trivial.
  */
class OperatorEquivalenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("latestPerKey window ≡ max_by aggregate (non-null total order)") {
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("unix_micros(ts)")).drop("ts")
    val a = Dedup.latestPerKey(ev, Seq("user_id", "event_type"),
      Seq(col("ts_us").desc, col("event_id").desc))
    val b = Dedup.latestPerKeyAgg(ev, Seq("user_id", "event_type"),
      Seq("ts_us", "event_id"))
    assertSameRows(a, b)
  }

  test("rollingCorr: hand-checked Pearson; constant series → NULL; full-window ≡ corr()") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 1L, 2L), (1L, 2L, 2L, 4L), (1L, 3L, 3L, 6L),   // y = 2x → corr 1
      (2L, 1L, 1L, 5L), (2L, 2L, 2L, 5L), (2L, 3L, 3L, 5L),   // constant y → NULL
      (3L, 1L, 1L, 9L), (3L, 2L, 2L, 7L), (3L, 3L, 3L, 5L)    // y = -2x+11 → corr -1
    ).toDF("g", "t", "x", "y")
    val w = WindowFeatures.orderedWindow(Seq("g"), Seq(col("t")))
    val out = WindowFeatures.rollingCorr(df, w, "x", "y", n = 3, "c")
      .filter($"t" === 3).select("g", "c").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("c"))).toMap
    assert(math.abs(out(1L).get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(out(2L).isEmpty)
    assert(math.abs(out(3L).get.asInstanceOf[Double] + 1.0) < 1e-12)
    // full-group frame vs an exact driver-side Pearson on real data (Spark's
    // own corr() window is unusable as a reference: ANSI divide-by-zero on
    // degenerate frames)
    val li = Tables.load(spark, dir, "lineitem").limit(500)
      .select(col("l_suppkey").cast("long").as("g"),
        col("l_orderkey").cast("long").as("t1"),
        col("l_linenumber").cast("long").as("t2"),
        col("l_quantity").cast("long").as("x"),
        (col("l_partkey") % 97).cast("long").as("y"))
    val full = WindowFeatures.rollingCorr(li,
        WindowFeatures.orderedWindow(Seq("g"),
          Seq(col("t1"), col("t2"), col("x"), col("y"))),
        "x", "y", n = 100000, "mine")
      .select("g", "t1", "t2", "x", "y", "mine").collect()
    assert(full.length == 500)
    full.groupBy(_.getLong(0)).foreach { case (g, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val xs = sorted.map(_.getLong(3)); val ys = sorted.map(_.getLong(4))
      val n = xs.length.toLong
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(v => v * v).sum; val syy = ys.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val den = math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble)
      val last = sorted.last.getAs[Any]("mine")
      if (den == 0) assert(last == null, s"group $g: expected NULL on degenerate frame")
      else assert(math.abs(last.asInstanceOf[Double] -
        (n * sxy - sx * sy).toDouble / den) < 1e-12, s"group $g corr mismatch")
    }
  }

  test("Resample.locf: carry-forward, leading gap NULL, boundary event included, seq breaks ties") {
    import spark.implicits._
    val obs = Seq(
      ("A", 5L, 1L, 1.0), ("A", 15L, 2L, 2.0),   // plain carry-forward
      ("B", 15L, 3L, 9.0),                        // nothing in bucket 0 → NULL
      ("C", 9L, 4L, 7.0),                         // exactly ON bucket 0's end
      ("D", 3L, 5L, 1.5), ("D", 3L, 6L, 2.5)      // same ts: higher seq wins
    ).toDF("k", "ts_us", "seq", "v")
    val out = Resample.locf(obs, "k", "ts_us", "v", "seq", bucketUs = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getAs[Any]("value_locf")))
      .toMap
    assert(out(("A", 0L)).contains(1.0) && out(("A", 1L)).contains(2.0))
    assert(out(("B", 0L)).isEmpty && out(("B", 1L)).contains(9.0))
    assert(out(("C", 0L)).contains(7.0))
    assert(out(("D", 0L)).contains(2.5) && out(("D", 1L)).contains(2.5))
    assert(out.size == 8) // 4 keys × 2 buckets — full grid for every key
  }

  test("paretoFrontier: dominance, ties, and frontier-only survival") {
    import spark.implicits._
    val pts = Seq(
      (10L, 1L),  // frontier (max x)
      (8L, 5L),   // frontier
      (8L, 3L),   // same x, lower y → dominated
      (6L, 5L),   // y ties frontier point with higher x → dominated
      (5L, 9L),   // frontier
      (4L, 9L),   // dominated by (5,9)
      (1L, 1L)    // dominated by everything
    ).toDF("x", "y")
    val out = Curation.paretoFrontier(pts, "x", "y").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 1L), (8L, 5L), (5L, 9L)))
    // no frontier point dominates another (sanity of the strict-dominance claim)
    for ((ax, ay) <- out; (bx, by) <- out if (ax, ay) != (bx, by))
      assert(!(ax >= bx && ay >= by), s"($ax,$ay) dominates ($bx,$by)")
  }

  test("partition aggregates: window formulation ≡ groupBy+join (W7-W9)") {
    val li = Tables.load(spark, dir, "lineitem")
    val w = Window.partitionBy("l_suppkey")
    val windowed = li.select(
      col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
      min("l_quantity").over(w).as("best_qty_supp"),
      size(collect_set(col("l_partkey")).over(w)).cast("long").as("n_parts_supp"))
    val joined = li
      .join(li.groupBy("l_suppkey").agg(
        min("l_quantity").as("best_qty_supp"),
        countDistinct("l_partkey").as("n_parts_supp")), "l_suppkey")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "best_qty_supp", "n_parts_supp")
    assertSameRows(windowed, joined)
  }

  test("as-of join: joinFormulation ≡ unionMergeFormulation on sf0.001 events") {
    val a = graft.SparkEntry.queries("q09_asof_join")(spark, dir)
    val b = graft.SparkEntry.queries("q10_asof_union_merge")(spark, dir)
    assertSameRows(a, b)
  }

  test("dedup is idempotent") {
    val ev = Tables.events(spark, dir)
    val once = Dedup.latestPerKey(ev, Seq("user_id", "event_type"),
      Seq(col("ts").desc_nulls_first, col("event_id").desc))
    val twice = Dedup.latestPerKey(once, Seq("user_id", "event_type"),
      Seq(col("ts").desc_nulls_first, col("event_id").desc))
    assertSameRows(once, twice)
  }

  test("union dedup: hist∪rt ≡ rt∪hist under last-write-wins (order-insensitive)") {
    val ev = Tables.events(spark, dir).limit(200)
    val hist = ev.withColumn("is_realtime", lit(false))
    val rt = ev.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") + 1.0).withColumn("is_realtime", lit(true))
    val ord = Seq(col("is_realtime").desc_nulls_first, col("ts").desc_nulls_first,
      col("event_id").desc)
    val ab = Dedup.latestPerKey(hist.unionByName(rt), Seq("event_id"), ord)
    val ba = Dedup.latestPerKey(rt.unionByName(hist), Seq("event_id"), ord)
    assertSameRows(ab, ba)
  }

  test("bloomAntiJoin ≡ plain left_anti (long and string keys, exact result)") {
    val orders = Tables.load(spark, dir, "orders")
    val corpus = orders.filter(col("o_orderkey") % 3 === 0)
    val batch = orders.select(col("o_orderkey"), col("o_totalprice"))
    val plain = batch.join(corpus.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    val bloomed = Dedup.bloomAntiJoin(batch, corpus, "o_orderkey",
      expectedItems = 10000)
    assertSameRows(plain, bloomed)
    // string keys route through the same xxhash64 probe
    val sCorpus = corpus.select(col("o_orderstatus").as("k")).distinct()
    val sBatch = orders.select(col("o_orderstatus").as("k"), col("o_orderkey"))
    val sPlain = sBatch.join(sCorpus, Seq("k"), "left_anti")
    val sBloomed = Dedup.bloomAntiJoin(sBatch, sCorpus, "k", expectedItems = 100)
    assertSameRows(sPlain, sBloomed)
  }

  test("bloomAntiJoin: a disjoint batch bypasses the join (near-zero candidates)") {
    import spark.implicits._
    val corpus = (0L until 2000L).toDF("k")
    val batch = (1000000L until 1002000L).toDF("k")
    // no false negatives: every row of the disjoint batch must survive
    assert(Dedup.bloomAntiJoin(batch, corpus, "k", expectedItems = 2000)
      .count() == 2000)
    // overlap case: only the true dups are removed
    val mixed = ((0L until 100L) ++ (1000000L until 1000100L)).toDF("k")
    assert(Dedup.bloomAntiJoin(mixed, corpus, "k", expectedItems = 2000)
      .collect().map(_.getLong(0)).toSet == (1000000L until 1000100L).toSet)
  }

  test("binnedRangeJoin ≡ naive BETWEEN join (multi-bin spans, bounds, negatives)") {
    import spark.implicits._
    val points = Seq(-300L, -256L, -1L, 0L, 99L, 100L, 101L, 255L, 256L, 1000L, 5000L)
      .toDF("pt")
    val intervals = Seq(
      (1L, -300L, -200L),  // negative domain
      (2L, -10L, 10L),     // straddles zero
      (3L, 100L, 100L),    // degenerate single point
      (4L, 0L, 1200L),     // spans many bins
      (5L, 4000L, 4500L)   // matches nothing
    ).toDF("iv_id", "lo", "hi")
    val naive = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    for (w <- Seq(1L, 7L, 256L, 10000L)) {
      val binned = RangeJoin.binnedRangeJoin(points, intervals, "pt", "lo", "hi", w)
      assertSameRows(naive, binned.select(naive.columns.map(col).toIndexedSeq: _*))
    }
  }
}
