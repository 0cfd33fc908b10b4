package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches for corpus-scale profiling (extension
  * scope). A 100 TB engine needs approximate distinct counts (exact
  * count-distinct shuffles every value); Spark's `approx_count_distinct`
  * (HLL++) works but its estimate is engine-private — it cannot be replayed
  * by an independent oracle. KMV (k-minimum-values, Bar-Yossef et al. 2002 /
  * Beyer et al. 2007) over the md5-derived 28-bit hash IS replayable: the
  * sketch is "the k smallest distinct hash values", pure relational algebra,
  * so DuckDB reproduces the estimate bit-for-bit.
  */
object Sketches {

  /** Per-group distinct-count estimate from the k smallest distinct hashes:
    * `(k-1) · H / h_(k)` (the unbiased KMV estimator), exact when a group has
    * fewer than k distinct values. Standard error ≈ 1/√(k−2).
    *
    * Plan shape at scale: the hash-distinct is a partial+final hash aggregate
    * (map-side combine — duplicate values collapse before the shuffle); the
    * rank-≤-k filter compiles to WindowGroupLimit, so each map task forwards
    * at most k rows per group into the final per-group sort. Nothing
    * proportional to group cardinality ever reaches one node.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df
      .select(groupCols.map(col) :+ Curation.hash28(col(valueCol)).as("__h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__m"), max(col("__h")).as("__hk"))
      .select(groupCols.map(col) :+
        when(col("__m") < k, col("__m").cast("double"))
          .otherwise(lit((k - 1).toDouble * Curation.HashSpace.toDouble)
            / col("__hk").cast("double"))
          .as("distinct_est"): _*)
  }

  /** Exact nearest-rank percentiles per group, float-free: percentile p=num/den
    * is the value at 1-based rank ceil(p·n) — all-integer arithmetic
    * (`ceil(a/b) = (a + b - 1) div b`), so the result is an ELEMENT of the
    * data, never an interpolation. Interpolating percentiles (Spark
    * `percentile`, DuckDB `quantile_cont`) differ in last-ulp float ordering
    * between engines; nearest-rank is bit-replayable by any ANSI oracle.
    *
    * Plan: one sort per group (rank window) + partial-combined conditional
    * max. At 100 TB swap in `approx_percentile` (KLL-style mergeable sketch,
    * no per-group sort) — [[approxPercentilesByGroup]] is that twin, its
    * agreement with this exact form is spec-checked at test scale.
    */
  def percentilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         tieCol: String, ps: Seq[(String, Int, Int)]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    ranked.groupBy(groupCol).agg(
      max(col("__n")).as("n_rows"),
      ps.map { case (name, num, den) =>
        // integer ceil(num·n/den); SQL `div` keeps it exact int64 (Column `/`
        // on longs is fractional double division)
        val rank = expr(s"(__n * $num + ${den - 1}) div $den")
        max(when(col("__rn") <= rank, col(valueCol))).as(name)
      }: _*)
  }

  /** Count-min sketch cell table (Cormode & Muthukrishnan 2005): `depth`
    * independent hash rows of `width` counters; every key occurrence
    * increments one cell per row. Built as ONE aggregation over a narrow
    * (depth×)-explode — partial counts combine map-side, and the sketch
    * itself is at most depth·width rows however large the keyed stream is:
    * the mergeable, fixed-size frequency summary (heavy hitters, frequency
    * floors) where an exact per-key count would shuffle the full key space.
    *
    * Hashes are the corpus-standard md5-derived 28-bit value pushed through
    * the [[TextDedup.hashParams]] universal family — deterministic and
    * replayable by an external SQL oracle, like every sketch here.
    */
  /** The (row, cell) increment pairs one key occurrence contributes — the
    * shared narrow explode under [[countMinCells]], [[countMinEstimates]],
    * and the incremental [[countMinRefresh]].
    */
  def countMinPairs(df: DataFrame, keyCol: Column,
                    depth: Int, width: Int): DataFrame = {
    val rows = (0 until depth).map { i =>
      val p = TextDedup.hashParams(depth)(i)
      struct(lit(i).as("row"),
        ((Curation.hash28(keyCol) * p.a + p.b) % TextDedup.MinhashP % width)
          .as("cell"))
    }
    df.select(explode(array(rows: _*)).as("__rc"))
      .select(col("__rc.row").as("row"), col("__rc.cell").as("cell"))
  }

  def countMinCells(df: DataFrame, keyCol: Column,
                    depth: Int, width: Int): DataFrame =
    countMinPairs(df, keyCol, depth, width)
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates from a [[countMinCells]] table: for each row
    * of `keys`, the MIN over the depth cells its key hashes into — ≥ the
    * true count always (every occurrence landed in all of them), ≤ true +
    * ε·N with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. The
    * sketch side is ≤ depth·width rows → broadcast; keys never shuffle.
    */
  def countMinEstimates(cells: DataFrame, keys: DataFrame, keyCol: String,
                        depth: Int, width: Int): DataFrame = {
    val rows = (0 until depth).map { i =>
      val p = TextDedup.hashParams(depth)(i)
      struct(lit(i).as("row"),
        ((Curation.hash28(col(keyCol)) * p.a + p.b) % TextDedup.MinhashP % width)
          .as("cell"))
    }
    val est = keys.select(col(keyCol), explode(array(rows: _*)).as("__rc"))
      .select(col(keyCol), col("__rc.row").as("row"), col("__rc.cell").as("cell"))
      .join(broadcast(cells), Seq("row", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    keys.join(est, keyCol)
  }

  /** Incrementally-maintained count-min sketch over a [[graft.sources.TxLog]]
    * table: the cell grid lives as a versioned materialization
    * ([[graft.sources.Materialize]]) and each refresh reads ONLY the files
    * the source log added since the last one — cells are pure counts, so the
    * delta grid merges additively (the mergeability the spec pins), and a
    * non-append-only change triggers the honest full rebuild. This is the
    * streaming-heavy-hitters shape: a continuously-ingested corpus keeps a
    * current frequency summary at O(new rows) per batch, never O(corpus),
    * with exactly-once semantics inherited from the materialization commit.
    *
    * `keys` maps a source row frame to the keyed occurrences to sketch
    * (e.g. `df.select(explode(split(col("text"), " ")).as("term"))`), and
    * `keyCol` names the key column it produced. It must be a per-row
    * expansion — each source row's occurrences independent of the rest, the
    * self-maintainability condition.
    */
  def countMinRefresh(spark: org.apache.spark.sql.SparkSession,
                      sourcePath: String, matPath: String,
                      keys: DataFrame => DataFrame, keyCol: String, depth: Int,
                      width: Int): graft.sources.Materialize.Refresh =
    graft.sources.Materialize.refresh(spark, sourcePath, matPath,
      keyCols = Seq("row", "cell"), sumCols = Nil,
      prep = df => countMinPairs(keys(df), col(keyCol), depth, width))

  /** The maintained grid in [[countMinCells]]' (row, cell, cnt) shape, ready
    * for [[countMinEstimates]].
    */
  def countMinRead(spark: org.apache.spark.sql.SparkSession,
                   matPath: String): DataFrame =
    graft.sources.Materialize.read(spark, matPath)
      .select(col("row"), col("cell"), col("__cnt").as("cnt"))

  // ------------------------------------------------------------------ HLL
  //
  // HyperLogLog-style distinct sketch (Flajolet et al. 2007) over the repo's
  // oracle-replayable hash family: 64 registers, register = low 6 hash bits,
  // rank = position of the lowest set bit of the remaining 25 — every step
  // integer arithmetic an ANSI engine reproduces bit-for-bit. Registers are
  // MONOTONE (merge = max), which buys three things: the sketch state is
  // mergeable across partitions/corpora like any HLL, the estimate sum is
  // EXACT double arithmetic (≤64 dyadic terms 2^-rho, rho ≤ 26 — every
  // partial sum representable, so summation order cannot matter), and
  // incremental maintenance is just Materialize's max-merge
  // ([[hllRefresh]]): O(new rows) per refresh, full rebuild only when the
  // source shrank. The complement to [[kmvDistinct]] (KMV keeps k hashes
  // per group — better for small groups; HLL is fixed 64 registers whatever
  // the cardinality) and to count-min (frequencies, not cardinalities).

  val HllM = 64
  /** The post-register hash carries ≤ 25 bits; an all-zero remainder caps
    * the rank one above the highest observable position.
    */
  val HllMaxRho = 26

  /** Per-occurrence (groupCols..., reg, rho) — the narrow map under both the
    * one-shot registers and the incremental refresh.
    */
  def hllProject(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val p = TextDedup.hashParams(1).head
    val h = (Curation.hash28(col(valueCol)) * p.a + p.b) % TextDedup.MinhashP
    val rest = shiftright(h, 6)
    val rho = when(rest === 0, lit(HllMaxRho))
      .otherwise((round(log2(rest.bitwiseAND(-rest))) + 1).cast("int"))
    df.select(groupCols.map(col) ++ Seq(
      h.bitwiseAND(lit(63L)).cast("int").as("reg"), rho.as("rho")): _*)
  }

  /** The sketch state: one row per (group, occupied register) with the max
    * rank — ≤ [[HllM]] rows per group whatever the cardinality; the census
    * combines map-side.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllProject(df, groupCols, valueCol)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max("rho").as("max_rho"))

  /** Raw HLL estimate per group from a registers frame:
    * `α·m² / (Σ_occupied 2^-M_j + (m − occupied))` — unoccupied registers
    * contribute 2⁰ each. Exact-dyadic double sum (see object notes), one
    * division at the end.
    */
  def hllEstimates(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_regs"),
        // 1 / 2^rho via an integer shift then an exact dyadic division —
        // never pow(), whose correct rounding on powers of two is
        // implementation-dependent (the Scala `shiftleft` helper pins the
        // shift to Int, so this one goes through the SQL form)
        sum(lit(1.0) / expr("shiftleft(cast(1 as bigint), max_rho)").cast("double"))
          .as("__pinv"))
      .withColumn("hll_est",
        lit(0.709) * lit((HllM * HllM).toDouble) /
          (col("__pinv") + (lit(HllM) - col("n_regs")).cast("double")))
      .drop("__pinv")

  /** Incrementally-maintained HLL registers over a [[graft.sources.TxLog]]
    * table (the q95 shape for CARDINALITIES): each refresh max-merges only
    * the added files' registers — O(batch), never O(corpus); a
    * non-append-only source change triggers the honest full rebuild.
    * `keys` maps source rows to (groupCols..., valueCol) rows (per-row
    * expansion — the self-maintainability condition).
    */
  def hllRefresh(spark: org.apache.spark.sql.SparkSession,
                 sourcePath: String, matPath: String,
                 keys: DataFrame => DataFrame,
                 groupCols: Seq[String], valueCol: String): graft.sources.Materialize.Refresh =
    graft.sources.Materialize.refresh(spark, sourcePath, matPath,
      keyCols = groupCols :+ "reg", sumCols = Nil,
      prep = df => hllProject(keys(df), groupCols, valueCol),
      maxCols = Seq("rho"))

  /** The maintained registers in [[hllRegisters]]' shape, ready for
    * [[hllEstimates]].
    */
  def hllRead(spark: org.apache.spark.sql.SparkSession, matPath: String,
              groupCols: Seq[String]): DataFrame =
    graft.sources.Materialize.read(spark, matPath)
      .select((groupCols :+ "reg").map(col) :+ col("max_rho"): _*)

  /** Pairwise set algebra over per-group HLL sketches — the estimates a
    * catalog answers WITHOUT touching the raw data: for every group pair
    * `g1 < g2`, `est_union` from the max-merged registers (union is native
    * to HLL) and `est_inter` by inclusion–exclusion
    * `|A| + |B| − |A∪B|` (the standard HLL intersection; can go ≤ 0 for
    * near-disjoint sets — emitted raw, not clamped, so the caller sees the
    * sketch's actual answer). All arithmetic is the exact-dyadic register
    * sum plus IEEE operations both engines reproduce bit-for-bit.
    *
    * Scale shape: inputs are SKETCHES (≤ [[HllM]] rows per group), so every
    * join here is over group-count-sized frames — the corpus is never
    * touched; the `g1 < g2` pair enumeration is quadratic only in the
    * number of GROUPS (categories, not rows).
    */
  def hllOverlap(registers: DataFrame, groupCol: String): DataFrame = {
    val gs = registers.select(col(groupCol).as("g")).distinct()
    val pairs = gs.select(col("g").as("g1"))
      .join(gs.select(col("g").as("g2")), col("g1") < col("g2"))
    val side = (keyCol: String) => pairs
      .join(registers.withColumnRenamed(groupCol, "__g"), col("__g") === col(keyCol))
      .select(col("g1"), col("g2"), col("reg"), col("max_rho"))
    val uregs = side("g1").unionByName(side("g2"))
      .groupBy("g1", "g2", "reg").agg(max("max_rho").as("max_rho"))
    val ue = hllEstimates(uregs, Seq("g1", "g2"))
      .select(col("g1"), col("g2"), col("hll_est").as("est_union"))
    val e = hllEstimates(registers, Seq(groupCol))
    ue.join(e.select(col(groupCol).as("g1"), col("hll_est").as("est_g1")), "g1")
      .join(e.select(col(groupCol).as("g2"), col("hll_est").as("est_g2")), "g2")
      .select(col("g1"), col("g2"), col("est_g1"), col("est_g2"),
        col("est_union"),
        (col("est_g1") + col("est_g2") - col("est_union")).as("est_inter"))
  }

  /** Winsorized mean per group (robust aggregation: clip to the exact
    * nearest-rank [pNum/pDen, 1−pNum/pDen] percentiles, then average —
    * the outlier-tamed mean feature pipelines prefer over raw averages).
    * Ranks are integer (`⌈p·n⌉ = (pNum·n + pDen−1) div pDen`), the clip
    * bounds are SELECTED values (rank picks are tie-independent: the value
    * at rank r of a sorted multiset doesn't depend on tie order), and with
    * an integer `valueCol` the clipped sum is exact — the only double is
    * the final division, deterministic in any engine.
    *
    * One window pass ranks, a group-sized frame carries the two bounds
    * back (broadcast join), one aggregate finishes: two shuffles on the
    * group key, no sort beyond the window's.
    *
    * Returns (groupCol, n, lo, hi, winsorized_mean).
    */
  def winsorizedMeans(df: DataFrame, groupCol: String, valueCol: String,
                      pNum: Int, pDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val ranked = df.select(col(groupCol).as("g"), v.as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("rlo", expr(s"($pNum * n + ${pDen - 1}) div $pDen"))
      .withColumn("rhi", expr(s"((${pDen - pNum}) * n + ${pDen - 1}) div $pDen"))
    val bounds = ranked
      .filter(col("rn") === col("rlo") || col("rn") === col("rhi"))
      .groupBy("g").agg(
        min(when(col("rn") === col("rlo"), col("v"))).as("lo"),
        min(when(col("rn") === col("rhi"), col("v"))).as("hi"))
    ranked.join(broadcast(bounds), Seq("g"))
      .withColumn("clipped", greatest(col("lo"), least(col("hi"), col("v"))))
      .groupBy("g").agg(
        count(lit(1)).as("n"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        (sum(col("clipped")).cast("double") / count(lit(1)).cast("double"))
          .as("winsorized_mean"))
      .select(col("g").as(groupCol), col("n"), col("lo"), col("hi"),
        col("winsorized_mean"))
  }

  /** Equi-join cardinality estimate from two count-min grids (the
    * AMS/CM-sketch inner-product estimator, Cormode & Muthukrishnan 2005
    * §4.2): |A ⋈ₖ B| = Σₖ c_A(k)·c_B(k), estimated per depth row as the
    * dot product of the two rows' cells, taking the MIN over rows — an
    * upper bound on the true size (collisions only add), within ε·N_A·N_B
    * with the usual CM guarantees. This is the planner's question — "how
    * big would this join be?" — answered from two ≤ depth×width summaries
    * WITHOUT running the join: the grids join on (row, cell) (≤ depth·width
    * rows a side), never the tables. Rows with no overlapping cells
    * contribute a zero dot product, so a disjoint key space estimates 0.
    */
  def countMinJoinSize(spark: org.apache.spark.sql.SparkSession,
                       cellsA: DataFrame, cellsB: DataFrame,
                       depth: Int): DataFrame = {
    val dots = cellsA.as("a")
      .join(cellsB.withColumnRenamed("cnt", "cntB").as("b"), Seq("row", "cell"))
      .groupBy(col("row"))
      .agg(sum(col("cnt") * col("cntB")).as("dot"))
    spark.range(depth).select(col("id").cast("int").as("row"))
      .join(dots, Seq("row"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("cms_join_size"))
  }

  /** Sketch-based twin of [[percentilesByGroup]]: `approx_percentile` is a
    * mergeable quantile sketch — map-side partial sketches merge in one
    * exchange, no per-group sort, memory O(1/accuracy) per group. The scale
    * path for quantiles over groups too large to sort.
    */
  def approxPercentilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                               ps: Seq[(String, Double)],
                               accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol).agg(
      count(lit(1)).as("n_rows"),
      ps.map { case (name, p) =>
        percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(name)
      }: _*)
}
