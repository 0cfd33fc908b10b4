package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) fuzzy join without the nested loop — the
  * entity-resolution primitive (matching names/titles/URLs across noisy
  * sources) that naive formulations plan as a cartesian product with a
  * levenshtein filter: O(n·m) distance computations, each O(len²).
  *
  * Blocking is the PassJoin segment scheme (Li, Deng, Wang, Feng 2011,
  * "PASS-JOIN: A Partition-based Method for Similarity Joins"): partition
  * every LEFT string into `maxDist + 1` contiguous segments — by pigeonhole,
  * any RIGHT string within edit distance `maxDist` leaves at least one
  * segment untouched by every edit, so that segment appears VERBATIM in the
  * right string, its start position shifted by at most the net
  * insertions/deletions before it (≤ maxDist). Candidates are therefore an
  * EQUI-join on (left-length, segment-index, segment-text) against the right
  * side's bounded substring enumeration, and a final exact
  * `levenshtein() ≤ maxDist` verify makes precision 1 — the candidate set
  * provably contains every true pair (recall 1: the windows here are the
  * generous ±maxDist form of the paper's tighter multi-match bounds), so the
  * join is EXACT while the work is Σ_block |block|² instead of n·m.
  *
  * Scale shape: both sides are narrow explodes — (maxDist+1) segment rows
  * per left string, (maxDist+1)·(2·maxDist+1)² candidate substrings per
  * right string (18 at d=1) — feeding one shuffle on the segment key; no
  * driver state, no length-pair loop, skew handled as any hot equi-key
  * (common segments = common name fragments → AQE/salting). At 100 TB the
  * left segments are the thing to materialize, partitioned by the join key,
  * exactly like the LSH band tables.
  */
object FuzzyJoin {

  /** Pairs (idL, idR, dist) with `levenshtein(strL, strR) ≤ maxDist`.
    * Column names in the output: `<idColL> AS l_id`, `<idColR> AS r_id`,
    * `dist`. Exact — blocking only prunes provably-far pairs.
    */
  def editDistanceJoin(left: DataFrame, idColL: String, strColL: String,
                       right: DataFrame, idColR: String, strColR: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be ≥ 1 (use an equi-join for 0)")
    val d = maxDist
    val nSeg = d + 1

    // left: one row per (string, segment) — segment i of a length-ls string
    // spans [⌊ls·i/nSeg⌋, ⌊ls·(i+1)/nSeg⌋) (the canonical even partition)
    val lSeg = left
      .select(col(idColL).as("l_id"), col(strColL).as("__ls_str"))
      .withColumn("__ll", length(col("__ls_str")))
      .filter(col("__ll") >= nSeg) // shorter strings can't host nSeg segments
      .withColumn("__i", explode(sequence(lit(0), lit(d))))
      .withColumn("__st", floor(col("__ll") * col("__i") / nSeg).cast("int"))
      .withColumn("__en", floor(col("__ll") * (col("__i") + 1) / nSeg).cast("int"))
      .select(col("l_id"), col("__ls_str"), col("__ll"), col("__i"),
        col("__ls_str").substr(col("__st") + 1, col("__en") - col("__st"))
          .as("__seg"))

    // right: candidate substrings — for each plausible left length ls within
    // ±d and each segment index, the substring at the segment's start ±d
    val rCand = right
      .select(col(idColR).as("r_id"), col(strColR).as("__rs_str"))
      .withColumn("__lr", length(col("__rs_str")))
      .withColumn("__ll", explode(sequence(
        greatest(col("__lr") - d, lit(nSeg)), col("__lr") + d)))
      .withColumn("__i", explode(sequence(lit(0), lit(d))))
      .withColumn("__w", explode(sequence(lit(-d), lit(d))))
      .withColumn("__st",
        (floor(col("__ll") * col("__i") / nSeg) + col("__w")).cast("int"))
      .withColumn("__len",
        (floor(col("__ll") * (col("__i") + 1) / nSeg)
          - floor(col("__ll") * col("__i") / nSeg)).cast("int"))
      .filter(col("__st") >= 0 && col("__st") + col("__len") <= col("__lr"))
      .select(col("r_id"), col("__rs_str"), col("__ll"), col("__i"),
        col("__rs_str").substr(col("__st") + 1, col("__len")).as("__seg"))

    val segPairs = lSeg.join(rCand, Seq("__ll", "__i", "__seg"))
      .select(col("l_id"), col("r_id"), col("__ls_str"), col("__rs_str"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("__ls_str"), col("__rs_str")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("l_id"), col("r_id"), col("dist"))

    // left strings shorter than nSeg can't host nSeg non-empty segments
    // (an empty segment would match everywhere and break the blocking), so
    // they pair off directly against the only rights they could match
    // (length ≤ len + d ≤ 2d) — a join over the ≤2d-char subpopulation of
    // both sides, bounded and usually empty; exactness costs no asymptotics
    val shortPairs = left
      .select(col(idColL).as("l_id"), col(strColL).as("__ls_str"))
      .filter(length(col("__ls_str")) < nSeg)
      .join(right.select(col(idColR).as("r_id"), col(strColR).as("__rs_str"))
        .filter(length(col("__rs_str")) <= 2 * d),
        abs(length(col("__ls_str")) - length(col("__rs_str"))) <= d)
      .withColumn("dist",
        levenshtein(col("__ls_str"), col("__rs_str")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("l_id"), col("r_id"), col("dist"))

    segPairs.unionByName(shortPairs)
  }

  /** Blocked sorted-neighborhood matching (Hernández & Stolfo 1995, the
    * merge/purge method) — the OTHER classic entity-resolution blocker,
    * complementing [[editDistanceJoin]]'s PassJoin: sort each block by the
    * match key, slide a fixed window of `windowSize` successors over the
    * order, and exact-verify only those neighbor pairs with
    * `levenshtein ≤ maxDist`. Finds what prefix-stable keys put close
    * together in O(n·w) comparisons; by construction it MISSES pairs whose
    * corruption moves the sort key (use PassJoin when recall must be 1 —
    * the trade the record-linkage literature names explicitly).
    *
    * Spark shape: ONE window pass over the block partitioning — each record
    * joins its `windowSize` successors via exploded `lead`s, so there is no
    * self-join and no second shuffle; output pairs are `(l_id, r_id, dist)`
    * with the window's order making each unordered pair appear once.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
                         blockLen: Int, windowSize: Int, maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("l_id"), col(keyCol).as("__key"))
      .withColumn("__blk", substring(col("__key"), 1, blockLen))
    val w = Window.partitionBy(col("__blk")).orderBy(col("__key"), col("l_id"))
    // window expressions must land in a Project before the generator can
    // explode them — materialize each lead as a column, then explode
    val withLeads = base.select(col("l_id") +: col("__key") +:
      (1 to windowSize).map { i =>
        struct(lead(col("l_id"), i).over(w).as("r_id"),
          lead(col("__key"), i).over(w).as("r_key")).as(s"__r$i")
      }: _*)
    withLeads
      .withColumn("__s",
        explode(array((1 to windowSize).map(i => col(s"__r$i")): _*)))
      .filter(col("__s.r_id").isNotNull)
      .select(col("l_id"), col("__s.r_id").as("r_id"),
        levenshtein(col("__key"), col("__s.r_key")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Fellegi–Sunter probabilistic record-linkage scoring (Fellegi & Sunter
    * 1969, JASA — the decision theory every production linker implements):
    * given candidate pairs with per-field agreement BOOLEANS and a labeled
    * subset (`labelCol` true = known match, false = known non-match, NULL
    * = unlabeled), estimate per field j the conditional agreement rates
    * m_j = P(agree_j | match) and u_j = P(agree_j | non-match) with
    * add-one smoothing (never a log of 0), then score EVERY pair with the
    * composite log₂-likelihood-ratio weight
    *
    *   W = Σ_j  agree_j ? log₂(m_j/u_j) : log₂((1−m_j)/(1−u_j))
    *
    * and classify by the caller's thresholds: W ≥ upper → `match`,
    * W ≤ lower → `nonmatch`, else `review` (the clerical band). Thresholds
    * compare against the 6-decimal-ROUNDED weight so the decision is
    * engine-stable. Returns the input columns + (weight, decision).
    *
    * Scale shape: the m/u estimate is ONE map-side-combined aggregate over
    * the labeled pairs folding to a single row (2K+2 numbers, K = field
    * count) that cross-joins back broadcast; scoring is a fixed-order
    * K-term expression per pair — linear in CANDIDATE pairs, which the
    * blocking stage ([[editDistanceJoin]], [[sortedNeighborhood]],
    * MinHash bands) is responsible for keeping sub-quadratic. Nothing is
    * collected on the driver and the plan stays fully lazy.
    */
  def fellegiSunter(pairs0: DataFrame, fieldCols: Seq[String],
                    labelCol: String, upper: Double,
                    lower: Double): DataFrame = {
    require(fieldCols.nonEmpty, "fellegiSunter needs at least one field")
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    // the candidate frame is consumed TWICE — once by the m/u estimate's
    // broadcast subtree, once by the scoring scan — and the blocking stage
    // that produces it is the expensive part of the whole query. Persist it
    // so the blocking join runs once per execution, not once per consumer
    // (still lazy: the broadcast build materializes the cache, the scoring
    // scan reads it). Cleanup: session owner drops persisted blocks between
    // queries (the bench does; library callers own unpersist).
    val pairs = pairs0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lab = col(labelCol)
    val aggs =
      sum(when(lab, 1L).otherwise(0L)).as("__nm") +:
      sum(when(!lab, 1L).otherwise(0L)).as("__nu") +:
      fieldCols.zipWithIndex.flatMap { case (f, i) => Seq(
        sum(when(lab && col(f), 1L).otherwise(0L)).as(s"__am$i"),
        sum(when(!lab && col(f), 1L).otherwise(0L)).as(s"__au$i")) }
    val est = pairs.filter(lab.isNotNull).agg(aggs.head, aggs.tail: _*)
    val scored = pairs.crossJoin(broadcast(est))
    // add-one smoothed rates; weights in a FIXED field order so the
    // double sum folds identically on every engine
    val weight = fieldCols.zipWithIndex.map { case (f, i) =>
      val m = (col(s"__am$i") + lit(1L)).cast("double") /
        (col("__nm") + lit(2L)).cast("double")
      val u = (col(s"__au$i") + lit(1L)).cast("double") /
        (col("__nu") + lit(2L)).cast("double")
      when(col(f), log(2.0, m / u))
        .otherwise(log(2.0, (lit(1.0) - m) / (lit(1.0) - u)))
    }.reduce(_ + _)
    scored
      .withColumn("weight", round(weight, 6))
      .withColumn("decision",
        when(col("weight") >= upper, lit("match"))
          .when(col("weight") <= lower, lit("nonmatch"))
          .otherwise(lit("review")))
      .drop(est.columns.toSeq: _*)
  }

  /** UNSUPERVISED Fellegi–Sunter via EM (Winkler 1988, "Using the EM
    * algorithm for weight computation in the Fellegi–Sunter model of
    * record linkage") — the classic deployment has NO labeled pairs:
    * m_j, u_j and the match proportion p are estimated by
    * expectation-maximization under the conditional-independence model,
    * then every pair is scored with the same composite log₂ weight as
    * [[fellegiSunter]].
    *
    * Determinism contract (the whole point of the formulation): EM runs a
    * FIXED `iters` iterations from the fixed start (p=0.1, m_j=0.9,
    * u_j=0.1 — Winkler's canonical init) over the pattern-count sufficient
    * statistic, with the E-step posterior QUANTIZED to integer
    * millionths — `g = ⌊P(match|γ)·10⁶ + ½⌋` — so every M-step sum is
    * EXACT BIGINT arithmetic (order-independent on any engine) and every
    * parameter is one IEEE division of two exact integers:
    *
    *   E:  pm = p·Π_j (γ_j ? m_j : 1−m_j)   (fixed field order)
    *       pu = (1−p)·Π_j (γ_j ? u_j : 1−u_j)
    *       g  = ⌊pm/(pm+pu)·10⁶ + ½⌋
    *   M:  p   = (Σ n·g + 10⁶) / (N·10⁶ + 2·10⁶)
    *       m_j = (Σ_{γ_j} n·g + 10⁶) / (Σ n·g + 2·10⁶)
    *       u_j = (Σ_{γ_j} n·(10⁶−g) + 10⁶) / (Σ n·(10⁶−g) + 2·10⁶)
    *
    * (the +10⁶/+2·10⁶ terms are the labeled form's add-one smoothing in
    * millionth units — no log of 0, no stuck-at-zero corner). A DuckDB
    * replay of the same unrolled arithmetic reproduces the weights
    * bit-comparably (q265).
    *
    * Agreement patterns over K boolean fields collapse to ≤ 2^K distinct
    * rows — the EM's entire input. That pattern-count table is computed by
    * ONE map-side-combined aggregate over the candidate pairs and
    * collected (bounded by 2^K ≤ 1024 BY CONSTRUCTION, never by data —
    * the centroid-seed rule); the iterations are driver-side arithmetic on
    * those few integers, and the final m/u fold into the scoring
    * expression as literals — pairs are scanned exactly twice (pattern
    * census + scoring), nothing corpus-sized ever reaches the driver.
    * Fields must be non-null (blocking emits definite agreement booleans);
    * total pairs must stay below 2^43 so the micro-unit sums stay exactly
    * representable.
    *
    * Returns the input columns + (match_prob [posterior under the final
    * parameters, 6-dec], weight, decision) — [[fellegiSunter]]'s surface
    * plus the posterior EM adds.
    */
  def fellegiSunterEm(pairs0: DataFrame, fieldCols: Seq[String], iters: Int,
                      upper: Double, lower: Double): DataFrame = {
    require(fieldCols.nonEmpty && fieldCols.size <= 10,
      s"fellegiSunterEm needs 1..10 fields, got ${fieldCols.size}")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    // consumed twice (eager pattern census + lazy scoring scan) and the
    // blocking stage behind it is the expensive part — persist so candidate
    // generation runs once, not once per consumer. The census collect below
    // materializes the cache; the returned scoring frame reads it. Cleanup:
    // session owner drops persisted blocks between queries.
    val pairs = pairs0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the "census <= 2^K by construction" bound that makes the collect
    // safe holds only for BOOLEAN agreement fields — an id-like or string
    // column must die here, not as a driver OOM (the chiSquare/maxItems
    // guard discipline)
    fieldCols.foreach { f =>
      val dt = pairs.schema(f).dataType
      require(dt == org.apache.spark.sql.types.BooleanType,
        s"fellegiSunterEm: agreement field '$f' is $dt, not BOOLEAN — " +
          "the pattern census is only bounded for boolean fields")
    }
    val K = fieldCols.size
    val M = 1000000L
    val pat = pairs.groupBy(fieldCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (Array.tabulate(K)(r.getBoolean), r.getLong(K)))
    val total = pat.map(_._2).sum
    var p = 0.1
    val m = Array.fill(K)(0.9)
    val u = Array.fill(K)(0.1)
    for (_ <- 0 until iters) {
      var sg = 0L
      val sgj = Array.fill(K)(0L)
      val snj = Array.fill(K)(0L)
      pat.foreach { case (f, n) =>
        var pm = p
        var pu = 1.0 - p
        var j = 0
        while (j < K) {
          pm *= (if (f(j)) m(j) else 1.0 - m(j))
          pu *= (if (f(j)) u(j) else 1.0 - u(j))
          j += 1
        }
        val g = math.floor(pm / (pm + pu) * 1e6 + 0.5).toLong
        sg += n * g
        j = 0
        while (j < K) {
          if (f(j)) { sgj(j) += n * g; snj(j) += n * (M - g) }
          j += 1
        }
      }
      val sn = total * M - sg
      p = (sg + M).toDouble / (total * M + 2 * M).toDouble
      var j = 0
      while (j < K) {
        m(j) = (sgj(j) + M).toDouble / (sg + 2 * M).toDouble
        u(j) = (snj(j) + M).toDouble / (sn + 2 * M).toDouble
        j += 1
      }
    }
    // scoring with the converged parameters as literals — same fixed field
    // order and log₂ form as the labeled estimator
    val weight = fieldCols.zipWithIndex.map { case (f, j) =>
      when(col(f), log(2.0, lit(m(j)) / lit(u(j))))
        .otherwise(log(2.0, lit(1.0 - m(j)) / lit(1.0 - u(j))))
    }.reduce(_ + _)
    val pm = fieldCols.zipWithIndex.foldLeft(lit(p)) { case (acc, (f, j)) =>
      acc * when(col(f), lit(m(j))).otherwise(lit(1.0 - m(j)))
    }
    val pu = fieldCols.zipWithIndex.foldLeft(lit(1.0 - p)) { case (acc, (f, j)) =>
      acc * when(col(f), lit(u(j))).otherwise(lit(1.0 - u(j)))
    }
    pairs
      .withColumn("match_prob", round(pm / (pm + pu), 6))
      .withColumn("weight", round(weight, 6))
      .withColumn("decision",
        when(col("weight") >= upper, lit("match"))
          .when(col("weight") <= lower, lit("nonmatch"))
          .otherwise(lit("review")))
  }
}
