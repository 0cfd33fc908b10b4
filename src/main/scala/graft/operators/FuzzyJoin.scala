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
  def fellegiSunter(pairs: DataFrame, fieldCols: Seq[String],
                    labelCol: String, upper: Double,
                    lower: Double): DataFrame = {
    require(fieldCols.nonEmpty, "fellegiSunter needs at least one field")
    require(lower <= upper, s"lower $lower must be <= upper $upper")
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
}
