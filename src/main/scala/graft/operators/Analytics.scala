package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral / statistical analytics over event streams and fact tables —
  * the warehouse-mart shapes (cohort retention, per-group regression,
  * exponential smoothing) a pipeline like the reference's marts layer
  * (`dbt/models/marts/`) would grow next, built on the same exact-integer
  * discipline as the rest of the engine.
  *
  * Scale notes per operator are on each method; the common posture: every
  * aggregate is map-side combinable, every join is either key-partitioned
  * (user-sized) or broadcast (group-count-sized), and no driver state ever
  * holds more than a constant number of rows.
  */
object Analytics {

  /** Cohort retention matrix: users bucketed by the week (`bucketDays`-day
    * bucket) of their FIRST event; for each (cohort, weeks-since-first)
    * cell, how many of the cohort's users were active — the
    * signup-retention triangle every growth mart materializes.
    *
    * Shape: (user, day) distinct → per-user min (both map-side combined,
    * partitioned on user) → one user-keyed join back → (cohort, period)
    * distinct + count. Cohort sizes are a group-count-sized frame joined
    * broadcast. Days are exact epoch-µs integer division — no calendar
    * functions, so Spark and any replaying engine agree bit-for-bit.
    *
    * Returns (cohort_week, period_week, n_active, n_cohort, retention);
    * `period_week` 0 is the signup week itself (retention 1 by definition
    * only when every cohort user's first-week activity lands in bucket 0,
    * which holds by construction since day 0 is the first event's day).
    */
  def retentionMatrix(events: DataFrame, userCol: String, tsCol: String,
                      bucketDays: Int = 7): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ud = events
      .select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div ${dayUs}L").as("d"))
      .distinct()
    val first = ud.groupBy("u").agg(min(col("d")).as("d0"))
    val act = ud.join(first, Seq("u"))
      .select(expr(s"d0 div $bucketDays").as("cohort_week"),
        expr(s"(d - d0) div $bucketDays").as("period_week"), col("u"))
      .distinct()
    val sizes = first
      .groupBy(expr(s"d0 div $bucketDays").as("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    act.groupBy(col("cohort_week"), col("period_week"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("period_week"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
  }

  /** Per-group simple linear regression (OLS) from EXACT integer sums:
    * slope/intercept/r² of `yCol` on `xCol` per `groupCol`, where both
    * inputs are integer-scaled longs (cents, basis points — the caller
    * scales). One aggregate computes the five running sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) exactly in BIGINT — order-independent, map-side
    * combined, one shuffle on the group key — then a single double
    * expression per GROUP (not per row) evaluates the closed form. The
    * long→double conversions and the arithmetic after them are identical
    * IEEE operations in any engine, so results replay bit-for-bit.
    *
    * Exactness bound: Σy² fits BIGINT up to ~10⁹ rows/group at 10⁷-scaled
    * values; beyond that the sums belong in DECIMAL(38,0) (same shape,
    * wider accumulator).
    *
    * Degenerate groups (zero x-variance or zero y-variance) return NULL
    * slope/intercept/r² rather than ±Inf.
    */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val g = df
      .select(col(groupCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxy, sxx, syy) =
      (col("sxy").cast("double"), col("sxx").cast("double"),
        col("syy").cast("double"))
    val covN = sxy * n - sx * sy // n²·cov — exact-sum products, double math
    val varXN = sxx * n - sx * sx
    val varYN = syy * n - sy * sy
    val slope = when(varXN =!= 0.0, covN / varXN)
    g.select(col(groupCol), col("n"), slope.as("slope"),
      when(varXN =!= 0.0, (sy - (covN / varXN) * sx) / n).as("intercept"),
      when(varXN =!= 0.0 && varYN =!= 0.0,
        (covN * covN) / (varXN * varYN)).as("r2"))
  }

  /** Per-key exponential moving average (final smoothed state): the ordered
    * fold `acc ← acc + α·(x − acc)` over each key's series — the smoothing
    * primitive behind metric dashboards and drift detectors.
    *
    * EWMA is inherently sequential per key (each state depends on the
    * previous), so the scalable formulation is: ONE groupBy shuffle
    * collects each key's (order, value) pairs, `sort_array` pins the fold
    * order, and a codegen'd higher-order `aggregate` runs the recurrence —
    * per-key cost O(series), per-key memory O(series), no window sort, no
    * driver loop, no UDF. For series too long to hold per row, the same
    * fold runs chunked (fold each chunk, then fold chunk states with the
    * closed-form weight `(1−α)^len`); the single-pass form here is the
    * honest default for the bounded per-entity series (user histories,
    * sensor days) the operator targets.
    *
    * Determinism: the fold is a fixed sequence of IEEE ops in sorted order
    * — any engine replaying the same sequence agrees bit-for-bit (DuckDB's
    * `list_reduce` over `list(... ORDER BY ...)` does).
    *
    * Returns (key, n, ewma); α is passed as an exact-in-binary literal
    * (0.25, 0.5, 0.125…) so the per-step arithmetic has no decimal-literal
    * drift across engines.
    */
  def ewma(df: DataFrame, keyCol: String, ordCols: Seq[String],
           valCol: String, alpha: Double): DataFrame = {
    val ordStruct = struct(ordCols.map(col) :+
      col(valCol).cast("double").as("v"): _*)
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(ordStruct)).as("s"))
      .select(col(keyCol), size(col("s")).as("n"),
        expr(s"aggregate(slice(s, 2, size(s) - 1), s[0].v, " +
          s"(acc, x) -> acc + $alpha * (x.v - acc))").as("ewma"))
  }

  /** First-order Markov transition matrix over per-entity event sequences:
    * P(next event type | current event type), the journey model behind
    * next-step prediction and funnel-drop diagnosis.
    *
    * Shape: ONE window (partition by entity, total order by `ordCols`)
    * produces each event's predecessor via `lag`; transition counts are a
    * map-side-combined groupBy; row-normalization joins the per-source
    * totals broadcast (the matrix is event-type² — always tiny next to the
    * log). No self-join of the event table, no collect.
    *
    * Returns (prev_type, next_type, n, p) with p = n / Σ_next n.
    */
  def transitionMatrix(events: DataFrame, entityCol: String,
                       ordCols: Seq[String], typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol)).orderBy(ordCols.map(col): _*)
    val t = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = t.groupBy(col("prev_type")).agg(sum(col("n")).as("__tot"))
    t.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("__tot")).as("p"))
  }

  /** Pearson χ² test of independence between two categorical columns — the
    * "is label correlated with source?" audit run before trusting a
    * stratification. One contingency aggregate (map-side combined), margins
    * joined broadcast (category-count-sized), expected counts and the χ²
    * sum in exact-integer-derived doubles. Returns ONE row:
    * (chi2, dof, n_rows, n_cells).
    *
    * BOUNDED-CATEGORIES CONTRACT: the R×C grid is materialized in full, so
    * both columns must be genuinely categorical. The margin cardinalities
    * are checked eagerly over the PERSISTED contingency aggregate — the
    * guard job builds `obs` once (one linear scan, cached), counts both
    * distinct margins from it, and the returned plan reuses the same
    * cached `obs` for the margins and the grid join, so the guard costs no
    * second scan of the input. The call fails loudly (and drops the cache)
    * when R·C exceeds `maxCells`; a mistaken id-like column dies here,
    * never as a cluster-wide cross-join blow-up. NOTE: this is an eager
    * action at construction time, by contract — the one-row answer is
    * computed inside the call and `obs` unpersisted before returning, so
    * callers never inherit a dangling cached block.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String,
                maxCells: Long = 1000000L): DataFrame = {
    val obs = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowT = obs.groupBy(col(aCol)).agg(sum(col("__n")).as("__ra"))
    val colT = obs.groupBy(col(bCol)).agg(sum(col("__n")).as("__cb"))
    // null-aware distinct: groupBy treats NULL as its own category, so the
    // guard must too (countDistinct alone skips NULLs). obs carries every
    // distinct (a, b) combination, so margins over obs ≡ margins over df.
    def nCats(c: String) =
      (countDistinct(col(c)) +
        coalesce(max(when(col(c).isNull, lit(1L)).otherwise(lit(0L))), lit(0L)))
    val guard = obs.agg(nCats(aCol).as("na"), nCats(bCol).as("nb")).head()
    val (nA, nB) = (guard.getLong(0), guard.getLong(1))
    if (nA * nB > maxCells) {
      obs.unpersist()
      throw new IllegalArgumentException(
        s"requirement failed: chiSquare: $aCol x $bCol spans $nA x $nB = " +
          s"${nA * nB} contingency cells (> $maxCells) — both columns must " +
          "be low-cardinality categoricals; an id-like column does not " +
          "belong in a chi-square")
    }
    val tot = obs.agg(sum(col("__n")).as("__t"))
    // the FULL R×C grid, not just observed cells — an empty cell still
    // contributes (0−e)²/e = e, and skipping it understates χ² exactly
    // when dependence is strongest (caught by the diagonal-table spec)
    val result = rowT.crossJoin(colT)
      .join(obs, Seq(aCol, bCol), "left")
      .withColumn("__o", coalesce(col("__n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__e", (col("__ra") * col("__cb")).cast("double") / col("__t"))
      .withColumn("__term",
        (col("__o").cast("double") - col("__e")) *
          (col("__o").cast("double") - col("__e")) / col("__e"))
      .agg(sum(col("__term")).as("chi2"),
        ((countDistinct(col(aCol)) - 1) * (countDistinct(col(bCol)) - 1))
          .as("dof"),
        sum(col("__o")).as("n_rows"),
        count(lit(1)).as("n_cells"))
    // the operator is already eager by contract (the guard above acted);
    // materializing the one-row answer here lets obs UNPERSIST before
    // returning, so direct library callers don't accumulate a cached block
    // per call (the Bench harness cleared them; a long-lived session
    // wouldn't — round-11 advice). The returned frame is the collected row
    // as a local relation: value-identical, no dangling cache.
    // finally: a failed head() (executor loss, cancelled job) must not
    // leak the persisted block either — the error path is part of the
    // no-dangling-cache contract
    val row = try result.head() finally obs.unpersist(blocking = false)
    df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(row), result.schema)
  }

  /** KL divergence of each group's token distribution from the whole-corpus
    * distribution — the data-mix drift monitor (which source's unigram
    * profile diverges?) a training pipeline runs per snapshot. Q is the
    * pooled corpus, so P's support ⊆ Q's and no smoothing is needed; terms
    * are p·ln(p/q) in doubles derived from exact integer counts. Shapes:
    * one (group, token) aggregate; ALL THREE margins — per-group totals,
    * per-token totals, grand total — broadcast, so the big (group, token)
    * frame is never re-shuffled after its aggregate. If a corpus's unigram
    * vocabulary ever outgrew the broadcast budget, drop the `ct` hint and
    * that one join degrades to a shuffle; the rest of the shape stands.
    */
  def klDivergence(tokens: DataFrame, groupCol: String,
                   tokenCol: String): DataFrame = {
    val gc = tokens.groupBy(col(groupCol), col(tokenCol))
      .agg(count(lit(1)).as("__n"))
    val gt = gc.groupBy(col(groupCol)).agg(sum(col("__n")).as("__ng"))
    val ct = gc.groupBy(col(tokenCol)).agg(sum(col("__n")).as("__nt"))
    val tot = gc.agg(sum(col("__n")).as("__t"))
    gc.join(broadcast(gt), groupCol).join(broadcast(ct), tokenCol)
      .crossJoin(broadcast(tot))
      .withColumn("__p", col("__n").cast("double") / col("__ng"))
      .withColumn("__q", col("__nt").cast("double") / col("__t"))
      .groupBy(col(groupCol))
      .agg(sum(col("__p") * log(col("__p") / col("__q"))).as("kl_nats"),
        count(lit(1)).as("n_distinct_tokens"),
        max(col("__ng")).as("n_tokens"))
  }

  /** Peak interval concurrency per key — the sweep-line maximum-overlap
    * count (how many sessions/calls/locks were simultaneously open), the
    * capacity question every ops mart asks of interval data.
    *
    * Shape: each interval explodes to a +1 (start) and −1 (end) boundary —
    * a narrow 2× map — then ONE key-partitioned window computes the running
    * sum in boundary order and one aggregate takes its max. Half-open
    * [start, end) semantics: at equal timestamps ends sort BEFORE starts
    * (delta ascending), so back-to-back intervals never double-count; the
    * ANSI RANGE default frame makes tied boundaries collapse identically on
    * any replaying engine.
    */
  def peakConcurrency(intervals: DataFrame, keyCol: String, startCol: String,
                      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = intervals
      .select(col(keyCol), col(startCol).as("__t"), lit(1L).as("__delta"))
      .unionByName(intervals
        .select(col(keyCol), col(endCol).as("__t"), lit(-1L).as("__delta")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__delta"))
    b.withColumn("__open", sum(col("__delta")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__open")).as("peak"), (count(lit(1)) / 2).cast("long").as("n_intervals"))
  }

  /** Top-k opening paths: each entity's first `firstN` event types joined
    * into one `a>b>c` path string, counted across entities — the
    * entry-journey summary (which onboarding flows actually happen) on the
    * same sorted-fold discipline as [[ewma]].
    *
    * Shape: ONE groupBy collects each entity's events as structs, the
    * in-row `sort_array` + `slice` pins the order and truncates to
    * `firstN` (per-entity memory is the entity's history — the bounded
    * per-entity series contract), path counts are map-side combined, and
    * the top-k compiles to TakeOrderedAndProject (k·tasks shuffle, never a
    * global sort). Ties break on the path string for determinism.
    */
  /** Ordered-sequence (funnel) matching — the MATCH_RECOGNIZE / CEP shape:
    * per key, does an ascending-time chain step₀ < step₁ < … < stepₖ₋₁
    * exist with total span ≤ `windowUs`, and when does the FIRST such
    * chain complete?
    *
    * Linear-scan DP instead of the k-way self-join a relational
    * formulation plans (the oracle replays THAT — O(nᵏ) per key — at test
    * scale): events fold in (ts, id) order through a k-slot state where
    * slot j holds the LATEST chain start among prefixes reaching step j
    * (keeping the latest feasible start dominates every other prefix — the
    * standard funnel exchange argument, so existence and first-completion
    * are exact). The whole DP is one `aggregate` lambda over each key's
    * sorted event array — native Catalyst, no UDF, O(n·k) per key, state
    * = k longs regardless of history length. At 100 TB the per-key arrays
    * are the sessionizer's output; nothing ever self-joins.
    *
    * Returns (key, converted, first_completion) — completion NULL when no
    * chain fits the window.
    *
    * `blockers` is CEP NEGATION — the pattern feature joins can't express
    * without a per-chain NOT EXISTS: a chain is valid only if NO blocker
    * event falls (ts, id)-between its first and last step. In the DP a
    * blocker simply RESETS every in-progress slot: any chain completing
    * later necessarily started after the blocker, so blocker-freeness
    * holds by construction, and every blocker-free chain lives inside one
    * blocker-free segment where the plain dominance argument applies —
    * still exact, still O(n·k).
    */
  /** Per-key buffer contract: the plain path collects each key's whole
    * filtered history into one row before folding — bounded-per-entity, the
    * same contract as [[topPaths]]/[[ewma]]. Two mechanisms bound it for
    * adversarial keys at 100 TB:
    *   - with `blockers`, the fold is SEGMENTED at blocker boundaries
    *     (running blocker count per key via a spill-able window sort, then
    *     one fold per blocker-free run): a blocker resets every slot, so no
    *     chain spans a blocker — per-segment folds + min-completion across
    *     segments are EXACT, and the buffer is the longest blocker-free
    *     run, not the key's lifetime (property-tested against the
    *     unsegmented DP in AnalyticsSpec);
    *   - `maxEventsPerKey` caps each fold buffer explicitly: histories are
    *     truncated to the first m events (per segment when segmented) and
    *     the output gains an `overflowed` flag — completions whose events
    *     fall beyond the cap are missed, and the flag says exactly which
    *     keys that could affect. No cap (the default) keeps the exact
    *     schema-stable behavior.
    */
  def funnelMatch(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, typeCol: String, steps: Seq[String],
                  windowUs: Long, blockers: Seq[String] = Nil,
                  maxEventsPerKey: Option[Int] = None): DataFrame = {
    require(steps.length >= 2, "funnelMatch needs at least two steps")
    require(blockers.intersect(steps).isEmpty, "a step cannot also block")
    require(maxEventsPerKey.forall(_ >= 2), "cap below 2 can match nothing")
    val k = steps.length
    val stepIdx = blockers.foldLeft(
      steps.zipWithIndex.foldLeft(lit(-1): org.apache.spark.sql.Column) {
        case (e, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(e)
      }) { case (e, b) => when(col(typeCol) === b, lit(k)).otherwise(e) }
    val evs = events.filter(col(typeCol).isin(steps ++ blockers: _*))
      .select(col(keyCol).as("key"),
        struct(col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
          stepIdx.as("step")).as("e"))
    // sort_array orders by (ts, id, step) — "before" for the DP means
    // lexicographically (ts, id)-earlier, which is also the tie rule the
    // oracle must replay for simultaneous events
    val grouped =
      if (blockers.isEmpty)
        evs.groupBy(col("key")).agg(sort_array(collect_list(col("e"))).as("es"))
      else {
        // segment id = running blocker count in (ts, id, step) order — the
        // same total order sort_array pins — so each (key, __seg) group is
        // one maximal blocker-free run headed by its blocker (kept, not
        // dropped: the fold resets on it harmlessly, and keys whose history
        // is blockers-only still surface as non-converted rows)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("key"))
          .orderBy(col("e.ts"), col("e.id"), col("e.step"))
        evs.withColumn("__seg",
            sum(when(col("e.step") === k, 1L).otherwise(0L)).over(w))
          .groupBy(col("key"), col("__seg"))
          .agg(sort_array(collect_list(col("e"))).as("es"))
      }
    val capped = maxEventsPerKey match {
      case Some(m) =>
        // cap AFTER dropping the segment's heading blocker (a segment holds
        // at most one — its head), so the budget is m REAL events per
        // segment as documented, and `overflowed` never flags a segment
        // whose only excess row was the blocker itself
        val noBlock = filter(col("es"), e => e.getField("step") =!= k)
        grouped
          .withColumn("__ov", size(noBlock) > m)
          .withColumn("es", slice(noBlock, 1, m))
      case None => grouped.withColumn("__ov", lit(false))
    }
    // acc = (st: per-step latest chain start, -1 = unreached; done: first
    // completion). Keeping the LATEST start per step dominates: any prefix
    // that could extend at time t is represented by one with a start at
    // least as late (processed-order makes "earlier step happened before
    // t" automatic), so existence and first-completion are exact.
    val acc0 = struct(
      array_repeat(lit(-1L), k).as("st"),
      lit(null).cast("long").as("done"))
    val folded = capped.select(col("key"), col("__ov"),
      aggregate(col("es"), acc0, (acc, e) => {
        val st = acc.getField("st")
        val newSt = transform(sequence(lit(0), lit(k - 1)), j => {
          val self = element_at(st, j + 1)
          val prev = element_at(st, j) // guarded: evaluated only for j >= 1
          when(e.getField("step") === k, lit(-1L)) // blocker: reset the slot
            .when(e.getField("step") =!= j, self)
            .when(j === 0, e.getField("ts"))
            .when(prev >= 0 && e.getField("ts") - prev <= windowUs &&
              prev > self, prev)
            .otherwise(self)
        })
        val prevLast = element_at(st, k - 1) // step k-2's start, pre-update
        val completes = e.getField("step") === (k - 1) &&
          prevLast >= 0 && e.getField("ts") - prevLast <= windowUs
        struct(newSt.as("st"),
          coalesce(acc.getField("done"),
            when(completes, e.getField("ts"))).as("done"))
      }).getField("done").as("first_completion"))
    // segments are time-ordered per key, so the earliest segment completion
    // IS the first completion (min skips NULL non-converting segments)
    val perKey =
      if (blockers.isEmpty) folded
      else folded.groupBy(col("key"))
        .agg(min(col("first_completion")).as("first_completion"),
          max(col("__ov")).as("__ov"))
    val out = perKey.select(col("key"),
      col("first_completion").isNotNull.as("converted"),
      col("first_completion"), col("__ov").as("overflowed"))
    if (maxEventsPerKey.isDefined) out else out.drop("overflowed")
  }

  def topPaths(events: DataFrame, entityCol: String, ordCols: Seq[String],
               typeCol: String, firstN: Int, k: Int): DataFrame = {
    val ordStruct = struct(ordCols.map(col) :+
      col(typeCol).cast("string").as("t"): _*)
    events.groupBy(col(entityCol))
      .agg(sort_array(collect_list(ordStruct)).as("s"))
      .select(expr(s"array_join(transform(slice(s, 1, $firstN), x -> x.t), '>')")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Zipf-law fit per stratum — the log-log OLS slope of the top-`topN`
    * token frequencies against their ranks, a one-number corpus-quality
    * fingerprint (natural text sits near −1; templated/boilerplate or
    * machine-generated strata drift flatter or steeper — a cheap drift
    * monitor beside [[graft.operators.LanguageModel.sourceDrift]]).
    *
    * Scale shape: the census is one map-side-combined aggregate; the
    * `rank <= topN` filter compiles to map-side WindowGroupLimit, so the
    * regression runs over ≤ topN rows per stratum AT ANY CORPUS SIZE —
    * the in-row OLS fold is bounded by topN, never the vocabulary.
    * Determinism: the four running sums fold over the rank-sorted array in
    * pinned order (cf. [[ewma]]); `ln` of small integers agrees across
    * engines (q36's raw-ln oracle is the precedent) and the emitted slope
    * is 6-decimal-rounded on both sides regardless.
    */
  def zipfSlope(df: DataFrame, groupCol: String, textCol: String,
                topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 2, s"a slope needs at least 2 ranks, got topN=$topN")
    val census = df
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("tok").asc)
    val ranked = census.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
    val arr = array_sort(collect_list(struct(col("rank"), col("cnt"))))
    def fold(f: Column => Column): Column =
      aggregate(col("__l"), lit(0.0), (a, x) => a + f(x))
    val lx = (x: Column) => log(x("rank").cast("double"))
    val ly = (x: Column) => log(x("cnt").cast("double"))
    ranked.groupBy(col(groupCol)).agg(arr.as("__l"))
      .select(col(groupCol),
        size(col("__l")).cast("long").as("n_tokens_used"),
        fold(lx).as("__sx"), fold(ly).as("__sy"),
        fold(x => lx(x) * lx(x)).as("__sxx"),
        fold(x => lx(x) * ly(x)).as("__sxy"))
      .select(col(groupCol), col("n_tokens_used"),
        // a 1-distinct-token stratum has OLS denominator exactly 0 (one
        // rank): NULL slope explicitly, never a divide-by-zero (ANSI-safe)
        when(col("n_tokens_used") >= 2,
          round((col("n_tokens_used") * col("__sxy") - col("__sx") * col("__sy")) /
            (col("n_tokens_used") * col("__sxx") - col("__sx") * col("__sx")), 6))
          .as("zipf_slope"))
  }

  /** CUSUM changepoint detection per group (Page 1954 cumulative sums;
    * the normalized max-|S| form is the classic retrospective mean-shift
    * test — cf. Csörgő & Horváth 1997): for each group's observations
    * x_1..x_n in `ordCols` order, the centered cumulative sum
    * S_i = Σ_{j≤i}(x_j − x̄) peaks where the mean shifts; the test
    * statistic D = max_i |S_i| / (s·√n) is compared against the
    * Kolmogorov–Smirnov-style critical value (1.358 ≈ 95%), and the
    * changepoint estimate is the argmax index (ties → earliest).
    *
    * One row per group: (groupCol, n_obs, mean_value, stddev_value,
    * cusum_stat, cp_index [1-based argmax of |S|], flagged). Groups with
    * n < 2 or zero variance report a NULL statistic and are never flagged
    * (no shift is detectable without dispersion).
    *
    * The running sum folds in the pinned `ordCols` order inside one
    * per-group window sort (ties must be broken by the caller's ordCols —
    * pass a unique tiebreaker last, cf. [[ewma]]), so the float fold
    * order is identical on every engine and at every partitioning.
    *
    * Scale shape: ONE shuffle on the group key, one window sort per group
    * (the same n·log n every per-group sequential statistic pays), and a
    * group-sized argmax window — state per group is O(1), nothing
    * corpus-sized on the driver. Monitoring at 100 TB runs this per
    * (source, day) partition where the group is bounded by the day's
    * events.
    */
  def cusumChangepoint(df: DataFrame, groupCol: String,
                       ordCols: Seq[String], valueCol: String,
                       threshold: Double = 1.358): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ordCols.nonEmpty, "ordCols must name at least one order column")
    val g = Window.partitionBy(col(groupCol))
    val ord = g.orderBy(ordCols.map(col(_).asc): _*)
    val stats = df
      .withColumn("__m", avg(col(valueCol)).over(g))
      .withColumn("__sd", stddev_samp(col(valueCol)).over(g))
      .withColumn("__n", count(lit(1)).over(g))
      .withColumn("__i", row_number().over(ord))
      .withColumn("__s", sum(col(valueCol).cast("double") - col("__m"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val peak = stats.withColumn("__rn", row_number().over(
        g.orderBy(abs(col("__s")).desc, col("__i").asc)))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col("__n").as("n_obs"),
        round(col("__m"), 6).as("mean_value"),
        round(col("__sd"), 6).as("stddev_value"),
        when(col("__n") >= 2 && col("__sd") > 0.0,
          round(abs(col("__s")) / (col("__sd") * sqrt(col("__n").cast("double"))), 6))
          .as("cusum_stat"),
        col("__i").cast("long").as("cp_index"))
    peak.withColumn("flagged",
      coalesce(col("cusum_stat") > threshold, lit(false)))
  }
}
