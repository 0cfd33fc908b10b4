package graft.queries

import graft.functions.{GapParser, TextFunctions, VectorFunctions}
import graft.operators._
import graft.pipeline.{F1Staging, F1Synthetic}
import graft.sources.{BloomStore, Bucketed, Tables, TxLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryShared._

/** Time-series / statistics / sketches: sessionization, windows, resampling, EWMA, OLS, outliers, percentiles, KMV/CMS/HLL, attribution, retention, skew tooling.
  *
  * Split from the original single-file registry; each entry keeps its
  * Scaladoc mapping to SURVEY.md §2 / the reference files. The driver
  * surface remains [[graft.SparkEntry.queries]]/[[graft.SparkEntry.oracleSql]],
  * which merge the per-family maps.
  */
private[graft] object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** Gap-based sessionization, batch twin of the stateful streaming
      * operator ([[graft.streaming.Sessionize]]); 30-minute gap.
      */
    "q35_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("value"))
      graft.streaming.Sessionize.sessionizeBatch(ev, gapUs = 30L * 60 * 1000000)
    }),

    /** Deterministic cardinality sketch (extension): KMV distinct-count
      * estimate vs exact, per l_returnflag over l_partkey
      * ([[graft.operators.Sketches.kmvDistinct]]). Unlike HLL, the estimate
      * itself is oracle-replayable — approximate at scale does not have to
      * mean unverifiable.
      */
    "q51_kmv_distinct" -> ((s, dir) => {
      val est = Sketches.kmvDistinct(li(s, dir), Seq("l_returnflag"), "l_partkey", 256)
      val exact = li(s, dir).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("distinct_exact"))
      est.join(exact, Seq("l_returnflag"))
    }),

    /** Per-language token-length distribution (extension): exact
      * nearest-rank p50/p90/p99 — float-free integer ranking, so the
      * percentile is oracle-replayable ([[graft.operators.Sketches
      * .percentilesByGroup]]); the `approx_percentile` sketch twin is the
      * 100 TB path (agreement spec-checked).
      */
    "q54_token_percentiles" -> ((s, dir) => Sketches.percentilesByGroup(
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextFunctions.bpeTokenCount(col("text")).as("n_tok")),
      "lang", "n_tok", "doc_id",
      Seq(("p50_tok", 1, 2), ("p90_tok", 9, 10), ("p99_tok", 99, 100)))
    ),

    /** Skew diagnostic over the events stream's user key: top-25 hottest
      * keys with row share and skew factor — the measurement that picks
      * between AQE skew-join and explicit salting, and sizes the salt.
      */
    "q63_skew_report" -> ((s, dir) => SkewJoin.skewReport(
      Tables.events(s, dir).select("user_id"), Seq("user_id"), topN = 25)),

    /** Generic point-in-interval range join (extension): lineitem-derived
      * points against orders-derived intervals via bin quantization
      * ([[graft.operators.RangeJoin.binnedRangeJoin]]) — an equi-join on the
      * bin id + residual BETWEEN, where the naive formulation is a
      * BroadcastNestedLoopJoin over every (point, interval) pair
      * (plan-shape-guarded in PlanShapeSpec).
      */
    "q71_range_join" -> ((s, dir) => {
      val points = li(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") * 3 + col("l_linenumber") * 7).cast("long").as("pt"))
      val intervals = orders(s, dir).filter(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey").as("iv_id"),
          (col("o_orderkey") * 3).cast("long").as("lo"),
          (col("o_orderkey") * 3 + 400).cast("long").as("hi"))
      RangeJoin.binnedRangeJoin(points, intervals, "pt", "lo", "hi", binWidth = 256)
        .select(col("iv_id"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"), col("pt"))
    }),

    /** Last-touch attribution over the events stream (extension; batch twin
      * of the stream-stream interval join, [[graft.streaming.Attribution]]):
      * each purchase credited to the user's latest view within 24 hours —
      * equi-join on user + residual range filter (never a time-theta nested
      * loop), then `max_by` last-touch (map-side combined). The streaming
      * form with two-sided watermarks is spec-verified against this twin.
      */
    "q73_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def typed(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))
      graft.streaming.Attribution.lastTouchBatch(
        typed("view"), typed("purchase"), windowUs = 24L * 3600 * 1000000)
    }),

    /** Unattributed conversions (extension; [[graft.streaming.Attribution
      * .unattributedBatch]] — q73's complement, and the batch twin of the
      * streaming LEFT-OUTER interval join whose watermark-deferred
      * NULL-view emission is spec'd in AttributionSpec): purchases with no
      * view in the preceding 2-hour window, as one anti-join on the same
      * equi-key + range condition. The funnel-health signal an alerting
      * job watches.
      */
    "q193_unattributed" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def typed(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))
      graft.streaming.Attribution.unattributedBatch(
        typed("view"), typed("purchase"), windowUs = 2L * 3600 * 1000000)
    }),

    /** Ordered-sequence funnel matching (extension; [[graft.operators
      * .Analytics.funnelMatch]] — the MATCH_RECOGNIZE / CEP surface): per
      * user, does view → click → purchase occur in (ts, id)-ascending
      * order within 24 hours, and when does the FIRST such chain complete?
      * The engine runs the O(n·k) latest-start fold over each user's
      * sorted events (one aggregate lambda, state = k longs); the oracle
      * replays the semantics as the O(n³)-per-user triple self-join it
      * would be relationally — the asymmetry IS the operator's reason to
      * exist.
      */
    "q195_funnel_match" -> ((s, dir) =>
      Analytics.funnelMatch(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"), windowUs = 24L * 3600 * 1000000)
        .select(col("key").as("user_id"), col("converted"),
          col("first_completion"))),

    /** Funnel matching with NEGATION (extension; [[graft.operators
      * .Analytics.funnelMatch]] `blockers` — the CEP feature a join can
      * only express as a per-chain NOT EXISTS): view → click → purchase
      * within 24h, valid only if no `error` event falls between the
      * chain's first and last step. In the DP a blocker resets every
      * in-progress slot (a chain completing later provably started after
      * it), keeping the scan O(n·k); the oracle pays the triple join PLUS
      * the correlated NOT EXISTS.
      */
    "q198_funnel_negation" -> ((s, dir) =>
      Analytics.funnelMatch(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"), windowUs = 24L * 3600 * 1000000,
        blockers = Seq("error"))
        .select(col("key").as("user_id"), col("converted"),
          col("first_completion"))),

    /** Salted-join correctness proof (extension): the hot-key fanout join
      * ([[graft.operators.SkewJoin.saltedJoin]], n=8 — fact rows salted,
      * dim replicated ×8) must produce EXACTLY the plain join's rows; the
      * oracle is that plain join. The salt is layout-dependent and never
      * reaches the output — this query pins that containment.
      */
    "q77_salted_join" -> ((s, dir) => {
      val fact = li(s, dir).select(col("l_orderkey").as("k"), col("l_quantity"))
      val dim = orders(s, dir).select(col("o_orderkey").as("k"), col("o_totalprice"))
      SkewJoin.saltedJoin(fact, dim, "k", n = 8)
        .select(col("k"), col("l_quantity"), col("o_totalprice"))
    }),

    /** Time-based sliding-window aggregate (extension): per-user trailing
      * 1-hour sum/count by event time — a RANGE frame (peers included by
      * VALUE distance, not row position), the batch shape of the streaming
      * windowed agg. Sort-based window operator; spills, never buffers a
      * user's history in memory.
      */
    "q78_time_window_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us")).rangeBetween(-3600000000L, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("ts_us"), col("value"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          sum(col("value")).over(w).as("trailing_sum"),
          count(lit(1)).over(w).as("trailing_n"))
    }),

    /** Top-k per group (extension; k=3 by value): `row_number ≤ k` over a
      * total order — Spark compiles the rank filter to a map-side
      * `WindowGroupLimit` (each task forwards only its local top-k per key
      * before the shuffle; the plan family guarded in PlanShapeSpec), so
      * the exchange carries O(k·keys·tasks) rows, not the table.
      */
    "q80_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").desc)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .select(col("user_id"), col("rnk").cast("long").as("rnk"),
          col("event_id"), col("value"))
    }),

    /** Exact interpolated percentiles per group (extension): `percentile`
      * with linear interpolation — the continuous complement to q54's
      * nearest-rank/approx pair; Spark and the oracle share the
      * `lo + frac·(hi-lo)` definition over the two adjacent order
      * statistics, so results are engine-exact. Exact percentile sorts
      * per group; the approx_percentile KLL twin (q54) is the 100 TB path.
      */
    "q83_percentile_cont" -> ((s, dir) =>
      li(s, dir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("__p"))
        .select(col("l_returnflag"), col("n"),
          col("__p").getItem(0).as("p50"), col("__p").getItem(1).as("p90"))),

    /** Per-group z-score normalization + outlier flag (extension; the
      * feature-scaling prep step): token counts standardized against each
      * SOURCE's mean/stddev — a k-row stats aggregate broadcast back onto
      * the corpus (no window sort), |z| > 2 flags length outliers (the
      * threshold has measured ≥1.7e-2 clearance from every attainable |z|
      * at all sf's, so the flag can't flip on last-bit float divergence).
      */
    "q86_zscore_outliers" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("double").as("n_tok"))
      val stats = t.groupBy(col("source")).agg(
        avg(col("n_tok")).as("__mu"), stddev_samp(col("n_tok")).as("__sg"))
      t.join(broadcast(stats), "source")
        .select(col("doc_id"), col("source"), col("n_tok").cast("long").as("n_tok"),
          ((col("n_tok") - col("__mu")) / col("__sg")).as("z"),
          (abs((col("n_tok") - col("__mu")) / col("__sg")) > 2.0).as("is_outlier"))
    }),

    /** MAD robust outliers (extension; the heavy-tail-safe complement to
      * q86's z-scores — mean/stddev are themselves dragged by the outliers
      * they're hunting; median/MAD are 50%-breakdown robust): per-source
      * modified z-score 0.6745·(x−med)/MAD, |rz| > 3.5 (Iglewicz–Hoaglin
      * cut; measured ≥0.5 clearance from attainable values at all sf's).
      * Two exact interpolated medians per group (q83 machinery), each a
      * k-row broadcast back — no window sorts.
      */
    "q89_mad_outliers" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("double").as("n"))
      val m = t.groupBy(col("source")).agg(expr("percentile(n, 0.5D)").as("__med"))
      val d = t.join(broadcast(m), "source")
        .withColumn("__dev", col("n") - col("__med"))
      val md = d.groupBy(col("source"))
        .agg(expr("percentile(abs(__dev), 0.5D)").as("__mad"))
      d.join(broadcast(md), "source")
        .select(col("doc_id"), col("source"), col("n").cast("long").as("n_tok"),
          (lit(0.6745) * col("__dev") / col("__mad")).as("robust_z"),
          (abs(lit(0.6745) * col("__dev") / col("__mad")) > 3.5).as("is_outlier"))
    }),

    /** Hopping event-time windows (extension; `window(ts, 1h, 30m)` — the
      * overlapping-window surface q18's tumbling aggregate doesn't cover):
      * every event lands in duration/slide = 2 windows; the aggregate runs
      * once over the exploded assignment (epoch-aligned starts, Spark's
      * window contract, replayed arithmetically by the oracle).
      */
    "q90_hopping_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(expr("unix_micros(w.start)").as("window_start_us"),
          col("n_events"), col("sum_value"))),

    /** Count-min sketch heavy hitters (extension;
      * [[graft.operators.Sketches.countMinCells]]): word frequencies of the
      * corpus summarized into a 4×1024 counter grid (fixed-size however
      * large the stream), then the 20 most frequent words estimated back
      * from the sketch next to their exact counts — the overestimate
      * property (`cms_est ≥ n_exact`, within ε·N) is visible in the result
      * and pinned in the spec. Deterministic md5-derived hashing makes the
      * whole sketch oracle-replayable.
      */
    "q94_count_min" -> ((s, dir) => {
      val terms = docs(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      val cells = Sketches.countMinCells(terms, col("term"), depth = 4, width = 1024)
      val top = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term").asc).limit(20)
      Sketches.countMinEstimates(cells, top, "term", depth = 4, width = 1024)
        .select(col("term"), col("n_exact"), col("cms_est"))
    }),

    /** Rolling correlation (extension;
      * [[graft.operators.WindowFeatures.rollingCorr]]): trailing-8-row
      * Pearson correlation of quantity vs a part-derived series per
      * supplier. All five running sums ride ONE window pass as exact
      * integers; the correlation is a single double expression over them —
      * engine-portable where a native corr() window is not.
      */
    "q104_rolling_corr" -> ((s, dir) => {
      val base = li(s, dir).select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity").cast("long").as("x"),
        (col("l_partkey") % 97).as("y"))
      // the synthetic lineitem repeats (orderkey, linenumber) pairs — x/y
      // tiebreakers make the order total up to fully-identical rows, whose
      // relative order cannot change any frame's sums
      WindowFeatures.rollingCorr(base,
        WindowFeatures.orderedWindow(Seq("l_suppkey"),
          Seq(col("l_orderkey"), col("l_linenumber"), col("x"), col("y"))),
        "x", "y", n = 8, outName = "roll_corr")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("roll_corr"))
    }),

    /** Unpivot/melt (extension; `Dataset.unpivot` — Spark's native
      * wide-to-long reshape, a narrow zero-shuffle map): part metrics to
      * (key, metric, value) rows, the shape feature stores and long-format
      * analytics want.
      */
    "q106_unpivot" -> ((s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice").cast("double").as("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")),

    /** LOCF resampling (extension; [[graft.operators.Resample.locf]]): the
      * irregular event stream resampled to a daily per-user grid, each
      * bucket carrying the latest value as of its end. Union-window
      * formulation — one shuffle + one ordered pass, no as-of join per
      * bucket; leading gaps stay NULL.
      */
    "q108_resample_locf" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("value"))
      Resample.locf(ev, "user_id", "ts_us", "value", "event_id")
    }),

    /** Join-size estimation from sketches (extension;
      * [[graft.operators.Sketches.countMinJoinSize]] — the CM inner-product
      * estimator): lineitem⋈orders cardinality predicted from two
      * depth×width grids joined on (row, cell), never the tables — the
      * planner's "how big is this join" from summaries. Emitted beside the
      * exact size so the oracle pins both the estimate's arithmetic and its
      * ≥-exact property on real data.
      */
    "q109_cms_join_size" -> ((s, dir) => {
      val d = 4; val wdt = 1024
      val a = Sketches.countMinCells(
        li(s, dir).select(col("l_orderkey")), col("l_orderkey"), d, wdt)
      val b = Sketches.countMinCells(
        orders(s, dir).select(col("o_orderkey")), col("o_orderkey"), d, wdt)
      val exact = li(s, dir).select(col("l_orderkey"))
        .join(orders(s, dir).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("exact_size"))
      exact.crossJoin(Sketches.countMinJoinSize(s, a, b, d))
    }),

    /** Winsorized mean (extension;
      * [[graft.operators.Sketches.winsorizedMeans]]): per-supplier quantity
      * averages with the tails clipped at the exact nearest-rank 10th/90th
      * percentiles — integer ranks, selected bounds, exact clipped sums;
      * the only double is the final division.
      */
    "q113_winsorized" -> ((s, dir) =>
      Sketches.winsorizedMeans(
        li(s, dir).select(col("l_suppkey"), col("l_quantity")),
        "l_suppkey", "l_quantity", 1, 10)),

    /** Gaps-and-islands (extension; [[graft.operators.WindowFeatures
      * .islands]]): each user's maximal streaks of consecutive active DAYS
      * — the constant-difference trick, one window pass + one aggregate.
      */
    "q121_islands" -> ((s, dir) =>
      WindowFeatures.islands(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day")),
        Seq("user_id"), "day")),

    /** HLL set algebra (extension; [[graft.operators.Sketches.hllOverlap]]):
      * pairwise customer-set overlap between order priorities, answered from
      * the groups' 64-register sketches alone — union by register max-merge,
      * intersection by inclusion–exclusion — with the exact pair
      * intersection beside it as the honesty baseline. The oracle replays
      * registers, estimates, and the exact counts bit-for-bit.
      */
    "q124_hll_overlap" -> ((s, dir) => {
      val o = orders(s, dir)
        .select(col("o_orderpriority").as("g"), col("o_custkey").as("c"))
      val est = Sketches.hllOverlap(
        Sketches.hllRegisters(o.withColumnRenamed("c", "v"), Seq("g"), "v"), "g")
      val d = o.distinct()
      val exact = d.as("x").join(d.as("y"),
          col("x.c") === col("y.c") && col("x.g") < col("y.g"))
        .select(col("x.g").as("g1"), col("y.g").as("g2"))
        .groupBy("g1", "g2").agg(count(lit(1)).as("exact_inter"))
      est.join(exact, Seq("g1", "g2"), "left")
        .select(col("g1"), col("g2"), col("est_g1"), col("est_g2"),
          col("est_union"), col("est_inter"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
    }),

    /** Cohort retention matrix (extension; [[graft.operators.Analytics
      * .retentionMatrix]]): users cohorted by first-event week; per
      * (cohort, weeks-since-first) cell, how many came back. Exact epoch-µs
      * day buckets (no calendar functions), user-keyed aggregates, cohort
      * sizes joined broadcast.
      */
    "q133_cohort_retention" -> ((s, dir) =>
      Analytics.retentionMatrix(Tables.events(s, dir), "user_id", "ts")),

    /** Per-key EWMA (extension; [[graft.operators.Analytics.ewma]]): the
      * sequential smoothing recurrence as a sorted higher-order `aggregate`
      * fold per user — one groupBy shuffle, no window sort, no UDF; the
      * oracle replays the identical IEEE fold with `list_reduce`.
      */
    "q134_ewma" -> ((s, dir) =>
      Analytics.ewma(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("value")),
        "user_id", Seq("ts_us", "event_id"), "value", 0.25)),

    /** CUSUM changepoint detection (extension; [[graft.operators
      * .Analytics.cusumChangepoint]] — Page 1954): per event type, the
      * normalized max-|centered-cumsum| statistic over the time-ordered
      * value stream, with the KS-style 1.358 critical value and the
      * argmax row as the changepoint estimate — the drift-monitoring
      * primitive (q244 watches DISTRIBUTIONS per batch; this finds WHERE
      * in a stream the mean shifted). One window sort per group, O(1)
      * state per group.
      */
    "q260_cusum_changepoint" -> ((s, dir) =>
      Analytics.cusumChangepoint(
        Tables.events(s, dir).select(col("event_type"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("value")),
        "event_type", Seq("ts_us", "event_id"), "value")),

    /** Per-group OLS regression (extension; [[graft.operators.Analytics
      * .groupedOls]]): slope/intercept/r² of price-cents on quantity per
      * supplier from five EXACT BIGINT sums (order-independent, map-side
      * combined), then one double expression per group.
      */
    "q137_grouped_ols" -> ((s, dir) =>
      Analytics.groupedOls(
        li(s, dir).select(col("l_suppkey"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y")),
        "l_suppkey", "x", "y")),

    /** Linear-interpolation resampling (extension; [[graft.operators
      * .Resample.linear]]): the q108 grid with interior gaps on the
      * straight line between surrounding observations — both window
      * directions on ONE shuffle/sort; leading gap NULL, trailing gap
      * carry-forward.
      */
    "q138_resample_linear" -> ((s, dir) =>
      Resample.linear(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("value")),
        "user_id", "ts_us", "value", "event_id")),

    /** Top-k opening journeys (extension; [[graft.operators.Analytics
      * .topPaths]]): each user's first 3 event types as an `a>b>c` path,
      * counted corpus-wide — sorted in-row fold (no window sort), top-k as
      * TakeOrderedAndProject.
      */
    "q149_session_paths" -> ((s, dir) =>
      Analytics.topPaths(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("event_type")),
        "user_id", Seq("ts_us", "event_id"), "event_type", firstN = 3, k = 20)),

    /** Equi-width histogram profile (extension): per-flag price histogram
      * with EXPLICIT literal bucket arithmetic (`floor((x−lo)/w)` with an
      * exact-in-binary width) instead of an engine-specific width_bucket —
      * the identical IEEE expression runs on both engines, and the whole
      * profile is one map-side-combinable aggregate.
      */
    "q151_histogram" -> ((s, dir) =>
      li(s, dir).select(col("l_returnflag"),
          least(greatest(floor((col("l_extendedprice") - 900.0) / 5205.0),
            lit(0.0)), lit(19.0)).cast("long").as("bucket"),
          col("l_extendedprice"))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"))),

    /** Calendar spine + coverage (extension): `sequence()`-generated day
      * spine LEFT-joined to per-day order counts, so ZERO-order days
      * surface — the gap-visible time series every reporting mart needs
      * (the reference's dashboards implicitly assume it).
      */
    "q158_date_spine" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """WITH bounds AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
          |                       CAST(max(o_orderdate) AS DATE) AS hi
          |                FROM orders),
          |spine AS (SELECT explode(sequence(lo, hi, interval 1 day)) AS d
          |          FROM bounds),
          |per AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
          |        FROM orders GROUP BY 1)
          |SELECT spine.d, coalesce(per.n, 0L) AS n_orders
          |FROM spine LEFT JOIN per ON spine.d = per.d""".stripMargin)
    }),

    /** Peak interval concurrency (extension; [[graft.operators.Analytics
      * .peakConcurrency]]): sweep-line max-overlap of per-user 30-minute
      * activity windows — +1/−1 boundary explode, ONE key-partitioned
      * running-sum window, half-open tie rule pinned for replay.
      */
    "q162_peak_concurrency" -> ((s, dir) =>
      Analytics.peakConcurrency(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("s_us"),
          (expr("unix_micros(ts)") + 1800000000L).as("e_us")),
        "user_id", "s_us", "e_us")),

    /** Linear multi-touch attribution (extension; [[graft.streaming
      * .Attribution.linearTouchBatch]]): every in-window view splits the
      * purchase's credit 1/n — the fairness counterpoint to last-touch
      * (q73), same interval-join pair frame.
      */
    "q163_linear_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def typed(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))
      graft.streaming.Attribution.linearTouchBatch(
        typed("view"), typed("purchase"), windowUs = 24L * 3600 * 1000000)
    }),

    /** Pearson χ² independence test (extension; [[graft.operators.Analytics
      * .chiSquare]]): return-flag vs line-status contingency — one
      * aggregate + broadcast margins, exact-integer-derived doubles.
      */
    "q166_chi_square" -> ((s, dir) =>
      Analytics.chiSquare(li(s, dir), "l_returnflag", "l_linestatus")),

    /** Per-source KL divergence from the corpus unigram distribution
      * (extension; [[graft.operators.Analytics.klDivergence]]): the
      * data-mix drift monitor; pooled-corpus Q makes smoothing unnecessary.
      */
    "q167_kl_divergence" -> ((s, dir) =>
      Analytics.klDivergence(
        docs(s, dir).select(col("source"),
          explode(split(col("text"), " ")).as("token")),
        "source", "token")),

    /** Native session windows (extension; Spark `session_window` in batch):
      * per-user 30-minute-gap sessions as ONE groupBy on the merging
      * window — the declarative twin of the custom sessionizer (q35); the
      * oracle replays gap-islands SQL with the operator's ≥-gap boundary
      * rule.
      */
    "q169_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("user_id"), expr("unix_micros(w.start)").as("start_us"),
          expr("unix_micros(w.end)").as("end_us"), col("n_events"),
          col("sum_value"))),

    /** Frame-navigation window surface (extension): first_value /
      * last_value / nth_value under EXPLICIT full-partition ROWS frames
      * (the default frame truncates last/nth at CURRENT ROW — the classic
      * silent-wrong-answer; spelling the frame is the point) plus a
      * defaulted lag(2). Pure value navigation — no arithmetic, so
      * doubles copy bit-exactly between engines.
      */
    "q176_frame_navigation" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      ev.select(col("user_id"), col("ts_us"), col("event_id"),
        first(col("value")).over(w).as("first_v"),
        last(col("value")).over(full).as("last_v"),
        nth_value(col("value"), 3).over(full).as("third_v"),
        lag(col("value"), 2, -1.0).over(w).as("lag2_v"))
    }),

    /** Calendar arithmetic surface (extension; beside the q158 spine):
      * epoch-day offsets, year/quarter/month/day-of-week parts, days to
      * month end, and month addition — each emitted as an INTEGER (epoch
      * days from a fixed anchor), never a raw date, so tz/rendering can't
      * drift the hash. Both engines clamp month-end addition (Jan 31 + 1
      * month = Feb 28), which the oracle replays directly.
      */
    "q178_date_arith" -> ((s, dir) =>
      orders(s, dir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
        .select(col("o_orderkey"),
          datediff(col("d"), lit("1992-01-01").cast("date"))
            .cast("long").as("epoch_day"),
          year(col("d")).cast("long").as("y"),
          quarter(col("d")).cast("long").as("q"),
          month(col("d")).cast("long").as("m"),
          dayofweek(col("d")).cast("long").as("dow"),
          datediff(last_day(col("d")), col("d")).cast("long").as("days_to_eom"),
          datediff(add_months(col("d"), 2), lit("1992-01-01").cast("date"))
            .cast("long").as("plus2m_day"))),

    /** Zipf-law fit per source (extension; [[graft.operators.Analytics
      * .zipfSlope]] — a one-number corpus-quality fingerprint: natural text
      * slopes near −1, templated/generated strata drift flatter or
      * steeper; the drift monitor beside q67's likelihood-ratio form):
      * log-log OLS over each source's top-200 token frequencies. The
      * census map-side-combines and the rank cut is WindowGroupLimit, so
      * the regression reads ≤ 200 rows per stratum at ANY corpus size;
      * the four OLS sums fold over the rank-sorted array in pinned order.
      */
    "q229_zipf_slope" -> ((s, dir) =>
      Analytics.zipfSlope(QueryShared.docs(s, dir), "source", "text",
        topN = 200))
  )

  val oracleSql: Map[String, String] = Map(

    "q35_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us, value FROM events),
        |w AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS isnew FROM w),
        |si AS (SELECT *, CAST(sum(isnew) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us, sum(value) AS sum_value
        |FROM si GROUP BY 1, 2""".stripMargin,

    "q51_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 7))::BIGINT AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |        row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |      FROM h),
        |k AS (SELECT l_returnflag, count(*) AS m, max(h) AS hk
        |      FROM r WHERE rn <= 256 GROUP BY 1),
        |e AS (SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_exact
        |      FROM lineitem GROUP BY 1)
        |SELECT k.l_returnflag,
        |  CASE WHEN m < 256 THEN CAST(m AS DOUBLE)
        |       ELSE 68451041280.0 / CAST(hk AS DOUBLE) END AS distinct_est,
        |  e.distinct_exact
        |FROM k JOIN e USING (l_returnflag)""".stripMargin,

    "q54_token_percentiles" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(regexp_extract_all(text,
         |      '${graft.functions.TextFunctions.BpeTokenPattern}')) AS BIGINT) AS n_tok
         |  FROM documents),
         |r AS (
         |  SELECT lang, n_tok, doc_id,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM t)
         |SELECT lang, CAST(max(n) AS BIGINT) AS n_rows,
         |  max(CASE WHEN rn <= (n * 1 + 1) // 2 THEN n_tok END) AS p50_tok,
         |  max(CASE WHEN rn <= (n * 9 + 9) // 10 THEN n_tok END) AS p90_tok,
         |  max(CASE WHEN rn <= (n * 99 + 99) // 100 THEN n_tok END) AS p99_tok
         |FROM r GROUP BY 1""".stripMargin,

    "q63_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
        |       CAST(cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS row_share,
        |       CAST(cnt AS DOUBLE) * CAST(t.n_keys AS DOUBLE) / CAST(t.total AS DOUBLE) AS skew_factor
        |FROM c, t
        |ORDER BY cnt DESC, user_id
        |LIMIT 25""".stripMargin,

    "q71_range_join" ->
      """SELECT i.iv_id, p.l_orderkey, CAST(p.l_linenumber AS BIGINT) AS l_linenumber, p.pt
        |FROM (SELECT l_orderkey, l_linenumber,
        |             l_orderkey * 3 + l_linenumber * 7 AS pt
        |      FROM lineitem) p
        |JOIN (SELECT o_orderkey AS iv_id, o_orderkey * 3 AS lo, o_orderkey * 3 + 400 AS hi
        |      FROM orders WHERE o_orderkey % 200 = 0) i
        |  ON p.pt BETWEEN i.lo AND i.hi""".stripMargin,

    "q198_funnel_negation" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  epoch_us(ts::TIMESTAMP) AS t
        |           FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase', 'error')),
        |ch AS (
        |  SELECT v.user_id, p.t AS t3
        |  FROM e v
        |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
        |          AND (c.t > v.t OR (c.t = v.t AND c.event_id > v.event_id))
        |  JOIN e p ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |          AND (p.t > c.t OR (p.t = c.t AND p.event_id > c.event_id))
        |  WHERE v.event_type = 'view' AND p.t - v.t <= 86400000000
        |    AND NOT EXISTS (
        |      SELECT 1 FROM e b
        |      WHERE b.user_id = v.user_id AND b.event_type = 'error'
        |        AND (b.t > v.t OR (b.t = v.t AND b.event_id > v.event_id))
        |        AND (b.t < p.t OR (b.t = p.t AND b.event_id < p.event_id)))),
        |m AS (SELECT user_id, min(t3) AS first_completion FROM ch GROUP BY 1),
        |k AS (SELECT DISTINCT user_id FROM e)
        |SELECT k.user_id, m.first_completion IS NOT NULL AS converted,
        |       m.first_completion
        |FROM k LEFT JOIN m USING (user_id)""".stripMargin,

    "q195_funnel_match" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  epoch_us(ts::TIMESTAMP) AS t
        |           FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |ch AS (
        |  SELECT v.user_id, p.t AS t3
        |  FROM e v
        |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
        |          AND (c.t > v.t OR (c.t = v.t AND c.event_id > v.event_id))
        |  JOIN e p ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |          AND (p.t > c.t OR (p.t = c.t AND p.event_id > c.event_id))
        |  WHERE v.event_type = 'view' AND p.t - v.t <= 86400000000),
        |m AS (SELECT user_id, min(t3) AS first_completion FROM ch GROUP BY 1),
        |k AS (SELECT DISTINCT user_id FROM e)
        |SELECT k.user_id, m.first_completion IS NOT NULL AS converted,
        |       m.first_completion
        |FROM k LEFT JOIN m USING (user_id)""".stripMargin,

    "q193_unattributed" ->
      """WITH v AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS view_us
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id,
        |             epoch_us(ts::TIMESTAMP) AS purchase_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.purchase_us
        |FROM p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM v
        |  WHERE v.user_id = p.user_id
        |    AND p.purchase_us > v.view_us
        |    AND p.purchase_us - v.view_us <= 7200000000)""".stripMargin,

    "q73_attribution" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts::TIMESTAMP) AS view_us
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts::TIMESTAMP) AS purchase_us
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.purchase_id, p.user_id, p.purchase_us, v.view_id,
        |             p.purchase_us - v.view_us AS delay_us,
        |             row_number() OVER (PARTITION BY p.purchase_id
        |               ORDER BY p.purchase_us - v.view_us ASC, v.view_id DESC) AS rn
        |      FROM p JOIN v ON v.user_id = p.user_id
        |        AND p.purchase_us > v.view_us
        |        AND p.purchase_us - v.view_us <= 86400000000)
        |SELECT purchase_id, user_id, purchase_us, view_id, delay_us
        |FROM j WHERE rn = 1""".stripMargin,

    "q77_salted_join" ->
      """SELECT l.l_orderkey AS k, l.l_quantity, o.o_totalprice
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey""".stripMargin,

    "q78_time_window_sum" ->
      """SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |       sum(value) OVER w AS trailing_sum,
        |       CAST(count(*) OVER w AS BIGINT) AS trailing_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q80_topk_per_group" ->
      """SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id, value
        |FROM (SELECT user_id, event_id, value,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY value DESC, event_id DESC) AS rnk
        |      FROM events) t
        |WHERE rnk <= 3""".stripMargin,

    "q83_percentile_cont" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |       quantile_cont(l_extendedprice, 0.5) AS p50,
        |       quantile_cont(l_extendedprice, 0.9) AS p90
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q86_zscore_outliers" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
        |  FROM documents),
        |s AS (SELECT source, avg(n) AS mu, stddev_samp(n) AS sg FROM t GROUP BY 1)
        |SELECT t.doc_id, t.source, CAST(t.n AS BIGINT) AS n_tok,
        |       (t.n - s.mu) / s.sg AS z,
        |       abs((t.n - s.mu) / s.sg) > 2.0 AS is_outlier
        |FROM t JOIN s USING (source)""".stripMargin,

    "q89_mad_outliers" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
        |  FROM documents),
        |m AS (SELECT source, quantile_cont(n, 0.5) AS med FROM t GROUP BY 1),
        |d AS (SELECT t.doc_id, t.source, t.n, t.n - m.med AS dev
        |      FROM t JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(abs(dev), 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.doc_id, d.source, CAST(d.n AS BIGINT) AS n_tok,
        |       0.6745 * d.dev / md.mad AS robust_z,
        |       abs(0.6745 * d.dev / md.mad) > 3.5 AS is_outlier
        |FROM d JOIN md USING (source)""".stripMargin,

    "q90_hopping_window" ->
      """WITH e AS (SELECT epoch_us(ts::TIMESTAMP) AS us, value FROM events),
        |w AS (SELECT us, value,
        |        unnest([(us // 1800000000) * 1800000000,
        |                (us // 1800000000) * 1800000000 - 1800000000]) AS ws
        |      FROM e)
        |SELECT ws AS window_start_us, CAST(count(*) AS BIGINT) AS n_events,
        |       sum(value) AS sum_value
        |FROM w
        |WHERE us >= ws AND us < ws + 3600000000
        |GROUP BY 1""".stripMargin,

    "q94_count_min" -> countMinOracleSql,

    // the incremental grid provably equals the from-scratch sketch
    // (MaterializeSpec), so q95 replays the same full-corpus oracle,

    "q104_rolling_corr" ->
      """WITH base AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |         CAST(l_quantity AS BIGINT) AS x,
        |         l_partkey % 97 AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    count(*)   OVER w AS n,
        |    sum(x)     OVER w AS sx,  sum(y)   OVER w AS sy,
        |    sum(x*x)   OVER w AS sxx, sum(y*y) OVER w AS syy,
        |    sum(x*y)   OVER w AS sxy
        |  FROM base
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_orderkey, l_linenumber, x, y
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CASE WHEN sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |            sqrt(CAST(n*syy - sy*sy AS DOUBLE)) = 0 THEN NULL
        |       ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
        |            (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |             sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
        |  END AS roll_corr
        |FROM s""".stripMargin,

    "q106_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
        |FROM part""".stripMargin,

    "q108_resample_locf" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_id, value
        |  FROM events),
        |b AS (SELECT min(ts_us // 86400000000) AS b0,
        |             max(ts_us // 86400000000) AS b1 FROM ev),
        |grid AS (
        |  SELECT u.user_id, t.d AS bucket,
        |         (t.d + 1) * 86400000000 - 1 AS ts_us,
        |         1 AS is_grid, CAST(NULL AS DOUBLE) AS v,
        |         9223372036854775807 AS seq
        |  FROM (SELECT DISTINCT user_id FROM ev) u, b,
        |       unnest(range(b.b0, b.b1 + 1)) AS t(d)),
        |obs AS (
        |  SELECT user_id, CAST(NULL AS BIGINT) AS bucket, ts_us,
        |         0 AS is_grid, value AS v, event_id AS seq
        |  FROM ev),
        |f AS (
        |  SELECT user_id, bucket, is_grid,
        |         last_value(v IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts_us, is_grid, seq
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
        |  FROM (SELECT * FROM grid UNION ALL SELECT * FROM obs))
        |SELECT user_id, bucket, value_locf FROM f WHERE is_grid = 1""".stripMargin,

    "q109_cms_join_size" -> {
      val ps = graft.operators.TextDedup.hashParams(4)
      def rc(src: String): String = ps.zipWithIndex.map { case (p, i) =>
        s"SELECT $i AS row, (h * ${p.a} + ${p.b}) % 2147483647 % 1024 AS cell FROM $src"
      }.mkString("\n        |  UNION ALL\n        |  ".stripMargin)
      s"""WITH ha AS (SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 7))::BIGINT AS h FROM lineitem),
         |hb AS (SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))::BIGINT AS h FROM orders),
         |rca AS (
         |  ${rc("ha")}),
         |rcb AS (
         |  ${rc("hb")}),
         |ca AS (SELECT row, cell, count(*) AS cnt FROM rca GROUP BY 1, 2),
         |cb AS (SELECT row, cell, count(*) AS cnt FROM rcb GROUP BY 1, 2),
         |dots AS (
         |  SELECT d.row, coalesce(sum(ca.cnt * cb.cnt), 0) AS dot
         |  FROM (SELECT unnest(range(4)) AS row) d
         |  LEFT JOIN ca ON ca.row = d.row
         |  LEFT JOIN cb ON cb.row = ca.row AND cb.cell = ca.cell
         |  GROUP BY 1)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         |   JOIN orders o ON l.l_orderkey = o.o_orderkey) AS exact_size,
         |  CAST(min(dot) AS BIGINT) AS cms_join_size
         |FROM dots""".stripMargin
    },

    "q113_winsorized" ->
      """WITH r AS (
        |  SELECT l_suppkey AS g, CAST(l_quantity AS BIGINT) AS v,
        |         row_number() OVER (PARTITION BY l_suppkey ORDER BY l_quantity)
        |           AS rn,
        |         count(*) OVER (PARTITION BY l_suppkey) AS n
        |  FROM lineitem),
        |rr AS (
        |  SELECT *, (1 * n + 9) // 10 AS rlo, (9 * n + 9) // 10 AS rhi FROM r),
        |b AS (
        |  SELECT g,
        |         min(CASE WHEN rn = rlo THEN v END) AS lo,
        |         min(CASE WHEN rn = rhi THEN v END) AS hi
        |  FROM rr WHERE rn = rlo OR rn = rhi GROUP BY 1)
        |SELECT rr.g AS l_suppkey,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(b.lo) AS lo, min(b.hi) AS hi,
        |       CAST(sum(greatest(b.lo, least(b.hi, rr.v))) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS winsorized_mean
        |FROM rr JOIN b ON b.g = rr.g
        |GROUP BY 1""".stripMargin,

    "q121_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |             epoch_us(ts::TIMESTAMP) // 86400000000 AS day
        |           FROM events),
        |g AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d)
        |SELECT user_id, CAST(min(day) AS BIGINT) AS island_start,
        |       CAST(max(day) AS BIGINT) AS island_end,
        |       CAST(count(*) AS BIGINT) AS island_len
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "q124_hll_overlap" -> {
      val p = graft.operators.TextDedup.hashParams(1).head
      s"""WITH h AS (
         |  SELECT o_orderpriority AS g,
         |         (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 7))::BIGINT
         |            * ${p.a} + ${p.b}) % 2147483647 AS h
         |  FROM orders),
         |rr AS (SELECT g, h & 63 AS reg,
         |         CASE WHEN (h >> 6) = 0 THEN 26
         |              ELSE CAST(round(log2((h >> 6) & -(h >> 6))) AS INT) + 1
         |         END AS rho
         |       FROM h),
         |regs AS (SELECT g, reg, max(rho) AS max_rho FROM rr GROUP BY 1, 2),
         |e AS (SELECT g, CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |        / (sum(CAST(1 AS DOUBLE) / CAST(1 << max_rho AS DOUBLE))
         |           + CAST(64 - count(*) AS DOUBLE)) AS est
         |      FROM regs GROUP BY 1),
         |pairs AS (SELECT a.g AS g1, b.g AS g2
         |          FROM (SELECT DISTINCT g FROM regs) a
         |          JOIN (SELECT DISTINCT g FROM regs) b ON a.g < b.g),
         |ur AS (SELECT p.g1, p.g2, r.reg, r.max_rho
         |       FROM pairs p JOIN regs r ON r.g = p.g1
         |       UNION ALL
         |       SELECT p.g1, p.g2, r.reg, r.max_rho
         |       FROM pairs p JOIN regs r ON r.g = p.g2),
         |uregs AS (SELECT g1, g2, reg, max(max_rho) AS max_rho
         |          FROM ur GROUP BY 1, 2, 3),
         |ue AS (SELECT g1, g2, CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |         / (sum(CAST(1 AS DOUBLE) / CAST(1 << max_rho AS DOUBLE))
         |            + CAST(64 - count(*) AS DOUBLE)) AS est_union
         |       FROM uregs GROUP BY 1, 2),
         |d AS (SELECT DISTINCT o_orderpriority AS g, o_custkey AS c FROM orders),
         |ex AS (SELECT x.g AS g1, y.g AS g2, CAST(count(*) AS BIGINT) AS exact_inter
         |       FROM d x JOIN d y ON x.c = y.c AND x.g < y.g GROUP BY 1, 2)
         |SELECT ue.g1, ue.g2, e1.est AS est_g1, e2.est AS est_g2, ue.est_union,
         |       e1.est + e2.est - ue.est_union AS est_inter,
         |       COALESCE(ex.exact_inter, 0) AS exact_inter
         |FROM ue JOIN e e1 ON e1.g = ue.g1 JOIN e e2 ON e2.g = ue.g2
         |LEFT JOIN ex ON ex.g1 = ue.g1 AND ex.g2 = ue.g2""".stripMargin
    },

    "q133_cohort_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |                   epoch_us(ts::TIMESTAMP) // 86400000000 AS d
        |            FROM events),
        |f AS (SELECT u, min(d) AS d0 FROM ud GROUP BY 1),
        |act AS (SELECT DISTINCT f.d0 // 7 AS cohort_week,
        |               (ud.d - f.d0) // 7 AS period_week, ud.u
        |        FROM ud JOIN f USING (u)),
        |sz AS (SELECT d0 // 7 AS cohort_week,
        |              CAST(count(*) AS BIGINT) AS n_cohort
        |       FROM f GROUP BY 1)
        |SELECT a.cohort_week, a.period_week,
        |       CAST(count(*) AS BIGINT) AS n_active, sz.n_cohort,
        |       CAST(count(*) AS DOUBLE) / sz.n_cohort AS retention
        |FROM act a JOIN sz USING (cohort_week)
        |GROUP BY 1, 2, sz.n_cohort""".stripMargin,

    "q134_ewma" ->
      """WITH s AS (SELECT user_id,
        |                  list(value ORDER BY epoch_us(ts::TIMESTAMP), event_id)
        |                    AS vs
        |           FROM events GROUP BY 1)
        |SELECT user_id, CAST(len(vs) AS INT) AS n,
        |       list_reduce(vs, (acc, x) -> acc + 0.25 * (x - acc)) AS ewma
        |FROM s""".stripMargin,

    "q260_cusum_changepoint" ->
      """WITH e AS (SELECT event_type, epoch_us(ts::TIMESTAMP) AS ts_us,
        |                  event_id, value
        |           FROM events),
        |base AS (SELECT *,
        |           avg(value) OVER (PARTITION BY event_type) AS m,
        |           stddev_samp(value) OVER (PARTITION BY event_type) AS sd,
        |           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |         FROM e),
        |run AS (SELECT *,
        |          row_number() OVER (PARTITION BY event_type
        |            ORDER BY ts_us, event_id) AS i,
        |          sum(value - m) OVER (PARTITION BY event_type
        |            ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |        FROM base),
        |pk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |         ORDER BY abs(s) DESC, i ASC) AS rn FROM run),
        |res AS (SELECT event_type, n AS n_obs,
        |          round(m, 6) AS mean_value, round(sd, 6) AS stddev_value,
        |          CASE WHEN n >= 2 AND sd > 0 THEN
        |            round(abs(s) / (sd * sqrt(CAST(n AS DOUBLE))), 6)
        |          END AS cusum_stat,
        |          CAST(i AS BIGINT) AS cp_index
        |        FROM pk WHERE rn = 1)
        |SELECT *, coalesce(cusum_stat > 1.358, false) AS flagged
        |FROM res""".stripMargin,

    "q137_grouped_ols" ->
      """WITH t AS (SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS x,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |           FROM lineitem),
        |g AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * y) AS BIGINT) AS sxy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(y * y) AS BIGINT) AS syy
        |      FROM t GROUP BY 1),
        |d AS (SELECT l_suppkey, n,
        |             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |             CAST(sy AS DOUBLE) AS syd,
        |             CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv,
        |             CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |             CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
        |               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
        |      FROM g)
        |SELECT l_suppkey, n,
        |       CASE WHEN vx <> 0 THEN cv / vx END AS slope,
        |       CASE WHEN vx <> 0 THEN (syd - (cv / vx) * sxd) / nd END
        |         AS intercept,
        |       CASE WHEN vx <> 0 AND vy <> 0 THEN (cv * cv) / (vx * vy) END
        |         AS r2
        |FROM d""".stripMargin,

    "q138_resample_linear" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_id, value
        |  FROM events),
        |b AS (SELECT min(ts_us // 86400000000) AS b0,
        |             max(ts_us // 86400000000) AS b1 FROM ev),
        |grid AS (
        |  SELECT u.user_id, t.d AS bucket,
        |         (t.d + 1) * 86400000000 - 1 AS ts_us,
        |         1 AS is_grid, CAST(NULL AS DOUBLE) AS v,
        |         CAST(NULL AS BIGINT) AS ots,
        |         9223372036854775807 AS seq
        |  FROM (SELECT DISTINCT user_id FROM ev) u, b,
        |       unnest(range(b.b0, b.b1 + 1)) AS t(d)),
        |obs AS (
        |  SELECT user_id, CAST(NULL AS BIGINT) AS bucket, ts_us,
        |         0 AS is_grid, value AS v, ts_us AS ots, event_id AS seq
        |  FROM ev),
        |f AS (
        |  SELECT user_id, bucket, ts_us, is_grid,
        |         last_value(v IGNORE NULLS) OVER w1 AS pv,
        |         last_value(ots IGNORE NULLS) OVER w1 AS pt,
        |         first_value(v IGNORE NULLS) OVER w2 AS nv,
        |         first_value(ots IGNORE NULLS) OVER w2 AS nt
        |  FROM (SELECT * FROM grid UNION ALL SELECT * FROM obs)
        |  WINDOW w1 AS (PARTITION BY user_id ORDER BY ts_us, is_grid, seq
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         w2 AS (PARTITION BY user_id ORDER BY ts_us, is_grid, seq
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, bucket,
        |       CASE WHEN pv IS NULL THEN CAST(NULL AS DOUBLE)
        |            WHEN nv IS NULL THEN pv
        |            ELSE pv + (nv - pv) * CAST(ts_us - pt AS DOUBLE)
        |                   / CAST(nt - pt AS DOUBLE) END AS value_interp
        |FROM f WHERE is_grid = 1""".stripMargin,

    "q149_session_paths" ->
      """WITH s AS (SELECT user_id,
        |                  list(event_type ORDER BY epoch_us(ts::TIMESTAMP),
        |                       event_id) AS ets
        |           FROM events GROUP BY 1),
        |p AS (SELECT array_to_string(ets[1:3], '>') AS path FROM s)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY 1
        |ORDER BY n DESC, path
        |LIMIT 20""".stripMargin,

    "q151_histogram" ->
      """SELECT l_returnflag,
        |       CAST(least(greatest(
        |         floor((l_extendedprice - 900.0) / 5205.0), 0.0), 19.0)
        |         AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,

    "q158_date_spine" ->
      """WITH bounds AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
        |                       CAST(max(o_orderdate) AS DATE) AS hi
        |                FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(lo::TIMESTAMP,
        |                 hi::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS d
        |          FROM bounds),
        |per AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |               CAST(count(*) AS BIGINT) AS n
        |        FROM orders GROUP BY 1)
        |SELECT spine.d, CAST(coalesce(per.n, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN per ON spine.d = per.d""".stripMargin,

    "q162_peak_concurrency" ->
      """WITH i AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS s_us,
        |                  epoch_us(ts::TIMESTAMP) + 1800000000 AS e_us
        |           FROM events),
        |b AS (SELECT user_id, s_us AS t, CAST(1 AS BIGINT) AS delta FROM i
        |      UNION ALL
        |      SELECT user_id, e_us AS t, CAST(-1 AS BIGINT) AS delta FROM i),
        |r AS (SELECT user_id,
        |             sum(delta) OVER (PARTITION BY user_id
        |               ORDER BY t, delta) AS open
        |      FROM b)
        |SELECT user_id, CAST(max(open) AS BIGINT) AS peak,
        |       CAST(count(*) // 2 AS BIGINT) AS n_intervals
        |FROM r GROUP BY 1""".stripMargin,

    "q163_linear_attribution" ->
      """WITH v AS (SELECT event_id AS view_id, user_id,
        |                  epoch_us(ts::TIMESTAMP) AS view_us
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id,
        |             epoch_us(ts::TIMESTAMP) AS purchase_us
        |      FROM events WHERE event_type = 'purchase'),
        |pr AS (SELECT p.purchase_id, p.user_id, v.view_id
        |       FROM p JOIN v USING (user_id)
        |       WHERE p.purchase_us > v.view_us
        |         AND p.purchase_us - v.view_us <= 86400000000),
        |n AS (SELECT pr.*, CAST(count(*) OVER (PARTITION BY purchase_id)
        |               AS BIGINT) AS n
        |      FROM pr)
        |SELECT view_id, user_id, sum(CAST(1.0 AS DOUBLE) / n) AS credit,
        |       CAST(count(*) AS BIGINT) AS n_purchases
        |FROM n GROUP BY 1, 2""".stripMargin,

    "q166_chi_square" ->
      """WITH obs AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |                    CAST(count(*) AS BIGINT) AS n
        |             FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM obs GROUP BY 1),
        |ct AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM obs GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs),
        |grid AS (SELECT rt.a, ct.b, rt.ra, ct.cb,
        |                coalesce(obs.n, 0) AS o
        |         FROM rt CROSS JOIN ct
        |         LEFT JOIN obs ON obs.a = rt.a AND obs.b = ct.b),
        |e AS (SELECT o, CAST(ra * cb AS DOUBLE) / tt.t AS e, a, b
        |      FROM grid CROSS JOIN tt)
        |SELECT sum((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e)
        |         AS chi2,
        |       CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1)
        |         AS BIGINT) AS dof,
        |       CAST(sum(o) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_cells
        |FROM e""".stripMargin,

    "q167_kl_divergence" ->
      """WITH gc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
        |            FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |                  FROM documents)
        |            GROUP BY 1, 2),
        |gt AS (SELECT source, CAST(sum(n) AS BIGINT) AS ng FROM gc GROUP BY 1),
        |ct AS (SELECT token, CAST(sum(n) AS BIGINT) AS nt FROM gc GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM gc),
        |trm AS (SELECT gc.source,
        |             CAST(gc.n AS DOUBLE) / gt.ng AS p,
        |             CAST(ct.nt AS DOUBLE) / tt.t AS q,
        |             gt.ng
        |      FROM gc JOIN gt USING (source) JOIN ct USING (token)
        |      CROSS JOIN tt)
        |SELECT source, sum(p * ln(p / q)) AS kl_nats,
        |       CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |       CAST(max(ng) AS BIGINT) AS n_tokens
        |FROM trm GROUP BY 1""".stripMargin,

    "q169_session_window" ->
      """WITH t AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value
        |           FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                     OR ts_us - lag(ts_us) OVER w >= 1800000000
        |                     THEN 1 ELSE 0 END AS brk
        |      FROM t
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS sid
        |      FROM m)
        |SELECT user_id, min(ts_us) AS start_us,
        |       max(ts_us) + 1800000000 AS end_us,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       sum(value) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q176_frame_navigation" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |                   event_id, value
        |            FROM events)
        |SELECT user_id, ts_us, event_id,
        |       first_value(value) OVER w AS first_v,
        |       last_value(value) OVER wf AS last_v,
        |       nth_value(value, 3) OVER wf AS third_v,
        |       coalesce(lag(value, 2) OVER w, -1.0) AS lag2_v
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING
        |                       AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q178_date_arith" ->
      """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |           FROM orders)
        |SELECT o_orderkey,
        |       CAST(date_diff('day', DATE '1992-01-01', d) AS BIGINT)
        |         AS epoch_day,
        |       CAST(year(d) AS BIGINT) AS y,
        |       CAST(quarter(d) AS BIGINT) AS q,
        |       CAST(month(d) AS BIGINT) AS m,
        |       CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        |       CAST(date_diff('day', d, last_day(d)) AS BIGINT)
        |         AS days_to_eom,
        |       CAST(date_diff('day', DATE '1992-01-01',
        |                      CAST(d + INTERVAL 2 MONTH AS DATE)) AS BIGINT)
        |         AS plus2m_day
        |FROM t""".stripMargin,

    // census → per-source top-200 ranks → the same four pinned-order OLS
    // folds (list_reduce starts at the first element; the engine's fold
    // starts at 0.0 — 0.0 + x is bitwise x, so partial sums agree)
    "q229_zipf_slope" ->
      """WITH census AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  WHERE len(tok) > 0 GROUP BY 1, 2),
        |ranked AS (SELECT * FROM (
        |    SELECT source, tok, cnt, row_number() OVER (PARTITION BY source
        |      ORDER BY cnt DESC, tok ASC) AS rank FROM census)
        |  WHERE rank <= 200),
        |g AS (SELECT source,
        |        list(struct_pack(r := rank, c := cnt) ORDER BY rank) AS l
        |      FROM ranked GROUP BY 1),
        |f AS (SELECT source,
        |    CAST(len(l) AS BIGINT) AS n_tokens_used,
        |    list_reduce(list_transform(l, s ->
        |      ln(CAST(s.r AS DOUBLE))), (a, b) -> a + b) AS sx,
        |    list_reduce(list_transform(l, s ->
        |      ln(CAST(s.c AS DOUBLE))), (a, b) -> a + b) AS sy,
        |    list_reduce(list_transform(l, s ->
        |      ln(CAST(s.r AS DOUBLE)) * ln(CAST(s.r AS DOUBLE))),
        |      (a, b) -> a + b) AS sxx,
        |    list_reduce(list_transform(l, s ->
        |      ln(CAST(s.r AS DOUBLE)) * ln(CAST(s.c AS DOUBLE))),
        |      (a, b) -> a + b) AS sxy
        |  FROM g)
        |SELECT source, n_tokens_used,
        |  round((n_tokens_used * sxy - sx * sy)
        |        / (n_tokens_used * sxx - sx * sx), 6) AS zipf_slope
        |FROM f""".stripMargin
  )
}
