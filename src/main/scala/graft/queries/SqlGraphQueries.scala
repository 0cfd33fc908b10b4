package graft.queries

import graft.functions.{GapParser, TextFunctions, VectorFunctions}
import graft.operators._
import graft.pipeline.{F1Staging, F1Synthetic}
import graft.sources.{BloomStore, Bucketed, Tables, TxLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryShared._

/** SQL-surface parity + graph algorithms: grouping sets/rollup/cube, set ops, subqueries, LISTAGG, VARIANT, recursive CTEs, PageRank, triangles, label propagation, k-core, BFS.
  *
  * Split from the original single-file registry; each entry keeps its
  * Scaladoc mapping to SURVEY.md §2 / the reference files. The driver
  * surface remains [[graft.SparkEntry.queries]]/[[graft.SparkEntry.oracleSql]],
  * which merge the per-family maps.
  */
private[graft] object SqlGraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** ROLLUP hierarchy aggregate (extension; classic OLAP subtotals):
      * per-(flag, status) leaves + per-flag subtotals + grand total in ONE
      * pass — Spark expands grouping sets before the hash aggregate, so the
      * shuffle carries each partial ONCE per grouping set, not a re-scan per
      * level. `grouping_id` disambiguates subtotal rows from genuine NULL
      * keys (identical bitmask semantics in Spark and the oracle).
      */
    "q75_rollup" -> ((s, dir) =>
      li(s, dir).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n_rows"), col("sum_qty"))),

    /** Pivot/reshape (extension): per-user event-type counts widened to one
      * column per type — Spark's `pivot` with an EXPLICIT value list (the
      * implicit form adds a driver-side distinct pass to discover values;
      * at scale the vocabulary is declared, not discovered). Absent
      * (user, type) combos are NULL on both engines (`sum(CASE…)` over no
      * rows), keeping the hash compare honest.
      */
    "q76_pivot" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("user_id"), col("click").as("n_click"),
          col("error").as("n_error"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("view").as("n_view"))),

    /** CUBE aggregate (extension; completes the grouping-sets family with
      * q75's ROLLUP): all four aggregation levels of (flag, status) in one
      * pass, subtotal rows disambiguated from genuine NULLs by the same
      * grouping_id bitmask contract as q75.
      */
    "q88_cube" -> ((s, dir) =>
      li(s, dir).cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          avg(col("l_discount")).as("avg_disc"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n_rows"), col("avg_disc"))),

    /** Bucketed co-located fact⋈fact join (extension; [[graft.sources
      * .Bucketed]]): orders and lineitem written bucketed by the join key,
      * then sort-merge joined with ZERO exchanges — the one-shuffle-
      * amortized-forever layout a 100 TB warehouse keeps its big joins on.
      * The no-Exchange and bucket-pruning claims are plan-asserted in
      * PlanShapeSpec; here the oracle checks the joined aggregate.
      */
    "q122_bucketed_join" -> ((s, dir) => {
      // the bucketed tables are the DURABLE LAYOUT this query demonstrates
      // (one write-time shuffle amortized across every later join) — built
      // once per JVM through the standard fixture memo, like every other
      // persisted-store query (SCD2, AnnStore, LangIdStore...). Bench
      // reports the build separately as `build_s`; the declared, timed
      // query is the exchange-free co-located read join. Builds are pure
      // functions of (dir), so results are byte-identical either way.
      // table names carry the data-dir fingerprint so the per-(name, dir)
      // fixture memo can never serve tables built from a DIFFERENT dir to
      // a JVM that revisits an earlier one (suites share the JVM)
      val sfx = java.lang.Integer.toHexString(dir.hashCode)
      fixture("bucketed122", dir) { _ =>
        Bucketed.writeBucketed(orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
          s"graft_b_orders_$sfx", 8, Seq("o_orderkey"))
        Bucketed.writeBucketed(li(s, dir)
          .select(col("l_orderkey"), col("l_quantity")),
          s"graft_b_lineitem_$sfx", 8, Seq("l_orderkey"))
      }
      Bucketed.colocatedJoin(s, s"graft_b_orders_$sfx", s"graft_b_lineitem_$sfx",
          "o_orderkey", "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),

    /** Set operators (extension — A-family surface): INTERSECT / EXCEPT
      * with their ANSI DISTINCT semantics (Spark plans both as hash
      * semi/anti joins — no sort, partial-agg'd dedup), classifying
      * customers by presence in the urgent vs low priority order classes.
      */
    "q128_set_ops" -> ((s, dir) => {
      val o = orders(s, dir)
      def keys(p: String) =
        o.filter(col("o_orderpriority") === p).select(col("o_custkey"))
      val urgent = keys("1-URGENT"); val low = keys("5-LOW")
      urgent.intersect(low).withColumn("cls", lit("both"))
        .unionByName(urgent.except(low).withColumn("cls", lit("urgent_only")))
        .unionByName(low.except(urgent).withColumn("cls", lit("low_only")))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_customers"), sum("o_custkey").as("key_sum"))
    }),

    /** PageRank power iteration (extension; [[graft.operators.PageRank]] —
      * the iterative-analytics complement to q48's connected components):
      * three rounds over the undirected supplier↔part incidence graph,
      * per-round ONE contribution join + ONE destination sum. The oracle
      * replays all three rounds as chained CTEs.
      */
    "q130_pagerank" -> ((s, dir) =>
      PageRank.pageRank(
        li(s, dir).select((col("l_suppkey") + 1000000L).as("src"),
          col("l_partkey").as("dst")),
        "src", "dst", rounds = 3)),

    /** Triangle counting (extension; [[graft.operators.Triangles]]): degree-
      * ordered orientation bounds the wedge join at m^(3/2) regardless of
      * skew; no global rank window, degrees ride the edges. Graph = lineitem
      * order/part keys folded into a node space that GROWS WITH THE DATA —
      * `max(9973, 2·⌊rows/120⌋+1)`, holding average degree ≈60 at every
      * scale (9973 up to sf0.01's gate, ~10k at sf0.1, ~100k at 10×). A
      * FIXED fold saturates into a near-clique as the corpus grows (the
      * round-6 sf1 sweep measured exactly that: 139 s + 44 GB spill at 10×
      * against the old constant — degree ×10 ⇒ wedges ×100), turning the
      * wedge join into a clique enumeration that measures the data's
      * degeneracy, not the plan; a real corpus's node count grows with its
      * rows, which is what the formula models. The row count folds to a
      * DRIVER-SIDE LITERAL (one bounded metadata count, the same
      * accounting as the IVF centroid reads) rather than riding a
      * crossJoin column: a column-valued modulus blinds Catalyst's size
      * estimation and demoted the tiny degree joins from broadcast to
      * sort-merge (measured: 24.8 → 239 MB shuffle at identical data).
      * The oracle replays the identical arithmetic from its own count.
      */
    "q135_triangles" -> ((s, dir) => {
      val rows = li(s, dir).count()
      val m = math.max(9973L, rows / 120 * 2 + 1)
      Triangles.triangleCount(
        li(s, dir).select((col("l_orderkey") % m).as("src"),
          (col("l_partkey") % m).as("dst")),
        "src", "dst")
    }),

    /** NOT IN with a correlated-free subquery (extension): ANSI null-aware
      * anti-join semantics — Spark plans this as a null-aware anti join
      * (guarded in PlanShapeSpec), NOT a plain left-anti, because one NULL
      * in the subquery must empty the result. SQL surface parity with the
      * reference's warehouse dialect.
      */
    "q142_not_in" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders
          |WHERE o_custkey NOT IN
          |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          |GROUP BY o_orderpriority""".stripMargin)
    }),

    /** Ordered string aggregation / LISTAGG (extension): each order's line
      * numbers reassembled as a comma-joined sorted string — the
      * `collect_list → array_sort → array_join` composition that replaces
      * LISTAGG/string_agg portably and deterministically (sort pinned
      * inside the row, not by shuffle arrival order).
      */
    "q143_listagg" -> ((s, dir) =>
      li(s, dir).groupBy(col("l_orderkey"))
        .agg(expr("array_join(transform(array_sort(collect_list(l_linenumber))," +
          " x -> cast(x as string)), ',')").as("lines"),
          count(lit(1)).as("n"))),

    /** GROUPING SETS (extension; SQL surface beside ROLLUP q75 / CUBE q88):
      * an EXPLICIT set list — leaves, one subtotal level, grand total —
      * expanded before ONE hash aggregate; `grouping_id` disambiguates
      * subtotal rows from genuine NULL keys with identical bitmask
      * semantics on both engines.
      */
    "q144_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
          |       count(*) AS n_rows, sum(l_quantity) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_returnflag), ())""".stripMargin)
    }),

    /** Market-basket association rules (extension; [[graft.operators
      * .Association.pairRules]]): frequent item pairs per order with
      * support/confidence/lift — apriori-pruned BEFORE the basket self-join
      * so fan-out is bounded by frequent items and per-basket pair count,
      * never the item domain. Items = part keys folded to a dense space.
      */
    "q145_assoc_rules" -> ((s, dir) =>
      Association.pairRules(
        li(s, dir).select(col("l_orderkey"), (col("l_partkey") % 50).as("item")),
        "l_orderkey", "item", minCount = 50)),

    /** Label-propagation communities (extension; [[graft.operators
      * .LabelProp]]): 3 synchronous neighbor-majority rounds on the
      * order/part bipartite fold — the density-community counterpart of the
      * HashMin reachability components (q48), one vote join + one windowed
      * argmax per round. The oracle replays all 3 rounds as chained CTEs.
      */
    "q146_label_prop" -> ((s, dir) =>
      LabelProp.propagate(
        li(s, dir).select((col("l_orderkey") % 997).as("src"),
          (lit(1000) + col("l_partkey") % 499).as("dst")),
        "src", "dst", rounds = 3)),

    /** First-order Markov transition matrix (extension; [[graft.operators
      * .Analytics.transitionMatrix]]): P(next event type | current) per the
      * user journey — ONE lag window on the user partition, map-side-combined
      * transition counts, broadcast row-normalization.
      */
    "q147_markov" -> ((s, dir) =>
      Analytics.transitionMatrix(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"), col("event_type")),
        "user_id", Seq("ts_us", "event_id"), "event_type")),

    /** k-core peel (extension; [[graft.operators.KCore]]): 3 peeling rounds
      * at threshold 50 on the order/part fold — per round one map-side-
      * combined degree aggregate + two semi-joins. The dense-backbone audit
      * beside PageRank (q130) / LPA (q146) / components (q48).
      */
    "q150_k_core" -> ((s, dir) =>
      KCore.peel(
        li(s, dir).select((col("l_orderkey") % 997).as("src"),
          (lit(1000) + col("l_partkey") % 499).as("dst")),
        "src", "dst", k = 50, rounds = 3)),

    /** Bounded BFS levels (extension; [[graft.operators.Bfs]]): hop
      * distance ≤2 from node 0 on the order/part fold — per round the
      * FRONTIER only joins the adjacency, new nodes anti-join out the
      * settled set. The n-hop-neighborhood primitive.
      */
    "q154_bfs_levels" -> ((s, dir) => {
      val edges = li(s, dir).select((col("l_orderkey") % 997).as("src"),
        (lit(1000) + col("l_partkey") % 499).as("dst"))
      Bfs.levels(edges, "src", "dst",
        edges.select(col("src").as("n")).filter(col("n") === 0).distinct(),
        "n", maxHops = 2)
    }),

    /** Correlated EXISTS (extension; SQL surface beside NOT IN q142 and the
      * anti-join q12): planned as a LEFT SEMI join — the subquery never
      * materializes per row.
      */
    "q156_exists" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_quantity > 45)
          |GROUP BY o_orderpriority""".stripMargin)
    }),

    /** Scalar subquery in a predicate (extension): the inner aggregate runs
      * ONCE and broadcasts as a literal into the outer scan's filter —
      * never a per-row re-execution.
      */
    "q157_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
          |GROUP BY o_orderpriority""".stripMargin)
    }),

    /** VARIANT semi-structured type (extension; Spark 4 surface): props
      * JSON parsed ONCE into the binary variant encoding, then typed path
      * extraction — present paths as INT, absent paths as NULL — the
      * schema-on-read column the modern lakehouse stores beside typed ones
      * (q37's string-function twin, promoted to the native type).
      */
    "q161_variant" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT event_id,
          |       variant_get(parse_json(props), '$.k', 'int') AS k,
          |       variant_get(parse_json(props), '$.missing', 'int') AS absent
          |FROM events
          |WHERE variant_get(parse_json(props), '$.k', 'int') >= 50""".stripMargin)
    }),

    /** Recursive CTE (extension; Spark 4 `WITH RECURSIVE` surface): the
      * 2-hop BFS of q154 expressed declaratively — seed row, recursive
      * self-join step with a depth bound, min-level fold after. Proven
      * ≡ the iterative [[graft.operators.Bfs]] in GraphOpsSpec.
      */
    "q164_recursive_cte" -> ((s, dir) => {
      val e = li(s, dir).select((col("l_orderkey") % 997).as("a"),
          (lit(1000) + col("l_partkey") % 499).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
      // the recursive step re-reads the view ONCE PER RECURSION LEVEL —
      // persist the (≤997×499-bounded) undirected edge frame so the
      // lineitem scan + distinct run once, not once per level (and expand
      // both directions with ONE in-row explode instead of a self-union
      // that would evaluate the distinct twice even inside that one
      // materialization). Cleanup: session owner drops persisted blocks
      // between queries.
      e.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("__e"))
        .select(col("__e.u").as("u"), col("__e.v").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .createOrReplaceTempView("rc_und")
      s.sql(
        """WITH RECURSIVE walk(node, level) AS (
          |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS level
          |  UNION ALL
          |  SELECT e.v AS node, w.level + CAST(1 AS BIGINT) AS level
          |  FROM walk w JOIN rc_und e ON e.u = w.node
          |  WHERE w.level < 2)
          |SELECT node, min(level) AS level
          |FROM walk GROUP BY node""".stripMargin)
    }),

    /** IGNORE NULLS window functions (extension; SQL surface): per-user
      * last-observation-carried-forward via `last(v, ignoreNulls=true)`
      * over a running frame — the windowed gap-fill idiom (q108's resample
      * does it on a grid; this is the in-stream form). NULLs synthesized
      * deterministically from the event type.
      */
    "q168_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
          col("event_id"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
    }),

    /** LIMIT/OFFSET pagination (extension; SQL surface): deterministic
      * total order, page 3 of 20 — plans as a global TakeOrdered with the
      * offset folded in, never a full sort.
      */
    "q170_limit_offset" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey
          |LIMIT 20 OFFSET 40""".stripMargin)
    }),

    /** FULL OUTER join (extension — the one ANSI join shape the surface
      * lacked): even-keyed customers against per-customer order counts —
      * customers with no orders surface left-only, odd-customer orders
      * surface right-only with a NULL segment, and the classification
      * column pins the null-extension semantics the hash compare checks.
      * Spark plans this as a SortMergeJoin with FullOuter — both sides
      * stream, neither builds a table-sized hash map.
      */
    "q174_full_outer" -> ((s, dir) => {
      val oc = orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      c.join(oc, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment").as("seg"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull,
            lit("both"))
            .when(col("c_custkey").isNotNull, lit("customer_only"))
            .otherwise(lit("orders_only")).as("cls"))
    }),

    /** Ranking-function surface (extension): rank / dense_rank /
      * percent_rank / cume_dist over a TIE-BEARING order (order dates
      * repeat ~6× per day, so the four functions genuinely diverge) plus
      * ntile(4) over a unique key (ntile is only deterministic when the
      * ordering is total). Named WINDOW clauses; one window sort per
      * distinct (partition, order) pair — Spark shares the wd sort across
      * its four functions.
      */
    "q175_rank_surface" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, o_orderpriority,
          |       rank() OVER wd AS rnk,
          |       dense_rank() OVER wd AS drnk,
          |       percent_rank() OVER wd AS prnk,
          |       cume_dist() OVER wd AS cd,
          |       ntile(4) OVER wk AS quartile
          |FROM orders
          |WINDOW wd AS (PARTITION BY o_orderpriority ORDER BY o_orderdate),
          |       wk AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)""".stripMargin)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("rnk").cast("long").as("rnk"),
          col("drnk").cast("long").as("drnk"), col("prnk"), col("cd"),
          col("quartile").cast("long").as("quartile"))
    }),

    /** Map-typed column functions (extension): per-user event-type counts
      * assembled into a MAP with `map_from_entries` (over a SORTED entry
      * array — map iteration order is insertion order, so downstream
      * results are deterministic), doubled with `transform_values`,
      * thresholded with `map_filter`, and exploded back to atomic
      * (user, type, count) rows — the declared output stays scalar for the
      * oracle gate while the plan exercises the full map-function surface.
      */
    "q177_map_functions" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          explode(map_filter(transform_values(col("m"), (_, v) => v * 2),
            (_, v) => v >= lit(4L))).as(Seq("event_type", "cnt2")))
    }),

    /** Higher-order array-function surface (extension; q177's sibling for
      * the array side): per-user sorted value arrays pushed through
      * `filter`/`exists`/`forall`/`aggregate`(fold)/`slice`/`element_at` —
      * all native Catalyst lambda expressions, zero UDFs. The fold runs in
      * the array's SORTED order, so its float sum is deterministic; the
      * oracle replays each lambda as a relational aggregate (count FILTER,
      * bool_or/bool_and, ordered-prefix sum via row_number).
      */
    "q190_array_functions" -> ((s, dir) => {
      val ev = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("value"))).as("vs"))
      ev.select(col("user_id"),
        size(col("vs")).cast("long").as("n_events"),
        size(filter(col("vs"), x => x > 50.0)).cast("long").as("n_over_50"),
        exists(col("vs"), x => x > 400.0).as("any_over_400"),
        forall(col("vs"), x => x >= 0.0).as("all_nonneg"),
        round(aggregate(col("vs"), lit(0.0), (a, x) => a + x), 6).as("sum_fold"),
        round(element_at(col("vs"), 1), 6).as("min_v"),
        round(element_at(col("vs"), -1), 6).as("max_v"),
        round(aggregate(slice(col("vs"), 1, 3), lit(0.0), (a, x) => a + x), 6)
          .as("low3_sum"))
    }),

    /** String-function surface (extension; the warehouse-dialect batch
      * beyond q06): levenshtein, translate, lpad, instr, split-cardinality,
      * reverse — each an expression both engines define identically, over
      * the part names. Everything codegen'd; one narrow projection.
      */
    "q179_string_surface" -> ((s, dir) =>
      part(s, dir).select(col("p_partkey"), col("p_name"),
        length(col("p_name")).cast("long").as("len"),
        levenshtein(col("p_name"), lit("standard burnished steel"))
          .cast("long").as("lev"),
        translate(col("p_name"), "aeiou", "_____").as("tr"),
        lpad(col("p_brand"), 12, "#").as("pad"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        reverse(substring(col("p_name"), 1, 8)).as("rev8")))
  )

  val oracleSql: Map[String, String] = Map(

    "q75_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q76_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1""".stripMargin,

    "q88_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       avg(l_discount) AS avg_disc
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q122_bucketed_join" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       sum(l.l_quantity) AS sum_qty
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,

    "q128_set_ops" ->
      """WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |l AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'),
        |c AS (
        |  SELECT o_custkey, 'both' AS cls FROM (SELECT * FROM u INTERSECT SELECT * FROM l)
        |  UNION ALL
        |  SELECT o_custkey, 'urgent_only' FROM (SELECT * FROM u EXCEPT SELECT * FROM l)
        |  UNION ALL
        |  SELECT o_custkey, 'low_only' FROM (SELECT * FROM l EXCEPT SELECT * FROM u))
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(o_custkey) AS BIGINT) AS key_sum
        |FROM c GROUP BY 1""".stripMargin,

    "q130_pagerank" -> {
      def round(prev: String, cur: Int): String =
        s"""r$cur AS (SELECT e.v AS node,
           |    min(CAST(0.15 AS DOUBLE) / nn.c)
           |      + CAST(0.85 AS DOUBLE) * sum(r.pr / d.deg) AS pr
           |  FROM und e JOIN $prev r ON r.node = e.u
           |  JOIN deg d ON d.u = e.u, nn
           |  GROUP BY 1)""".stripMargin
      s"""WITH e AS (SELECT DISTINCT l_suppkey + 1000000 AS u, l_partkey AS v
         |           FROM lineitem),
         |und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |nn AS (SELECT count(*) AS c FROM deg),
         |r0 AS (SELECT u AS node, CAST(1 AS DOUBLE) / c AS pr FROM deg, nn),
         |${round("r0", 1)},
         |${round("r1", 2)},
         |${round("r2", 3)}
         |SELECT node, pr FROM r3""".stripMargin
    },

    "q135_triangles" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem),
        |md AS (SELECT greatest(9973,
        |         2 * CAST(floor(cnt / 120) AS BIGINT) + 1) AS m FROM n),
        |e AS (SELECT DISTINCT least(l_orderkey % m, l_partkey % m) AS u,
        |                  greatest(l_orderkey % m, l_partkey % m) AS v
        |           FROM lineitem, md
        |           WHERE l_orderkey % m <> l_partkey % m),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
        |o AS (SELECT w.u AS a, w.v AS b, db.deg AS db
        |      FROM und w JOIN deg da ON da.u = w.u JOIN deg db ON db.u = w.v
        |      WHERE da.deg < db.deg OR (da.deg = db.deg AND w.u < w.v)),
        |wed AS (SELECT o1.b AS wa, o2.b AS wb
        |        FROM o o1 JOIN o o2 ON o1.a = o2.a
        |        WHERE o1.db < o2.db OR (o1.db = o2.db AND o1.b < o2.b)),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n
        |      FROM wed JOIN o ON o.a = wed.wa AND o.b = wed.wb)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |       t.n AS n_triangles
        |FROM t""".stripMargin,

    "q142_not_in" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority""".stripMargin,

    "q143_listagg" ->
      """SELECT l_orderkey,
        |       string_agg(CAST(l_linenumber AS VARCHAR), ','
        |                  ORDER BY l_linenumber) AS lines,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY 1""".stripMargin,

    "q144_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin,

    "q145_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i
        |            FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM bi),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi
        |       GROUP BY 1 HAVING count(*) >= 50),
        |pr AS (SELECT bi.b, bi.i, ic.n FROM bi JOIN ic USING (i)),
        |p AS (SELECT a.i AS item_a, b.i AS item_b, a.n AS n_a, b.n AS n_b,
        |             CAST(count(*) AS BIGINT) AS n_ab
        |      FROM pr a JOIN pr b ON a.b = b.b AND a.i < b.i
        |      GROUP BY 1, 2, 3, 4 HAVING count(*) >= 50)
        |SELECT item_a, item_b, n_a, n_b, n_ab,
        |       CAST(n_ab AS DOUBLE) / n_baskets AS support,
        |       CAST(n_ab AS DOUBLE) / n_a AS confidence,
        |       CAST(n_ab AS DOUBLE) * n_baskets / CAST(n_a * n_b AS DOUBLE)
        |         AS lift
        |FROM p CROSS JOIN nb""".stripMargin,

    "q146_label_prop" -> {
      def round(n: Int, prev: String): String =
        s"""v$n AS (SELECT w.u, l.label, CAST(count(*) AS BIGINT) AS n
           |        FROM und w JOIN $prev l ON l.node = w.v GROUP BY 1, 2),
           |l$n AS (SELECT u AS node, label FROM (
           |          SELECT u, label,
           |                 row_number() OVER (PARTITION BY u
           |                   ORDER BY n DESC, label) AS rn
           |          FROM v$n) WHERE rn = 1)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT
         |    least(l_orderkey % 997, 1000 + l_partkey % 499) AS u,
         |    greatest(l_orderkey % 997, 1000 + l_partkey % 499) AS v
         |  FROM lineitem
         |  WHERE l_orderkey % 997 <> 1000 + l_partkey % 499),
         |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
         |${round(1, "l0")},
         |${round(2, "l1")},
         |${round(3, "l2")}
         |SELECT node, label FROM l3""".stripMargin
    },

    "q147_markov" ->
      """WITH t AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |                  event_id, event_type
        |           FROM events),
        |l AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS prev_type,
        |             event_type AS next_type
        |      FROM t),
        |c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        |      FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
        |        FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |       CAST(c.n AS DOUBLE) / tot.tot AS p
        |FROM c JOIN tot USING (prev_type)""".stripMargin,

    "q150_k_core" -> {
      def round(n: Int, prev: String): String =
        s"""a$n AS (SELECT u FROM (
           |          SELECT u, count(*) AS c FROM $prev GROUP BY 1)
           |        WHERE c >= 50),
           |e$n AS (SELECT w.u, w.v FROM $prev w
           |        JOIN a$n x ON x.u = w.u
           |        JOIN a$n y ON y.u = w.v)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT
         |    least(l_orderkey % 997, 1000 + l_partkey % 499) AS u,
         |    greatest(l_orderkey % 997, 1000 + l_partkey % 499) AS v
         |  FROM lineitem
         |  WHERE l_orderkey % 997 <> 1000 + l_partkey % 499),
         |e0 AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
         |${round(1, "e0")},
         |${round(2, "e1")},
         |${round(3, "e2")}
         |SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
         |FROM e3 GROUP BY 1""".stripMargin
    },

    "q154_bfs_levels" ->
      """WITH e AS (
        |  SELECT DISTINCT
        |    least(l_orderkey % 997, 1000 + l_partkey % 499) AS u,
        |    greatest(l_orderkey % 997, 1000 + l_partkey % 499) AS v
        |  FROM lineitem
        |  WHERE l_orderkey % 997 <> 1000 + l_partkey % 499),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |l0 AS (SELECT DISTINCT u AS node FROM und WHERE u = 0),
        |f1 AS (SELECT DISTINCT w.v AS node FROM und w
        |       JOIN l0 ON l0.node = w.u
        |       WHERE w.v NOT IN (SELECT node FROM l0)),
        |f2 AS (SELECT DISTINCT w.v AS node FROM und w
        |       JOIN f1 ON f1.node = w.u
        |       WHERE w.v NOT IN (SELECT node FROM l0
        |                         UNION ALL SELECT node FROM f1))
        |SELECT node, CAST(0 AS BIGINT) AS level FROM l0
        |UNION ALL SELECT node, CAST(1 AS BIGINT) AS level FROM f1
        |UNION ALL SELECT node, CAST(2 AS BIGINT) AS level FROM f2""".stripMargin,

    "q156_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,

    "q157_scalar_subquery" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority""".stripMargin,

    "q161_variant" ->
      """SELECT event_id,
        |       CAST(props::JSON ->> 'k' AS INT) AS k,
        |       CAST(props::JSON ->> 'missing' AS INT) AS absent
        |FROM events
        |WHERE CAST(props::JSON ->> 'k' AS INT) >= 50""".stripMargin,

    "q164_recursive_cte" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT
        |    least(l_orderkey % 997, 1000 + l_partkey % 499) AS u,
        |    greatest(l_orderkey % 997, 1000 + l_partkey % 499) AS v
        |  FROM lineitem
        |  WHERE l_orderkey % 997 <> 1000 + l_partkey % 499),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |walk(node, level) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS level
        |  UNION ALL
        |  SELECT w2.v AS node, walk.level + CAST(1 AS BIGINT) AS level
        |  FROM walk JOIN und w2 ON w2.u = walk.node
        |  WHERE walk.level < 2)
        |SELECT node, min(level) AS level
        |FROM walk GROUP BY node""".stripMargin,

    "q168_ignore_nulls" ->
      """WITH t AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |                  event_id,
        |                  CASE WHEN event_type = 'error' THEN NULL
        |                       ELSE value END AS v
        |           FROM events)
        |SELECT user_id, ts_us, event_id, v,
        |       last_value(v IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY ts_us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS v_filled
        |FROM t""".stripMargin,

    "q170_limit_offset" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin,

    "q174_full_outer" ->
      """WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |            FROM orders GROUP BY 1),
        |c AS (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_custkey % 2 = 0)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |       c_mktsegment AS seg,
        |       coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
        |       CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
        |              THEN 'both'
        |            WHEN c_custkey IS NOT NULL THEN 'customer_only'
        |            ELSE 'orders_only' END AS cls
        |FROM c FULL JOIN oc ON c_custkey = o_custkey""".stripMargin,

    "q175_rank_surface" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(rank() OVER wd AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER wd AS BIGINT) AS drnk,
        |       percent_rank() OVER wd AS prnk,
        |       cume_dist() OVER wd AS cd,
        |       CAST(ntile(4) OVER wk AS BIGINT) AS quartile
        |FROM orders
        |WINDOW wd AS (PARTITION BY o_orderpriority ORDER BY o_orderdate),
        |       wk AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)""".stripMargin,

    "q190_array_functions" ->
      """WITH r AS (SELECT user_id, value,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY value) AS rn
        |           FROM events)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) FILTER (WHERE value > 50.0) AS BIGINT) AS n_over_50,
        |  bool_or(value > 400.0) AS any_over_400,
        |  bool_and(value >= 0.0) AS all_nonneg,
        |  round(sum(value ORDER BY value), 6) AS sum_fold,
        |  round(min(value), 6) AS min_v,
        |  round(max(value), 6) AS max_v,
        |  round(sum(value ORDER BY value) FILTER (WHERE rn <= 3), 6)
        |    AS low3_sum
        |FROM r GROUP BY user_id""".stripMargin,

    "q177_map_functions" ->
      """WITH c AS (SELECT user_id, event_type,
        |                  CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id, event_type, CAST(2 * cnt AS BIGINT) AS cnt2
        |FROM c WHERE 2 * cnt >= 4""".stripMargin,

    "q179_string_surface" ->
      """SELECT p_partkey, p_name,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       CAST(levenshtein(p_name, 'standard burnished steel') AS BIGINT)
        |         AS lev,
        |       translate(p_name, 'aeiou', '_____') AS tr,
        |       lpad(p_brand, 12, '#') AS pad,
        |       CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
        |       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |       reverse(substr(p_name, 1, 8)) AS rev8
        |FROM part""".stripMargin
  )
}
