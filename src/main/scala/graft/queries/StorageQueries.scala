package graft.queries

import graft.functions.{GapParser, TextFunctions, VectorFunctions}
import graft.operators._
import graft.pipeline.{F1Staging, F1Synthetic}
import graft.sources.{BloomStore, Bucketed, Tables, TxLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryShared._

/** Transaction-log / layout / incremental-view surface: ACID commits, MERGE/CDC/DVs, metadata DDL, time travel, z-order, data skipping, bloom indexes, SCD2, and Materialize IVM.
  *
  * Split from the original single-file registry; each entry keeps its
  * Scaladoc mapping to SURVEY.md §2 / the reference files. The driver
  * surface remains [[graft.SparkEntry.queries]]/[[graft.SparkEntry.oracleSql]],
  * which merge the per-family maps.
  */
private[graft] object StorageQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** CSV source round-trip (S1/S2's other classic wire format beside the
      * JSON fixtures): orders written to CSV with a DELIBERATELY hazardous
      * injected string — embedded delimiter, RFC-4180 `""`-escaped quote,
      * and a NEWLINE inside a quoted field — then read back through a
      * schema-explicit `multiLine` reader. The oracle reads the parquet
      * truth directly, so any quoting/escaping/type-parsing asymmetry
      * between the writer and reader breaks the hash: doubles survive via
      * shortest-round-trip rendering, timestamps ride as epoch-µs BIGINT
      * (the format-free spelling per the SparkEntry conventions). At scale
      * CSV is ingest-only (no pushdown, no stats) — land it to parquet/
      * TxLog in one pass, which is exactly the shape this query runs.
      */
    "q220_csv_roundtrip" -> ((s, dir) => {
      val path = fixture("csvsrc", dir) { root =>
        orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("odate_us"),
          concat(col("o_orderpriority"), lit(", \"q\"\nline2")).as("tricky"))
          .write.option("header", "true").option("escape", "\"")
          .csv(root + "/orders")
      } + "/orders"
      s.read
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING," +
          " o_totalprice DOUBLE, odate_us BIGINT, tricky STRING")
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"")
        .csv(path)
    }),

    /** Snapshot drift audit (extension; [[graft.operators.Expectations
      * .snapshotDrift]] — the table-level monitor beside q188's row-level
      * expectations, paired with time travel to make "before"
      * reproducible): per-column count/nulls/NDV/min/max of q44's table at
      * version 0 (the initial load, session 3 absent) vs the current
      * snapshot (session 3 doubled, session 4 negated), drift flags per
      * column. The negated prices EXPAND the range below the old min — the
      * upstream semantics break a type check can't see — while the key
      * columns stay range-stable. One pass per side, everything exact
      * integer/extremal arithmetic.
      */
    "q227_snapshot_drift" -> ((s, dir) => {
      val path = q44Fixture(s, dir)
      Expectations.snapshotDrift(
        TxLog.read(s, path, 0), TxLog.read(s, path),
        Seq("o_orderkey", "session_key", "price"))
    }),

    /** The INCREMENTAL drift monitor end-to-end (extension;
      * [[graft.streaming.DriftStream.ingestBatch]] — q227's streaming
      * sibling, gate-checked): three deterministic batches of orders land
      * in a fresh TxLog table with the per-column audit riding along; the
      * monitor table read back must equal the full-rescan profile merges
      * the oracle replays — proving the incremental path (previous audit =
      * before side, seen-values NDV) computes the exact drift rows while
      * never rescanning the data table (the O(batch) guard is spec'd;
      * this row pins the VALUES at the gate).
      */
    "q244_drift_monitor" -> ((s, dir) => {
      val path = fixture("driftmon", dir) { root =>
        val o = orders(s, dir).select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 8).as("p"), col("o_totalprice").as("price"))
        (0 to 2).foreach { i =>
          graft.streaming.DriftStream.ingestBatch(s,
            o.filter(col("k") % 3 === i), root + "/t", root + "/m", "p",
            Seq("k", "price"), "app", i.toLong)
        }
      }
      TxLog.read(s, path + "/m")
    }),

    /** Transactional table round-trip (S6 made table-ATOMIC — the reference's
      * warehouse transaction around session delete+reload,
      * `dags/open_f1_realtime.py:221-246`): append all sessions but 3, then
      * two [[graft.sources.TxLog.replaceKeys]] commits — one inserting the
      * absent session 3 (doubled price), one replacing session 4 (negated
      * price) — and read the final snapshot. Each mutation is ONE manifest
      * swap; the oracle computes the equivalent final state relationally.
      */
    "q44_tx_replace" -> ((s, dir) => {
      val path = q44Fixture(s, dir)
      TxLog.read(s, path).select(
        col("o_orderkey"), col("session_key").cast("long").as("session_key"),
        col("price"))
    }),

    /** Row-level transactional MERGE (Delta `WHEN MATCHED UPDATE / WHEN NOT
      * MATCHED INSERT`) on the versioned log: base-load from orders, then one
      * merge that doubles the price of every even key in session 5 AND
      * inserts fresh rows keyed above the base range — read back the final
      * table. First-committer-wins serializable semantics spec'd in
      * TxLogSpec; this query oracle-checks the merge arithmetic itself.
      */
    "q64_tx_merge" -> ((s, dir) => {
      val path = fixture("q64", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 20).as("session_key"),
          col("o_totalprice").as("price"))
        TxLog.append(base, p, "session_key")
        val upserts = base
          .filter(col("session_key") === 5 && col("o_orderkey") % 2 === 0)
          .withColumn("price", col("price") * 2)
          .unionByName(base.filter(col("session_key") === 5 && col("o_orderkey") % 2 === 1)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("session_key"), lit(1.0).as("price")))
        TxLog.mergeKeys(upserts, p, "session_key", keyCols = Seq("o_orderkey"))
      } + "/t"
      TxLog.read(s, path).select(
        col("o_orderkey"), col("session_key").cast("long").as("session_key"),
        col("price"))
    }),

    /** Schema evolution + log-integrated compaction on the versioned table
      * (S5 drift recovery + S12 maintenance, both as manifest commits): era-1
      * rows land with the original schema, era-2 rows arrive with an ADDED
      * column, [[graft.sources.TxLog.compact]] rewrites the drifted table as
      * one file per partition (snapshot-isolated, merged schema preserved),
      * and [[graft.sources.TxLog.readMerged]] reads both eras unified —
      * pre-drift rows surface NULL for the added column.
      */
    "q65_tx_schema_drift" -> ((s, dir) => {
      val path = fixture("q65", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 10).as("session_key"),
          col("o_totalprice").as("price"))
        TxLog.append(base.filter(col("o_orderkey") % 2 === 0), p, "session_key")
        TxLog.append(base.filter(col("o_orderkey") % 2 === 1)
          .withColumn("discounted", col("price") * 2), p, "session_key")
        TxLog.compact(s, p, "session_key")
      } + "/t"
      TxLog.readMerged(s, path).select(
        col("o_orderkey"), col("session_key").cast("long").as("session_key"),
        col("price"), col("discounted"))
    }),

    /** Manifest data skipping on the versioned table (extension; the
      * Delta-style per-file min/max stats path): three key-range batches
      * commit with `statsCols`, then a range read prunes to the matching
      * batch's files via the manifest — no listing, no footer reads outside
      * the range — with the residual filter keeping the result exact
      * ([[graft.sources.TxLog.readRange]]). The 100 TB story: a time/key
      * range query touches O(matching files) of a table whose batches arrive
      * in key order, not O(table).
      */
    "q69_tx_data_skipping" -> ((s, dir) => {
      val path = fixture("q69", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 8).as("session_key"),
          col("o_totalprice").as("price"))
        TxLog.append(base.filter(col("o_orderkey") < 5000), p, "session_key",
          statsCols = Seq("o_orderkey"))
        TxLog.append(base.filter(col("o_orderkey") >= 5000 && col("o_orderkey") < 10000),
          p, "session_key", statsCols = Seq("o_orderkey"))
        TxLog.append(base.filter(col("o_orderkey") >= 10000), p, "session_key",
          statsCols = Seq("o_orderkey"))
      } + "/t"
      TxLog.readRange(s, path, "o_orderkey", BigDecimal(6000), BigDecimal(9000))
        .select(col("o_orderkey"), col("session_key").cast("long").as("session_key"),
          col("price"))
    }),

    /** Morton/Z-order clustering key (extension; the layout behind
      * `OPTIMIZE ZORDER BY`): bit-interleave of two range-reduced order
      * attributes ([[graft.functions.ZOrder.zValue]] — pure shift/and/or
      * arithmetic, oracle-replayed term-for-term via
      * [[graft.functions.ZOrder.zValueSql]]). The layout writer built on it
      * ([[graft.sources.Sinks.writeZOrdered]]) is pruning-verified in
      * ZOrderSpec: a range query on either interleaved dimension touches
      * O(√files) of a z-clustered table vs ALL files of a one-column sort.
      */
    "q72_zorder_key" -> ((s, dir) =>
      orders(s, dir).select(col("o_orderkey"),
        graft.functions.ZOrder.zValue(
          col("o_orderkey").bitwiseAND(lit(1023L)),
          floor(col("o_totalprice")).cast("long").bitwiseAND(lit(1023L)),
          bits = 10).as("zval"))),

    /** Incremental materialized-aggregate maintenance (extension;
      * [[graft.sources.Materialize]]): a per-session count/sum summary of a
      * transaction-log table kept current across three appends by reading
      * ONLY each commit's added files (manifest diff) and merging by key —
      * never recomputing the table. Exactly-once: the reflected source
      * version rides inside the same manifest swap as the data. The final
      * materialization must equal the plain GROUP BY of everything.
      */
    "q74_incremental_agg" -> ((s, dir) => {
      val mat = fixture("q74", dir) { root =>
        val src = root + "/src/t"
        val m = root + "/mat/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 8).as("session_key"),
          col("o_totalprice").as("price"))
        Seq(col("o_orderkey") < 5000,
          col("o_orderkey") >= 5000 && col("o_orderkey") < 10000,
          col("o_orderkey") >= 10000).foreach { slice =>
          TxLog.append(base.filter(slice), src, "session_key")
          graft.sources.Materialize.refresh(s, src, m,
            keyCols = Seq("session_key"), sumCols = Seq("price"))
        }
      } + "/mat/t"
      // the maintained sum is exact (decimal-accumulated inside Materialize,
      // so merge order cannot drift it); ROUND(…,2) pins both engines to the
      // same 2-decimal grid the source prices live on, making the hash
      // compare deterministic rather than IEEE-summation-order-dependent
      graft.sources.Materialize.read(s, mat).select(
        col("session_key").cast("long").as("session_key"),
        col("__cnt").as("n_orders"),
        round(col("sum_price"), 2).as("sum_price"))
    }),

    /** Row-level change-data feed off the transaction log (extension;
      * [[graft.sources.TxLog.rowChanges]], Delta CDF semantics): a
      * key-scoped replace doubles half of session 3's prices, and the CDC
      * read reports exactly the touched rows as delete+insert pairs — the
      * untouched half of the partition cancels inside the diff, and
      * untouched PARTITIONS are never even read (manifest-aware: only
      * added/removed files reach the exceptAll).
      */
    "q81_tx_row_cdc" -> ((s, dir) => {
      var v0 = 0L
      val path = fixture("q81", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 20).as("session_key"),
          col("o_totalprice").as("price"))
        v0 = TxLog.append(base, p, "session_key")
        val session3 = base.filter(col("session_key") === 3)
        TxLog.replaceKeys(
          session3.withColumn("price",
            when(col("o_orderkey") % 40 === 3, col("price") * 2).otherwise(col("price"))),
          p, "session_key")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(root, "v0"), v0.toString)
      } + "/t"
      // a cached fixture skips the build closure — recover the CDC base
      // version from the marker persisted beside the table
      if (v0 == 0L) v0 = java.nio.file.Files.readString(
        java.nio.file.Paths.get(path).getParent.resolve("v0")).trim.toLong
      TxLog.rowChanges(s, path, fromVersion = v0)
        .select(col("change"), col("o_orderkey"),
          col("session_key").cast("long").as("session_key"), col("price"))
    }),

    /** Persisted + incrementally-maintained bloom anti-join (extension; the
      * amortized form of q70 — [[graft.sources.BloomStore]]): the corpus is a
      * transaction-log table grown across two appends. The filter is built
      * once at v0, brought to v1 by hashing ONLY the second commit's added
      * files (manifest diff — O(new rows), never O(corpus)), persisted beside
      * the table, and served to [[graft.operators.Dedup.bloomAntiJoinWith]].
      * The maintained filter has no false negatives at any version ⇒ exact;
      * same NOT EXISTS oracle family as q70.
      */
    "q91_bloom_store" -> ((s, dir) => {
      val base = orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      val path = fixture("q91", dir) { root =>
        val p = root + "/t"
        TxLog.appendFlat(base.filter(col("o_orderkey") % 2 === 0), p)
        BloomStore.ensureCurrent(s, p, "o_orderkey", expectedItems = 100000)
        TxLog.appendFlat(base.filter(col("o_orderkey") % 2 =!= 0), p)
      } + "/t"
      // idempotent: the store is already current after the build; a cached
      // call just loads the persisted filter
      val bloom =
        BloomStore.ensureCurrent(s, path, "o_orderkey", expectedItems = 100000)
      val batch = base.select(
        when(col("o_orderkey") % 3 === 0, col("o_orderkey"))
          .otherwise(col("o_orderkey") + 7777777L).as("o_orderkey"),
        col("o_totalprice"))
      Dedup.bloomAntiJoinWith(batch, TxLog.read(s, path), "o_orderkey", bloom)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    /** Incrementally-maintained count-min sketch (extension;
      * [[graft.operators.Sketches.countMinRefresh]] — the streaming-heavy-
      * hitters shape): the corpus lands in a transaction-log table across
      * two appends, and the sketch grid is refreshed after each by reading
      * ONLY that commit's added files (cells merge additively; the
      * incremental grid provably equals the from-scratch sketch, so this
      * query shares q94's full-replay oracle). Per-batch cost O(new rows),
      * never O(corpus); exactly-once via the materialization commit.
      */
    "q95_cms_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val keys = (df: DataFrame) =>
        df.select(explode(TextFunctions.tokens(col("text"))).as("term"))
      val mat = fixture("q95", dir) { root =>
        val src = root + "/src/t"
        val m = root + "/mat/t"
        Seq(col("doc_id") % 2 === 0, col("doc_id") % 2 =!= 0).foreach { slice =>
          TxLog.appendFlat(d.filter(slice), src)
          Sketches.countMinRefresh(s, src, m, keys, "term", depth = 4, width = 1024)
        }
      } + "/mat/t"
      val cells = Sketches.countMinRead(s, mat)
      val top = keys(d).groupBy("term").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term").asc).limit(20)
      Sketches.countMinEstimates(cells, top, "term", depth = 4, width = 1024)
        .select(col("term"), col("n_exact"), col("cms_est"))
    }),

    /** Z-order compaction on the transaction log (extension;
      * [[graft.sources.TxLog.compactZOrdered]] — `OPTIMIZE ZORDER BY` as a
      * snapshot-isolated maintenance commit): the table lands in key order
      * across two appends (stats useless for a price predicate), one
      * z-compaction rewrites it as Morton-sorted 2-D tiles, and the read
      * prunes files on the PRICE-derived dimension through the manifest
      * stats collected in the same commit — with the residual filter
      * keeping the result exact, which is what the oracle checks.
      */
    "q97_zorder_compact" -> ((s, dir) => {
      val path = fixture("q97", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(1023L)).as("x"),
          floor(col("o_totalprice")).cast("long").bitwiseAND(lit(1023L)).as("y"),
          col("o_totalprice"))
        TxLog.appendFlat(base.filter(col("o_orderkey") % 2 === 0), p,
          statsCols = Seq("x", "y"))
        TxLog.appendFlat(base.filter(col("o_orderkey") % 2 =!= 0), p,
          statsCols = Seq("x", "y"))
        TxLog.compactZOrdered(s, p, "x", "y", bits = 10, nFiles = 16)
      } + "/t"
      TxLog.readRange(s, path, "y", 0, 63)
        .select(col("o_orderkey"), col("x"), col("y"), col("o_totalprice"))
    }),

    /** SCD Type-2 dimension history (extension;
      * [[graft.operators.Scd2]] on the versioned transaction log): three
      * update batches — initial load, a segment shift (+ brand-new keys), a
      * second shift plus a NO-OP batch that must not open versions — then
      * the full history table: every version row with its half-open validity
      * interval. Only touched hash buckets rewrite, one manifest swap per
      * merge, first-committer-wins OCC. The oracle reconstructs the same
      * history from the event stream (lag-dedup of consecutive repeats +
      * lead for interval ends).
      */
    "q103_scd2" -> ((s, dir) => {
      val path = buildScd2Dim(s, dir)
      TxLog.read(s, path).drop(Scd2.BucketCol)
        .select(col("k").as("c_custkey"), col("segment"), col("valid_from"),
          col("valid_to"), col("is_current"))
    }),

    /** Bloom-indexed point lookup (extension; [[graft.sources.TxLog
      * .readPoint]] — the Delta/Iceberg bloom file-index): orders land in
      * four appends, each commit building a per-file bloom filter on
      * o_custkey (a high-cardinality column no file is sorted by — min/max
      * stats can't skip anything for it); the point lookup reads only files
      * whose filter admits the key, with the residual equality keeping the
      * result exact. The oracle is the plain equality scan.
      */
    "q107_bloom_point" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val path = fixture("q107", dir) { root =>
        val p = root + "/t"
        (0 until 4).foreach(i =>
          TxLog.appendFlat(o.filter(col("o_orderkey") % 4 === i), p,
            bloomCols = Seq("o_custkey")))
      } + "/t"
      val target = o.agg(min(col("o_custkey"))).head().getLong(0)
      TxLog.readPoint(s, path, "o_custkey", target)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
    }),

    /** Row-level DELETE via deletion vectors (extension;
      * [[graft.sources.TxLog.deleteWhere]] — the Delta DV / Iceberg
      * position-delete merge-on-read shape): two delete commits write only
      * (file, row-position) sidecars — no data file rewritten, O(deleted
      * rows) not O(file bytes) — then the live table aggregates. The
      * second predicate overlaps the first (already-deleted rows re-match),
      * exercising the per-file merged-set semantics. The oracle replays
      * both deletes as `WHERE NOT(...)` conjuncts.
      */
    "q114_delete_vectors" -> ((s, dir) => {
      val path = fixture("q114", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 20).as("session_key"),
          col("o_orderpriority"), col("o_totalprice"))
        TxLog.append(base, p, "session_key", statsCols = Seq("o_orderkey"))
        TxLog.deleteWhere(s, p,
          "o_totalprice < 50000 AND o_orderpriority = '1-URGENT'")
        TxLog.deleteWhere(s, p, "o_orderkey % 7 = 0")
      } + "/t"
      TxLog.read(s, path)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
    }),

    /** Merge-on-read UPDATE composed with DELETE (extension;
      * [[graft.sources.TxLog.updateWhere]]): the update masks old positions
      * and appends updated images in ONE commit (no file rewritten), the
      * delete then masks on top — the oracle replays both as CASE WHEN +
      * WHERE NOT. max()/count()/integer sums only, so double arithmetic
      * stays order-independent.
      */
    "q117_update_vectors" -> ((s, dir) => {
      val path = fixture("q117", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 20).as("session_key"),
          col("o_orderpriority"), col("o_totalprice"))
        TxLog.append(base, p, "session_key")
        TxLog.updateWhere(s, p, "o_orderpriority = '5-LOW'",
          Map("o_totalprice" -> "o_totalprice * CAST(1.1 AS DOUBLE)"))
        TxLog.deleteWhere(s, p, "o_orderkey % 5 = 0")
      } + "/t"
      TxLog.read(s, path)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"),
          max(col("o_totalprice")).as("max_price"))
    }),

    /** SCD2 temporal fact join (extension; [[graft.operators.Scd2
      * .temporalJoin]]): every order joins the dimension version valid at
      * its event time — key equi-join + interval residual, the Kimball
      * point of keeping history. The oracle replays dimension construction
      * (q103's CTE) and the validity join.
      */
    "q119_scd2_join" -> ((s, dir) => {
      val path = buildScd2Dim(s, dir)
      val facts = orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 30).as("fact_t"))
      Scd2.temporalJoin(facts, "o_custkey", "fact_t", path, "k")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
    }),

    /** Incrementally-maintained HLL distinct sketch (extension;
      * [[graft.operators.Sketches.hllRefresh]] — the cardinality twin of
      * q95's count-min): registers max-merge per refresh over only the
      * added files; the estimate is exact dyadic arithmetic the oracle
      * replays bit-for-bit, emitted beside the exact distinct count.
      */
    "q120_hll_incremental" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderpriority"), col("o_custkey"))
      val mat = fixture("q120", dir) { root =>
        val src = root + "/src/t"
        val m = root + "/mat/t"
        Seq(col("o_custkey") % 2 === 0, col("o_custkey") % 2 =!= 0).foreach { slice =>
          TxLog.appendFlat(o.filter(slice), src)
          Sketches.hllRefresh(s, src, m, identity,
            Seq("o_orderpriority"), "o_custkey")
        }
      } + "/mat/t"
      val est = Sketches.hllEstimates(
        Sketches.hllRead(s, mat, Seq("o_orderpriority")), Seq("o_orderpriority"))
      val exact = o.groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      est.join(exact, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_regs"), col("hll_est"),
          col("n_exact"))
    }),

    /** Incrementally-maintained JOIN view (extension; [[graft.sources
      * .Materialize.refreshJoin]] — the join twin of q74's aggregate IVM):
      * an orders⋈customer enrichment view refreshed per batch by the delta
      * rule `Δ(S⋈D) = ΔS⋈D` — each refresh joins only the NEW fact files
      * and appends; the fact history is never re-read. The oracle checks
      * the maintained view equals the from-scratch join.
      */
    "q123_incremental_join" -> ((s, dir) => {
      val mat = fixture("q123", dir) { root =>
        val src = root + "/src/t"
        val m = root + "/mat/t"
        val o = orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val dim = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        Seq(col("o_orderkey") % 2 === 0, col("o_orderkey") % 2 =!= 0).foreach { slice =>
          TxLog.appendFlat(o.filter(slice), src)
          graft.sources.Materialize.refreshJoin(s, src, m, dim,
            "o_custkey", "c_custkey")
        }
      } + "/mat/t"
      graft.sources.Materialize.read(s, mat)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
    }),

    /** Dynamic partition pruning as a declared query (extension; plan
      * asserted in PlanShapeSpec): lineitem re-laid-out hive-partitioned by
      * return flag, joined to a filtered parquet dim — the runtime filter
      * prunes the fact scan to the surviving partition (1/3 of the bytes
      * here; the difference between reading one day and the whole table at
      * 100 TB). The oracle replays the join over the flat table.
      */
    "q132_dpp" -> ((s, dir) => {
      import s.implicits._
      val base = fixture("q132", dir) { root =>
        li(s, dir).select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
          .write.partitionBy("l_returnflag").parquet(s"$root/fact")
        Seq(("N", "keep"), ("A", "drop"), ("R", "drop")).toDF("flag", "tag")
          .write.parquet(s"$root/dim")
      }
      s.read.parquet(s"$base/fact")
        .join(s.read.parquet(s"$base/dim").filter(col("tag") === "keep"),
          col("l_returnflag") === col("flag"))
        .groupBy(col("l_returnflag"), col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),

    /** CDC APPLY CHANGES INTO (extension; [[graft.sources.TxLog
      * .applyChanges]]): a change feed with out-of-order sequences,
      * same-key upsert/delete races and fresh inserts folded into a
      * customer dimension in ONE commit — per key the highest (seq, op)
      * wins. The oracle replays the winner window + merge over the same
      * feed in SQL.
      */
    "q139_cdc_apply" -> ((s, dir) => {
      val path = fixture("q139", dir) { root =>
      val p = root + "/t"
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          (col("c_custkey") % 8).as("b"))
      TxLog.overwrite(base, p, "b")
      def cls(m: Int) = base.filter(col("k") % m === 0)
      val feed = cls(11).select(col("k"),
          concat(lit("U11:"), col("name")).as("name"), col("b"),
          lit(1L).as("seq"), lit("upsert").as("op"))
        .unionByName(cls(13).select(col("k"),
          lit(null).cast("string").as("name"), col("b"),
          lit(1L).as("seq"), lit("delete").as("op")))
        .unionByName(cls(17).select(col("k"),
          lit(null).cast("string").as("name"), col("b"),
          lit(1L).as("seq"), lit("delete").as("op")))
        .unionByName(cls(17).select(col("k"),
          concat(lit("U17:"), col("name")).as("name"), col("b"),
          lit(2L).as("seq"), lit("upsert").as("op")))
        .unionByName(cls(19).select(col("k"),
          concat(lit("U19:"), col("name")).as("name"), col("b"),
          lit(1L).as("seq"), lit("upsert").as("op")))
        .unionByName(cls(19).select(col("k"),
          lit(null).cast("string").as("name"), col("b"),
          lit(2L).as("seq"), lit("delete").as("op")))
        .unionByName(cls(23).select((col("k") + 1000000L).as("k"),
          lit("NEW").as("name"), col("b"),
          lit(1L).as("seq"), lit("upsert").as("op")))
      TxLog.applyChanges(feed, p, "b", Seq("k"), "seq", "op")
      } + "/t"
      TxLog.read(s, path).select(col("k"), col("name"), col("b"))
    }),

    /** Identity-column append (extension; [[graft.sources.TxLog
      * .appendWithIdentity]]): two batches land dense monotone row ids —
      * the start discovered from manifest stats (never a scan), the
      * assignment bucket-offset + within-bucket rank (no global sort).
      * The oracle replays both batches' global ranks.
      */
    "q141_identity_append" -> ((s, dir) => {
      val path = fixture("q141", dir) { root =>
        val p = root + "/t"
        val o = orders(s, dir).select(col("o_orderkey"))
        TxLog.appendWithIdentity(o.filter(col("o_orderkey") % 2 === 0), p,
          "row_id", expr("o_orderkey div 1000"), Seq("o_orderkey"))
        TxLog.appendWithIdentity(o.filter(col("o_orderkey") % 2 === 1), p,
          "row_id", expr("o_orderkey div 1000"), Seq("o_orderkey"))
      } + "/t"
      TxLog.read(s, path).select(col("o_orderkey"), col("row_id"))
    }),

    /** Metadata-only column rename / column mapping (extension; [[graft
      * .sources.TxLog.renameColumn]]): rename between two appends — zero
      * files rewritten, later appends land under the NEW logical name and
      * are physicalized back so every file in the table stays mutually
      * consistent. The read surfaces one unified logical schema; the oracle
      * replays the whole table with an alias.
      */
    "q148_column_rename" -> ((s, dir) => {
      val path = fixture("q148", dir) { root =>
        val p = root + "/t"
        val base = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_name").as("name"),
            (col("c_custkey") % 8).as("b"))
        TxLog.append(base.filter(col("k") % 2 === 0), p, "b")
        TxLog.renameColumn(s, p, "name", "customer_name")
        TxLog.append(base.filter(col("k") % 2 === 1)
          .withColumnRenamed("name", "customer_name"), p, "b")
      } + "/t"
      TxLog.read(s, path).select(col("k"), col("customer_name"), col("b"))
    }),

    /** Metadata-only DROP COLUMN (extension; [[graft.sources.TxLog
      * .dropColumn]]): drop between two appends — zero files rewritten, the
      * second append lands without the column, reads surface the narrowed
      * schema over BOTH file generations. The oracle replays the surviving
      * columns.
      */
    "q152_drop_column" -> ((s, dir) => {
      val path = fixture("q152", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
            col("o_totalprice").as("price"), (col("o_orderkey") % 8).as("b"))
        TxLog.append(base.filter(col("k") % 2 === 0), p, "b")
        TxLog.dropColumn(s, p, "prio")
        TxLog.append(base.filter(col("k") % 2 === 1).drop("prio"), p, "b")
      } + "/t"
      TxLog.read(s, path).select(col("k"), col("price"), col("b"))
    }),

    /** TIMESTAMP AS OF time travel (extension; [[graft.sources.TxLog
      * .versionAsOf]]): three commits, then a read pinned at the SECOND
      * commit's wall-clock — the third batch must be invisible. Resolution
      * is deterministic even on coarse-mtime filesystems: `history()`
      * monotonicizes same-stamp commits in version order, so the pinned
      * timestamp maps to exactly v1; the oracle replays the first two
      * batches.
      */
    "q153_time_travel_ts" -> ((s, dir) => {
      val path = fixture("q153", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
            (col("o_orderkey") % 8).as("b"))
        TxLog.append(base.filter(col("k") % 3 === 0), p, "b")
        TxLog.append(base.filter(col("k") % 3 === 1), p, "b")
        TxLog.append(base.filter(col("k") % 3 === 2), p, "b")
      } + "/t"
      val t1 = TxLog.history(s, path).find(_._1 == 1L).get._2
      TxLog.read(s, path, TxLog.versionAsOf(s, path, t1).get)
        .select(col("k"), col("price"), col("b"))
    }),

    /** Generated partition column (extension; [[graft.sources.TxLog
      * .setGeneratedColumn]]): the batch arrives WITHOUT the day column —
      * the table computes it from the declared expression and partitions by
      * it, the Delta generated-partition pattern that gives date-pruned
      * layouts without trusting writers. The oracle replays the expression.
      */
    "q155_generated_partition" -> ((s, dir) => {
      val path = fixture("q155", dir) { root =>
        val p = root + "/t"
        TxLog.setGeneratedColumn(s, p, "day", "ts_us div 86400000000")
        val base = Tables.events(s, dir).select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("ts_us"), col("value"))
        TxLog.append(base, p, "day")
      } + "/t"
      TxLog.read(s, path)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("day"))
    }),

    /** Partition-layout EVOLUTION (extension; the Iceberg capability Delta
      * lacks): era-1 batches land partitioned by month, era-2 by region —
      * zero rewrites, and a key-scoped read on the NEW layout prunes era-2
      * files through the manifest while era-1 files (which cannot prove
      * absence from their paths) are read with the residual filter keeping
      * the result exact ([[graft.sources.TxLog.keyFiles]] mixed-era
      * semantics). At 100 TB this is how a table re-partitions under a new
      * query pattern without an O(table) rewrite.
      */
    "q182_partition_evolution" -> ((s, dir) => {
      val path = fixture("q182", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 12).as("month"),
          (col("o_custkey") % 5).as("region"), col("o_totalprice").as("price"))
        TxLog.append(base.filter(col("o_orderkey") % 2 === 0), p, "month")
        TxLog.append(base.filter(col("o_orderkey") % 2 === 1), p, "region")
      } + "/t"
      TxLog.readKey(s, path, "region", 3)
        .select(col("o_orderkey"), col("month").cast("long").as("month"),
          col("region").cast("long").as("region"), col("price"))
    }),

    /** Parquet aggregate pushdown (extension): a bare MIN/MAX/COUNT over
      * the fact table answered from footer STATISTICS — the scan node
      * carries `PushedAggregation` and reads no data pages (plan-guarded).
      * The 100 TB shape: table-level profiling that costs O(footers), not
      * O(bytes). Requires the V2 parquet reader (the pushdown rule lives in
      * V2ScanRelationPushDown; under the default V1 path the conf is
      * inert), so the read — and only this read — resolves with parquet
      * removed from `useV1SourceList`; the flag is restored immediately,
      * every other query keeps the stock reader.
      */
    "q183_agg_pushdown" -> ((s, dir) => {
      s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val saved = s.conf.get("spark.sql.sources.useV1SourceList")
      s.conf.set("spark.sql.sources.useV1SourceList", "")
      try {
        s.read.parquet(s"$dir/lineitem.parquet").agg(
          count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
      } finally s.conf.set("spark.sql.sources.useV1SourceList", saved)
    }),

    /** EXACTLY-ONCE ingest under replay (extension;
      * [[graft.sources.TxLog.appendOnce]] — Delta's txnAppId/txnVersion
      * SetTransaction contract): three order batches land through an
      * idempotent writer whose delivery sequence REPLAYS batch 1 twice —
      * once immediately (the foreachBatch crash-restart shape) and once
      * after an OPTIMIZE compaction (the watermark must survive full
      * rewrites) — plus a rewound batch 0. The `@txn:` watermark rides the
      * same manifest swap as the data, so marker and rows are atomic; the
      * oracle is simply every order ONCE. At 100 TB: restart recovery costs
      * one manifest read, never a read-side dedup pass over the table.
      */
    "q184_exactly_once" -> ((s, dir) => {
      val path = fixture("q184", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 6).as("session_key"),
          col("o_totalprice").as("price"))
        def slice(b: Int) = b match {
          case 0 => base.filter(col("o_orderkey") < 5000)
          case 1 => base.filter(col("o_orderkey") >= 5000 && col("o_orderkey") < 10000)
          case _ => base.filter(col("o_orderkey") >= 10000)
        }
        def once(b: Int, v: Long) = TxLog.appendOnce(slice(b), p, "ingest", v,
          partitionCol = Some("session_key"))
        once(0, 0L)
        once(1, 1L)
        once(1, 1L) // crash-restart replay
        TxLog.compact(s, p, partitionCol = "session_key")
        once(1, 1L) // replay across OPTIMIZE
        once(0, 0L) // rolled-back checkpoint
        once(2, 2L)
      } + "/t"
      TxLog.read(s, path).select(
        col("o_orderkey"), col("session_key").cast("long").as("session_key"),
        col("price"))
    }),

    /** MERGE WITH SCHEMA EVOLUTION (extension; Delta `autoMerge` — the
      * [[graft.sources.TxLog.mergeKeys]] opt-in): one merge both upserts
      * rows AND widens the table with a column the base never had —
      * updated/inserted rows carry `discount`, survivors read NULL, and
      * the widened schema commits in the SAME manifest swap as the rows
      * (untouched partitions stay on the old file schema and widen through
      * the merged read, the S5 drift path). Off by default — silent
      * widening hides upstream bugs; the spec pins the strict-mode
      * failure.
      */
    "q189_merge_evolution" -> ((s, dir) => {
      val path = fixture("q189", dir) { root =>
        val p = root + "/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 10).as("session_key"),
          col("o_totalprice").as("price"))
        TxLog.append(base, p, "session_key")
        val updated = base
          .filter(col("session_key") === 3 && col("o_orderkey") % 20 === 3)
          .withColumn("price", col("price") * 2)
          .withColumn("discount", lit("PROMO"))
        val inserted = base.filter(col("o_orderkey") % 20 === 3)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit(3L).as("session_key"), lit(1.0).as("price"),
            lit("PROMO").as("discount"))
        TxLog.mergeKeys(updated.unionByName(inserted), p, "session_key",
          Seq("o_orderkey"), allowSchemaEvolution = true)
      } + "/t"
      TxLog.readMerged(s, path).select(
        col("o_orderkey"), col("session_key").cast("long").as("session_key"),
        col("price"), col("discount"))
    }),

    /** CDF-driven incremental view maintenance (extension;
      * [[graft.sources.Materialize.refreshViaCdf]] — the Gupta–Mumick
      * delta rule WITH deletions): the per-session count/sum summary stays
      * incremental across two appends, a key-scoped REPLACE (doubling
      * session 3), and a row-level DV DELETE — the exact mutations that
      * force [[graft.sources.Materialize.refresh]] into a full recompute.
      * Signed deltas come from the manifest-aware row-level CDC diff;
      * decimal accumulators make subtraction exact; keys draining to zero
      * leave the state. The final materialization must equal the plain
      * GROUP BY of the surviving rows.
      */
    "q196_ivm_cdf" -> ((s, dir) => {
      val mat = fixture("q196", dir) { root =>
        val src = root + "/src/t"
        val m = root + "/mat/t"
        val base = orders(s, dir).select(
          col("o_orderkey"), (col("o_orderkey") % 8).as("session_key"),
          col("o_totalprice").as("price"))
        def up(): Unit = { graft.sources.Materialize.refreshViaCdf(
          s, src, m, keyCols = Seq("session_key"), sumCols = Seq("price")); () }
        TxLog.append(base.filter(col("o_orderkey") < 7500), src, "session_key")
        up()
        TxLog.append(base.filter(col("o_orderkey") >= 7500), src, "session_key")
        up()
        TxLog.replaceKeys(base.filter(col("session_key") === 3)
          .withColumn("price", col("price") * 2), src, "session_key")
        up()
        TxLog.deleteWhere(s, src, "o_orderkey % 100 = 7")
        up()
      } + "/mat/t"
      graft.sources.Materialize.read(s, mat).select(
        col("session_key").cast("long").as("session_key"),
        col("__cnt").as("n_orders"),
        round(col("sum_price"), 2).as("sum_price"))
    }),

    /** SQL surface for the transaction-log format ([[graft.GraftExtensions]]
      * `graft_table` table-valued function, the engine-side analogue of the
      * warehouse tables the reference's dbt models select from,
      * `dbt/models/staging/stg_openf1_laps.sql:1-15`): the TVF splices the
      * snapshot's ANALYZED plan in during resolution, so a plain parquet
      * relation (+ the deletion-vector anti-join) is what Catalyst optimizes
      * — the `k < 12000` predicate lands in PushedFilters, column pruning
      * reaches the scan, and the v2 DV delete is applied. Plan shape is
      * asserted in GraftExtensionsSpec.
      */
    "q207_sql_table_function" -> ((s, dir) => {
      val path = sqlTvfFixture(s, dir)
      graft.GraftExtensions.register(s)
      s.sql(s"SELECT k, price, b FROM graft_table('$path') WHERE k < 12000")
    }),

    /** SQL time travel over the tx log, both spellings: by version
      * (`graft_table(p, 1)`) and by commit timestamp (`graft_table_at(p,
      * ts)` — Delta's TIMESTAMP AS OF): the two legs pin the SAME snapshot
      * (version 1's commit stamp resolves back to version 1), so the union
      * returns each pre-delete row twice, tagged by route. The v2 deletion
      * vector must be invisible to both.
      */
    "q208_sql_time_travel" -> ((s, dir) => {
      val path = sqlTvfFixture(s, dir)
      graft.GraftExtensions.register(s)
      val t1 = TxLog.history(s, path).find(_._1 == 1L).get._2
      s.sql(
        s"""SELECT 'v' AS src, k, price, b FROM graft_table('$path', 1)
           |UNION ALL
           |SELECT 't' AS src, k, price, b FROM graft_table_at('$path', $t1)""".stripMargin)
    }),

    /** Row-level change-data feed via SQL (`graft_table_changes(p, 0)` —
      * Delta's `table_changes`): v0→current spans the v1 append and the v2
      * DV delete, so the feed carries BOTH tags — v1 rows that survived the
      * delete as `insert`, v0 rows the delete masked as `delete`; a v1 row
      * deleted at v2 cancels (never visible across the span). Manifest-aware:
      * only files the span's commits added/removed are read, never the
      * unchanged remainder ([[graft.sources.TxLog.rowChanges]]).
      */
    "q209_sql_table_changes" -> ((s, dir) => {
      val path = sqlTvfFixture(s, dir)
      graft.GraftExtensions.register(s)
      s.sql(s"""SELECT change, k, price, CAST(b AS BIGINT) AS b
               |FROM graft_table_changes('$path', 0)""".stripMargin)
    }),

    /** Manifest-pruned SQL point read (`graft_table_key` — [[graft.sources
      * .TxLog.readKey]] through the TVF surface): only files whose
      * partition-path segment can hold `b = 5` are handed to the reader —
      * no directory listing, no footer reads outside the candidate set —
      * and the v2 deletion vector still applies. The residual cast-compare
      * keeps the result exact under partition-layout evolution
      * (pre-partition-era files are read too). Spec asserts the pruned
      * file count; the DuckDB oracle replays the predicate relationally.
      */
    "q213_sql_table_key" -> ((s, dir) => {
      val path = sqlTvfFixture(s, dir)
      graft.GraftExtensions.register(s)
      s.sql(s"SELECT k, price, b FROM graft_table_key('$path', 'b', 5)")
    }),

    /** Stats-skipped SQL range read (`graft_table_range` — [[graft.sources
      * .TxLog.readRange]] through the TVF surface): only files whose
      * recorded [min, max] for `k` intersects [1000, 5000] reach the
      * reader (the fixture's appends collect per-file `k` stats), the
      * inclusive residual keeps the result exact whatever the stats
      * pruned, and the DV delete applies. At 100 TB this is the
      * time/key-range query touching O(matching files), not O(table), from
      * plain SQL.
      */
    "q214_sql_table_range" -> ((s, dir) => {
      val path = sqlTvfFixture(s, dir)
      graft.GraftExtensions.register(s)
      s.sql(s"SELECT k, price, b FROM graft_table_range('$path', 'k', 1000, 5000)")
    })
  )

  /** Shared fixture for the SQL-TVF family (q207/q208/q209/q213/q214): one
    * tx table, three commits — append k%3=0 (v0), append k%3=1 (v1),
    * DV-delete k%10=4 (v2) — partitioned by `b = k % 8`, per-file min/max
    * stats on `k` (the q214 skipping column).
    */
  /** q44's memoized table (shared with q227's drift audit): append all
    * sessions but 3, replace-insert session 3 (doubled price), replace
    * session 4 (negated price) — versions 1..3.
    */
  private def q44Fixture(s: SparkSession, dir: String): String =
    fixture("q44", dir) { root =>
      val p = root + "/t"
      val base = orders(s, dir).select(
        col("o_orderkey"), (col("o_orderkey") % 20).as("session_key"),
        col("o_totalprice").as("price"))
      TxLog.append(base.filter(col("session_key") =!= 3), p, "session_key")
      TxLog.replaceKeys(base.filter(col("session_key") === 3)
        .withColumn("price", col("price") * 2), p, "session_key")
      TxLog.replaceKeys(base.filter(col("session_key") === 4)
        .withColumn("price", -col("price")), p, "session_key")
    } + "/t"

  private def sqlTvfFixture(s: SparkSession, dir: String): String =
    fixture("q207sql", dir) { root =>
      val p = root + "/t"
      val base = orders(s, dir).select(
        col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        (col("o_orderkey") % 8).as("b"))
      TxLog.append(base.filter(col("k") % 3 === 0), p, "b", statsCols = Seq("k"))
      TxLog.append(base.filter(col("k") % 3 === 1), p, "b", statsCols = Seq("k"))
      TxLog.deleteWhere(s, p, "k % 10 = 4")
    } + "/t"

  val oracleSql: Map[String, String] = Map(

    "q220_csv_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       epoch_us(o_orderdate::TIMESTAMP) AS odate_us,
        |       o_orderpriority || ', "q"' || chr(10) || 'line2' AS tricky
        |FROM orders""".stripMargin,

    "q182_partition_evolution" ->
      """SELECT o_orderkey, CAST(o_orderkey % 12 AS BIGINT) AS month,
        |       CAST(o_custkey % 5 AS BIGINT) AS region,
        |       o_totalprice AS price
        |FROM orders WHERE o_custkey % 5 = 3""".stripMargin,

    "q183_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin,

    "q184_exactly_once" ->
      """SELECT o_orderkey, o_orderkey % 6 AS session_key,
        |       o_totalprice AS price
        |FROM orders""".stripMargin,

    "q196_ivm_cdf" ->
      """SELECT o_orderkey % 8 AS session_key,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(CASE WHEN o_orderkey % 8 = 3 THEN o_totalprice * 2
        |                 ELSE o_totalprice END), 2) AS sum_price
        |FROM orders
        |WHERE o_orderkey % 100 <> 7
        |GROUP BY 1""".stripMargin,

    "q189_merge_evolution" ->
      """SELECT o_orderkey, o_orderkey % 10 AS session_key,
        |  CASE WHEN o_orderkey % 20 = 3 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS price,
        |  CASE WHEN o_orderkey % 20 = 3 THEN 'PROMO' END AS discount
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 10000000, 3 AS session_key, 1.0 AS price,
        |       'PROMO' AS discount
        |FROM orders WHERE o_orderkey % 20 = 3""".stripMargin,

    "q44_tx_replace" ->
      """SELECT o_orderkey, o_orderkey % 20 AS session_key,
        |  CASE WHEN o_orderkey % 20 = 3 THEN o_totalprice * 2
        |       WHEN o_orderkey % 20 = 4 THEN -o_totalprice
        |       ELSE o_totalprice END AS price
        |FROM orders""".stripMargin,

    // version 0 = the initial load (session 3 absent); current = q44's
    // final CASE state; per-column stats replayed for both sides
    "q227_snapshot_drift" -> {
      def stats(table: String, tag: String): String =
        Seq("o_orderkey", "session_key", "price").map { c =>
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_$tag,
             |    CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS nulls_$tag,
             |    CAST(count(DISTINCT $c) AS BIGINT) AS ndv_$tag,
             |    min($c) AS min_$tag, max($c) AS max_$tag
             |  FROM $table""".stripMargin
        }.mkString("\n  UNION ALL ")
      s"""WITH before_t AS (
         |  SELECT o_orderkey::DOUBLE AS o_orderkey,
         |         (o_orderkey % 20)::DOUBLE AS session_key,
         |         o_totalprice::DOUBLE AS price
         |  FROM orders WHERE o_orderkey % 20 <> 3),
         |after_t AS (
         |  SELECT o_orderkey::DOUBLE AS o_orderkey,
         |         (o_orderkey % 20)::DOUBLE AS session_key,
         |         (CASE WHEN o_orderkey % 20 = 3 THEN o_totalprice * 2
         |               WHEN o_orderkey % 20 = 4 THEN -o_totalprice
         |               ELSE o_totalprice END)::DOUBLE AS price
         |  FROM orders),
         |pb AS (
         |  ${stats("before_t", "before")}),
         |pa AS (
         |  ${stats("after_t", "after")})
         |SELECT pb.col_name, n_before, nulls_before, ndv_before, min_before,
         |  max_before, n_after, nulls_after, ndv_after, min_after, max_after,
         |  n_after - n_before AS row_delta,
         |  (min_after < min_before OR max_after > max_before) AS range_expanded
         |FROM pb JOIN pa ON pa.col_name = pb.col_name""".stripMargin
    },

    // the monitor table's three audit row-sets replayed as full-rescan
    // profile merges over the cumulative %3 splits (data versions are
    // deterministic on a fresh table: 0, 1, 2); v0's before side is NULL
    "q244_drift_monitor" -> {
      def prof(table: String, alias: String): String =
        Seq("k", "price").map { c =>
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS nulls,
             |    CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             |    min($c) AS mn, max($c) AS mx
             |  FROM $table""".stripMargin
        }.mkString("\n  UNION ALL ")
      s"""WITH c0 AS (SELECT o_orderkey::DOUBLE AS k, o_totalprice::DOUBLE AS price
         |            FROM orders WHERE o_orderkey % 3 = 0),
         |c1 AS (SELECT o_orderkey::DOUBLE AS k, o_totalprice::DOUBLE AS price
         |       FROM orders WHERE o_orderkey % 3 IN (0, 1)),
         |c2 AS (SELECT o_orderkey::DOUBLE AS k, o_totalprice::DOUBLE AS price
         |       FROM orders),
         |p0 AS (${prof("c0", "p0")}),
         |p1 AS (${prof("c1", "p1")}),
         |p2 AS (${prof("c2", "p2")})
         |SELECT p0.col_name,
         |  CAST(NULL AS BIGINT) AS n_before, CAST(NULL AS BIGINT) AS nulls_before,
         |  CAST(NULL AS BIGINT) AS ndv_before, CAST(NULL AS DOUBLE) AS min_before,
         |  CAST(NULL AS DOUBLE) AS max_before,
         |  p0.n AS n_after, p0.nulls AS nulls_after, p0.ndv AS ndv_after,
         |  p0.mn AS min_after, p0.mx AS max_after,
         |  CAST(NULL AS BIGINT) AS row_delta, CAST(NULL AS BOOLEAN) AS range_expanded,
         |  CAST(0 AS BIGINT) AS data_version
         |FROM p0
         |UNION ALL
         |SELECT p1.col_name, p0.n, p0.nulls, p0.ndv, p0.mn, p0.mx,
         |  p1.n, p1.nulls, p1.ndv, p1.mn, p1.mx,
         |  p1.n - p0.n, (p1.mn < p0.mn OR p1.mx > p0.mx), CAST(1 AS BIGINT)
         |FROM p1 JOIN p0 ON p0.col_name = p1.col_name
         |UNION ALL
         |SELECT p2.col_name, p1.n, p1.nulls, p1.ndv, p1.mn, p1.mx,
         |  p2.n, p2.nulls, p2.ndv, p2.mn, p2.mx,
         |  p2.n - p1.n, (p2.mn < p1.mn OR p2.mx > p1.mx), CAST(2 AS BIGINT)
         |FROM p2 JOIN p1 ON p1.col_name = p2.col_name""".stripMargin
    },

    "q64_tx_merge" ->
      """SELECT o_orderkey, o_orderkey % 20 AS session_key,
        |  CASE WHEN o_orderkey % 20 = 5 AND o_orderkey % 2 = 0
        |       THEN o_totalprice * 2 ELSE o_totalprice END AS price
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 10000000, 5 AS session_key, 1.0 AS price
        |FROM orders
        |WHERE o_orderkey % 20 = 5 AND o_orderkey % 2 = 1""".stripMargin,

    "q65_tx_schema_drift" ->
      """SELECT o_orderkey, o_orderkey % 10 AS session_key,
        |       o_totalprice AS price,
        |       CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice * 2 END AS discounted
        |FROM orders""".stripMargin,

    "q69_tx_data_skipping" ->
      """SELECT o_orderkey, o_orderkey % 8 AS session_key, o_totalprice AS price
        |FROM orders
        |WHERE o_orderkey BETWEEN 6000 AND 9000""".stripMargin,

    "q72_zorder_key" ->
      s"""SELECT o_orderkey,
         |  ${graft.functions.ZOrder.zValueSql("(o_orderkey & 1023)",
              "(CAST(floor(o_totalprice) AS BIGINT) & 1023)", 10)} AS zval
         |FROM orders""".stripMargin,

    "q74_incremental_agg" ->
      """SELECT o_orderkey % 8 AS session_key,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,

    "q81_tx_row_cdc" ->
      """SELECT 'insert' AS change, o_orderkey, CAST(3 AS BIGINT) AS session_key,
        |       o_totalprice * 2 AS price
        |FROM orders WHERE o_orderkey % 40 = 3
        |UNION ALL
        |SELECT 'delete' AS change, o_orderkey, CAST(3 AS BIGINT) AS session_key,
        |       o_totalprice AS price
        |FROM orders WHERE o_orderkey % 40 = 3""".stripMargin,

    "q91_bloom_store" ->
      """WITH batch AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey
        |              ELSE o_orderkey + 7777777 END AS o_orderkey,
        |         o_totalprice
        |  FROM orders)
        |SELECT b.o_orderkey, b.o_totalprice
        |FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM orders c WHERE c.o_orderkey = b.o_orderkey)""".stripMargin,

    "q95_cms_incremental" -> countMinOracleSql,

    "q97_zorder_compact" ->
      """SELECT o_orderkey, o_orderkey & 1023 AS x,
        |       CAST(floor(o_totalprice) AS BIGINT) & 1023 AS y, o_totalprice
        |FROM orders
        |WHERE (CAST(floor(o_totalprice) AS BIGINT) & 1023) BETWEEN 0 AND 63""".stripMargin,

    "q103_scd2" ->
      s"""WITH $scd2Cte
         |SELECT k AS c_custkey, segment, valid_from, valid_to,
         |       (valid_to IS NULL) AS is_current
         |FROM scd""".stripMargin,

    "q107_bloom_point" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey = (SELECT min(o_custkey) FROM orders)""".stripMargin,

    "q114_delete_vectors" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders
        |WHERE NOT (o_totalprice < 50000 AND o_orderpriority = '1-URGENT')
        |  AND NOT (o_orderkey % 7 = 0)
        |GROUP BY 1""".stripMargin,

    "q117_update_vectors" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CASE WHEN o_orderpriority = '5-LOW'
        |              THEN o_totalprice * CAST(1.1 AS DOUBLE)
        |              ELSE o_totalprice END AS price
        |  FROM orders
        |  WHERE NOT (o_orderkey % 5 = 0))
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       max(price) AS max_price
        |FROM u GROUP BY 1""".stripMargin,

    "q119_scd2_join" ->
      s"""WITH $scd2Cte,
         |f AS (SELECT o_orderkey, o_custkey, o_orderkey % 30 AS t FROM orders)
         |SELECT s.segment, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(f.o_orderkey) AS BIGINT) AS key_sum
         |FROM f LEFT JOIN scd s
         |  ON s.k = f.o_custkey AND s.valid_from <= f.t
         |     AND (s.valid_to IS NULL OR s.valid_to > f.t)
         |GROUP BY 1""".stripMargin,

    "q120_hll_incremental" -> {
      val p = graft.operators.TextDedup.hashParams(1).head
      s"""WITH h AS (
         |  SELECT o_orderpriority,
         |         (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 7))::BIGINT
         |            * ${p.a} + ${p.b}) % 2147483647 AS h
         |  FROM orders),
         |rr AS (SELECT o_orderpriority, h & 63 AS reg,
         |         CASE WHEN (h >> 6) = 0 THEN 26
         |              ELSE CAST(round(log2((h >> 6) & -(h >> 6))) AS INT) + 1
         |         END AS rho
         |       FROM h),
         |regs AS (SELECT o_orderpriority, reg, max(rho) AS max_rho
         |         FROM rr GROUP BY 1, 2),
         |e AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_regs,
         |        sum(CAST(1 AS DOUBLE) / CAST(1 << max_rho AS DOUBLE)) AS pinv
         |      FROM regs GROUP BY 1),
         |x AS (SELECT o_orderpriority,
         |        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
         |      FROM orders GROUP BY 1)
         |SELECT e.o_orderpriority, e.n_regs,
         |       CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |         / (e.pinv + CAST(64 - e.n_regs AS DOUBLE)) AS hll_est,
         |       x.n_exact
         |FROM e JOIN x USING (o_orderpriority)""".stripMargin
    },

    "q123_incremental_join" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY 1""".stripMargin,

    "q132_dpp" ->
      """WITH dim AS (SELECT * FROM (VALUES ('N', 'keep'), ('A', 'drop'),
        |                                   ('R', 'drop')) AS t(flag, tag))
        |SELECT l.l_returnflag, d.tag, CAST(count(*) AS BIGINT) AS n,
        |       sum(l.l_quantity) AS sum_qty
        |FROM lineitem l JOIN dim d ON d.flag = l.l_returnflag
        |WHERE d.tag = 'keep'
        |GROUP BY 1, 2""".stripMargin,

    "q139_cdc_apply" ->
      """WITH base AS (SELECT c_custkey AS k, c_name AS name,
        |                     c_custkey % 8 AS b
        |              FROM customer),
        |feed AS (
        |  SELECT k, 'U11:' || name AS name, b, 1 AS seq, 'upsert' AS op
        |  FROM base WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT k, CAST(NULL AS VARCHAR), b, 1, 'delete'
        |  FROM base WHERE k % 13 = 0
        |  UNION ALL
        |  SELECT k, CAST(NULL AS VARCHAR), b, 1, 'delete'
        |  FROM base WHERE k % 17 = 0
        |  UNION ALL
        |  SELECT k, 'U17:' || name, b, 2, 'upsert'
        |  FROM base WHERE k % 17 = 0
        |  UNION ALL
        |  SELECT k, 'U19:' || name, b, 1, 'upsert'
        |  FROM base WHERE k % 19 = 0
        |  UNION ALL
        |  SELECT k, CAST(NULL AS VARCHAR), b, 2, 'delete'
        |  FROM base WHERE k % 19 = 0
        |  UNION ALL
        |  SELECT k + 1000000, 'NEW', b, 1, 'upsert'
        |  FROM base WHERE k % 23 = 0),
        |win AS (SELECT k, name, b, op FROM (
        |          SELECT k, name, b, seq, op,
        |                 row_number() OVER (PARTITION BY k
        |                   ORDER BY seq DESC, op DESC) AS rn
        |          FROM feed) WHERE rn = 1)
        |SELECT b.k, b.name, b.b
        |FROM base b WHERE NOT EXISTS (SELECT 1 FROM win w WHERE w.k = b.k)
        |UNION ALL
        |SELECT k, name, b FROM win WHERE op = 'upsert'""".stripMargin,

    "q141_identity_append" ->
      """WITH b1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0),
        |r1 AS (SELECT o_orderkey,
        |         CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT)
        |           AS row_id
        |       FROM b1),
        |b2 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 1),
        |r2 AS (SELECT o_orderkey,
        |         (SELECT max(row_id) FROM r1)
        |           + CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT)
        |           AS row_id
        |       FROM b2)
        |SELECT o_orderkey, row_id FROM r1
        |UNION ALL
        |SELECT o_orderkey, row_id FROM r2""".stripMargin,

    "q148_column_rename" ->
      """SELECT c_custkey AS k, c_name AS customer_name, c_custkey % 8 AS b
        |FROM customer""".stripMargin,

    "q152_drop_column" ->
      """SELECT o_orderkey AS k, o_totalprice AS price, o_orderkey % 8 AS b
        |FROM orders""".stripMargin,

    "q153_time_travel_ts" ->
      """SELECT o_orderkey AS k, o_totalprice AS price, o_orderkey % 8 AS b
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1)""".stripMargin,

    "q155_generated_partition" ->
      """SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value,
        |       epoch_us(ts::TIMESTAMP) // 86400000000 AS day
        |FROM events""".stripMargin,

    // current snapshot = both appends minus the DV delete, filter applied
    "q207_sql_table_function" ->
      """SELECT o_orderkey AS k, o_totalprice AS price, o_orderkey % 8 AS b
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4
        |  AND o_orderkey < 12000""".stripMargin,

    // both time-travel spellings pin version 1: pre-delete contents, twice
    "q208_sql_time_travel" ->
      """SELECT 'v' AS src, o_orderkey AS k, o_totalprice AS price,
        |       o_orderkey % 8 AS b
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |UNION ALL
        |SELECT 't' AS src, o_orderkey AS k, o_totalprice AS price,
        |       o_orderkey % 8 AS b
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)""".stripMargin,

    // v0→v2 feed: v1 rows surviving the delete insert; masked v0 rows
    // delete; v1 rows deleted at v2 cancel inside the span
    "q209_sql_table_changes" ->
      """SELECT 'insert' AS change, o_orderkey AS k, o_totalprice AS price,
        |       CAST(o_orderkey % 8 AS BIGINT) AS b
        |FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 10 <> 4
        |UNION ALL
        |SELECT 'delete' AS change, o_orderkey AS k, o_totalprice AS price,
        |       CAST(o_orderkey % 8 AS BIGINT) AS b
        |FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 10 = 4""".stripMargin,

    // point read: partition predicate + survivors of the DV delete
    "q213_sql_table_key" ->
      """SELECT o_orderkey AS k, o_totalprice AS price, o_orderkey % 8 AS b
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4
        |  AND o_orderkey % 8 = 5""".stripMargin,

    // range read: inclusive bounds + survivors of the DV delete
    "q214_sql_table_range" ->
      """SELECT o_orderkey AS k, o_totalprice AS price, o_orderkey % 8 AS b
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 <> 4
        |  AND o_orderkey BETWEEN 1000 AND 5000""".stripMargin
  )
}
