package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** Incremental materialized-aggregate maintenance over a [[TxLog]] table —
  * the warehouse pattern that keeps a 100 TB pipeline from recomputing its
  * summary tables per batch: a grouped count/sum materialization is refreshed
  * by reading ONLY the files the source log added since the last refresh
  * (manifest diff, [[TxLog.changesBetween]]), partial-aggregating them, and
  * merging into the existing state by key. Count and sum are the
  * self-maintainable aggregates (decomposable with an inverse-free merge);
  * min/max/avg-of derive from them or need full recompute on deletes — the
  * classic incremental-view-maintenance taxonomy (Gupta & Mumick 1995).
  *
  * Exactly-once across crashes WITHOUT a two-phase marker: the source
  * version the state reflects rides IN the materialization as a constant
  * `__src_version` column, committed in the same single manifest swap as the
  * data — there is no window where state and watermark disagree. The
  * version is read back metadata-only via the stats triples
  * ([[TxLog.fastCount]]'s machinery), falling back to a scan for stat-less
  * files. A non-append-only source change (replace/merge/compact removed
  * files) is detected from the diff and triggers an honest full recompute.
  */
object Materialize {

  final case class Refresh(srcVersion: Long, incremental: Boolean)

  private val SrcVersionCol = "__src_version"

  /** Source version the materialization currently reflects, metadata-only
    * when possible; -1 for an empty/uninitialized materialization.
    */
  def sourceVersion(spark: SparkSession, matPath: String): Long = {
    val s = TxLog.snapshot(spark, matPath)
    if (s.files.isEmpty) return -1L
    val fromStats = s.files.map(f => s.statsFor(f, SrcVersionCol).map(_._2.toLong))
    if (fromStats.forall(_.isDefined)) fromStats.flatten.max
    else TxLog.read(spark, matPath).agg(max(col(SrcVersionCol))).collect()(0).getLong(0)
  }

  /** Exact-accumulation scale for floating-point sum columns: a double/float
    * `sum_<c>` is kept as DECIMAL(38,6) in the stored state so the merge of
    * per-batch partials is EXACT and therefore order-independent — an
    * incrementally maintained sum must equal the single-pass sum bit-for-bit,
    * not merely to within IEEE reassociation drift.
    */
  private val SumScale = DecimalType(38, 6)

  /** Stored state with bookkeeping dropped but accumulator types intact —
    * the merge path MUST re-aggregate decimals, not their double casts.
    */
  private def readRaw(spark: SparkSession, matPath: String): DataFrame =
    TxLog.read(spark, matPath).drop(SrcVersionCol)

  /** The materialized aggregate, without bookkeeping columns. Floating-point
    * sum columns (accumulated exactly as DECIMAL(38,6) internally) surface
    * as the doubles the caller handed in.
    */
  def read(spark: SparkSession, matPath: String): DataFrame = {
    val raw = readRaw(spark, matPath)
    val casts = raw.schema.fields.collect {
      case f if f.name.startsWith("sum_") && f.dataType.isInstanceOf[DecimalType] =>
        f.name
    }.toSet
    if (casts.isEmpty) raw
    else raw.select(raw.columns.map(c =>
      if (casts(c)) col(c).cast(DoubleType).as(c) else col(c)): _*)
  }

  /** Bring `matPath` up to date with `sourcePath`'s current version:
    * per-key `__cnt` plus `sum_<c>` for every `sumCols` column and
    * `max_<c>` for every `maxCols` column. Append-only source growth merges
    * only the added files; anything else (first build, removed files)
    * recomputes from the full snapshot. Refreshing an already-current
    * materialization is a no-op.
    *
    * `max` is self-maintainable for INSERTS only (max merges by max; it has
    * no inverse) — which is exactly the contract here: deletes arrive as a
    * non-append-only diff and trigger the honest full recompute, same as
    * count/sum under the Gupta–Mumick taxonomy. Monotone sketch states
    * (HyperLogLog registers — [[graft.operators.Sketches.hllRefresh]])
    * ride this.
    *
    * `prep` maps source ROWS to the rows actually aggregated (default
    * identity) — the hook that lets any per-row expansion ride the same
    * incremental machinery: exploding tokens, count-min (row, cell) pairs
    * ([[graft.operators.Sketches.countMinRefresh]]), n-gram emission. It
    * must be a PER-ROW map (each source row's contribution independent of
    * the rest), which is exactly what makes the aggregate self-maintainable.
    */
  def refresh(spark: SparkSession, sourcePath: String, matPath: String,
              keyCols: Seq[String], sumCols: Seq[String],
              prep: DataFrame => DataFrame = identity,
              maxCols: Seq[String] = Nil): Refresh = {
    val vNow = TxLog.currentVersion(spark, sourcePath)
    if (vNow < 0) return Refresh(-1L, incremental = false)
    val vLast = sourceVersion(spark, matPath)
    if (vLast == vNow) return Refresh(vNow, incremental = true)

    def aggOf(df: DataFrame): DataFrame = {
      val p = prep(df)
      val floating = p.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }.toSet
      // float/double sums accumulate as DECIMAL(38,6): exact, so the
      // incremental merge is order-independent (see SumScale)
      def sumOf(c: String) =
        if (floating(c)) sum(col(c).cast(SumScale)).as(s"sum_$c")
        else sum(col(c)).as(s"sum_$c")
      p.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__cnt"),
          sumCols.map(sumOf) ++
            maxCols.map(c => max(col(c)).as(s"max_$c")): _*)
    }

    val (added, removed) = TxLog.changesBetween(spark, sourcePath, vLast, vNow)
    val incremental = vLast >= 0 && removed.isEmpty
    // file-less version bumps (empty-batch appends) change nothing: the
    // state already reflects every live file, so skip the rewrite — the
    // recorded version stays vLast and the next diff is still correct
    if (incremental && added.isEmpty) return Refresh(vNow, incremental = true)
    if (!incremental && TxLog.snapshot(spark, sourcePath, vNow).files.isEmpty)
      return Refresh(vNow, incremental = false)
    val next =
      if (!incremental) aggOf(TxLog.read(spark, sourcePath, vNow))
      else {
        val delta = aggOf(TxLog.readAddedSince(spark, sourcePath, vLast, vNow))
        val merged = readRaw(spark, matPath).unionByName(delta)
        merged.groupBy(keyCols.map(col): _*)
          .agg(sum(col("__cnt")).as("__cnt"),
            sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
              maxCols.map(c => max(col(s"max_$c")).as(s"max_$c")): _*)
      }
    TxLog.overwriteFlat(next.withColumn(SrcVersionCol, lit(vNow)), matPath,
      statsCols = Seq(SrcVersionCol))
    Refresh(vNow, incremental)
  }

  /** CDF-driven incremental maintenance — the Gupta–Mumick delta rule WITH
    * deletions: where [[refresh]] falls back to a full recompute the moment
    * a source commit removes files (replace, MERGE, DV delete, UPDATE),
    * this path stays incremental by applying SIGNED row deltas from
    * [[TxLog.rowChanges]] — inserts add, deletes subtract. Count and sum
    * have inverses, so the state is exact under any mutation mix (the
    * decimal accumulators make subtraction exact too); `max` has NO
    * inverse, which is why this method doesn't take maxCols — that
    * aggregate genuinely needs [[refresh]]'s recompute on deletes, and the
    * taxonomy split is the point.
    *
    * Keys whose maintained count reaches zero leave the state entirely
    * (they must: a lingering zero row would differ from the recompute).
    * Cost per refresh: O(changed rows) through the manifest-aware CDC diff
    * — a key-scoped replace reads the touched partition's files, never the
    * table. Same exactly-once contract as [[refresh]]: the reflected
    * version rides in the same manifest swap as the state.
    */
  def refreshViaCdf(spark: SparkSession, sourcePath: String, matPath: String,
                    keyCols: Seq[String], sumCols: Seq[String],
                    prep: DataFrame => DataFrame = identity): Refresh = {
    val vNow = TxLog.currentVersion(spark, sourcePath)
    if (vNow < 0) return Refresh(-1L, incremental = false)
    val vLast = sourceVersion(spark, matPath)
    if (vLast == vNow) return Refresh(vNow, incremental = true)

    val floatingOf = (p: DataFrame) => p.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }.toSet
    def aggOf(df: DataFrame, negate: Boolean): DataFrame = {
      val p = prep(df)
      val floating = floatingOf(p)
      def sumOf(c: String) = {
        val base = if (floating(c)) col(c).cast(SumScale) else col(c)
        sum(if (negate) -base else base).as(s"sum_$c")
      }
      p.groupBy(keyCols.map(col): _*)
        .agg(sum(lit(if (negate) -1L else 1L)).as("__cnt"),
          sumCols.map(sumOf): _*)
    }

    if (vLast < 0) {
      if (TxLog.snapshot(spark, sourcePath, vNow).files.nonEmpty)
        TxLog.overwriteFlat(
          aggOf(TxLog.read(spark, sourcePath, vNow), negate = false)
            .withColumn(SrcVersionCol, lit(vNow)),
          matPath, statsCols = Seq(SrcVersionCol))
      return Refresh(vNow, incremental = false)
    }
    val changes = TxLog.rowChanges(spark, sourcePath, vLast, vNow)
    if (changes.isEmpty) return Refresh(vNow, incremental = true)
    val delta =
      aggOf(changes.filter(col("change") === "insert").drop("change"),
        negate = false)
      .unionByName(
        aggOf(changes.filter(col("change") === "delete").drop("change"),
          negate = true))
    val merged = readRaw(spark, matPath).unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col("__cnt") > 0)
    TxLog.overwriteFlat(merged.withColumn(SrcVersionCol, lit(vNow)), matPath,
      statsCols = Seq(SrcVersionCol))
    Refresh(vNow, incremental = true)
  }

  /** Incrementally-maintained JOIN view: `matPath` holds `source ⋈ dim`
    * (inner, on `srcKey = dimKey`), refreshed by the join delta rule —
    * for append-only source growth `Δ(S ⋈ D) = ΔS ⋈ D`, so each refresh
    * joins ONLY the added files against the dimension and APPENDS the
    * result (no rewrite of existing state at all — cheaper than the
    * aggregate path, which must merge). At 100 TB: the delta is batch-sized
    * and the dim join broadcasts/AQE-plans like any dimension join; the
    * view never re-reads the fact history.
    *
    * Contract: `dim` is STATIC between refreshes (the slowly-changing side
    * belongs in an SCD2 table and joins at read time — [[graft.operators
    * .Scd2.temporalJoin]]); a non-append-only source change (replace /
    * delete / compact) voids the delta rule and triggers the honest full
    * rebuild, exactly like the aggregate path.
    */
  def refreshJoin(spark: SparkSession, sourcePath: String, matPath: String,
                  dim: DataFrame, srcKey: String, dimKey: String): Refresh = {
    val vNow = TxLog.currentVersion(spark, sourcePath)
    if (vNow < 0) return Refresh(-1L, incremental = false)
    val vLast = sourceVersion(spark, matPath)
    if (vLast == vNow) return Refresh(vNow, incremental = true)

    def joined(src: DataFrame): DataFrame =
      src.join(dim, src(srcKey) === dim(dimKey)).drop(dim(dimKey))

    val (added, removed) = TxLog.changesBetween(spark, sourcePath, vLast, vNow)
    val incremental = vLast >= 0 && removed.isEmpty
    if (incremental && added.isEmpty) return Refresh(vNow, incremental = true)
    if (incremental) {
      val delta = joined(TxLog.readAddedSince(spark, sourcePath, vLast, vNow))
      TxLog.appendFlat(delta.withColumn(SrcVersionCol, lit(vNow)), matPath,
        statsCols = Seq(SrcVersionCol))
    } else if (TxLog.snapshot(spark, sourcePath, vNow).files.nonEmpty) {
      TxLog.overwriteFlat(
        joined(TxLog.read(spark, sourcePath, vNow))
          .withColumn(SrcVersionCol, lit(vNow)),
        matPath, statsCols = Seq(SrcVersionCol))
    }
    Refresh(vNow, incremental)
  }
}
