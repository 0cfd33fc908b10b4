package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The whole reference dbt DAG (SURVEY §3.2) as one lazy Spark lineage:
  * staging and intermediate models stay unmaterialized views (dbt
  * `materialized='view'` ≙ DataFrame lineage), the shared feature layer is
  * persisted once (three marts consume it — where Snowflake would recompute or
  * cache transparently, we make it explicit), and the marts are the only
  * materialization points.
  *
  * At scale the mart writes go out partitioned by
  * (`season_year`, `meeting_key`) — the dashboard's filter surface — giving
  * partition pruning the reference never had (its tables are flat,
  * `dags/open_f1_historical.py:112-113`).
  */
object F1Pipeline {

  /** All raw inputs, all-string, per [[F1Schemas]]. */
  case class Raw(
      lapsHistorical: DataFrame, lapsRealtime: DataFrame,
      positionHistorical: DataFrame, positionRealtime: DataFrame,
      raceControlHistorical: DataFrame, raceControlRealtime: DataFrame)

  /** Tagged-union raw inputs: per endpoint ONE frame carrying both the
    * historical and realtime feeds, distinguished by a boolean
    * `__is_realtime` column. This is the scale-friendly ingest shape (one
    * unified log per endpoint): when the two feeds share an upstream — a
    * single staged landing table, or the synthetic generator here — the
    * two-frame [[Raw]] forces `union(filter(hist), filter(rt))` over it, and
    * Spark evaluates everything above the shared exchange once PER BRANCH.
    * The tagged shape keeps one linear lineage per endpoint.
    */
  case class TaggedRaw(laps: DataFrame, positions: DataFrame, raceControl: DataFrame)

  case class Marts(
      fctDriverLaps: DataFrame,
      fctDriverRaceSummary: DataFrame,
      finalF1: DataFrame,
      raceControlAll: DataFrame)

  /** Build the full model DAG lazily; `optimized` selects the scale-path
    * formulations (union-merge as-of join, partition aggregates via
    * groupBy+join) — result-identical to the reference-faithful forms
    * (equivalence spec-proven), linear instead of quadratic/sort-heavy.
    *
    * `persistFeatures` caches the shared feature layer before the mart
    * fan-out. Default OFF: measured at sf0.1, recomputing the all-codegen
    * upstream per mart is 2–3× faster than the columnar cache (cache build +
    * the codegen barrier at InMemoryTableScan dominate). Flip it on when the
    * upstream includes expensive I/O or non-codegen stages worth amortizing.
    */
  /** `persistSdl` caches the as-of join output (the narrow frame every mart
    * branch re-reads). Unlike the wide feature frame (see `persistFeatures`),
    * sdl sits below several window stages that Spark recomputes per consumer
    * (exchange reuse dedups shuffle WRITES, not the sort/window work above
    * them) — caching here cuts that recompute without the wide-cache cost.
    */
  def build(raw: Raw, persistFeatures: Boolean = false,
            optimized: Boolean = true, persistSdl: Boolean = false): Marts = {
    val lapsAll = F1Intermediate.lapsAll(
      F1Staging.stgLapsHistorical(raw.lapsHistorical),
      F1Staging.stgLapsRealtime(raw.lapsRealtime))
    val positionAll = F1Intermediate.positionAll(
      F1Staging.stgPosition(raw.positionHistorical, isRealtime = false),
      F1Staging.stgPosition(raw.positionRealtime, isRealtime = true))
    val raceControlAll = F1Intermediate.raceControlAll(
      F1Staging.stgRaceControl(raw.raceControlHistorical, isRealtime = false),
      F1Staging.stgRaceControl(raw.raceControlRealtime, isRealtime = true))

    val sdl0 =
      if (optimized) F1Intermediate.sessionDriverLapsOptimized(lapsAll, positionAll)
      else F1Intermediate.sessionDriverLaps(lapsAll, positionAll)
    val sdl = if (persistSdl) sdl0.persist(StorageLevel.MEMORY_AND_DISK) else sdl0
    val features0 = F1Intermediate.driverLapFeatures(sdl, partitionAggsViaJoin = optimized)
    val features =
      if (persistFeatures) features0.persist(StorageLevel.MEMORY_AND_DISK)
      else features0

    Marts(
      F1Marts.fctDriverLaps(features),
      F1Marts.fctDriverRaceSummary(features),
      F1Marts.finalF1(features),
      raceControlAll)
  }

  /** [[build]] over the tagged-union raw shape: fused staging+dedup (one
    * window pass per endpoint — [[F1Intermediate.lapsAllTagged]]), the
    * union-merge as-of join, and the windowed final mart
    * ([[F1Marts.finalF1Windowed]]). Every stage preserves the
    * `(meeting_key, session_key, driver_number)` hash-partitioning
    * established by the as-of exchange, so the feature windows, the final
    * mart and the summary aggregation add sorts but NO further exchanges.
    * Row-equal to `build(raw)` (spec-proven on the synthetic mapping).
    */
  def buildTagged(raw: TaggedRaw, persistLapsAll: Boolean = false,
                  persistSdl: Boolean = false): Marts = {
    val lapsAll0 = F1Intermediate.lapsAllTagged(F1Staging.stgLapsTagged(raw.laps))
    val lapsAll =
      if (persistLapsAll) lapsAll0.persist(StorageLevel.MEMORY_AND_DISK) else lapsAll0
    val positionAll = F1Intermediate.positionAllTagged(F1Staging.stgPositionTagged(raw.positions))
    val raceControlAll = F1Intermediate.raceControlAllTagged(
      F1Staging.stgRaceControlTagged(raw.raceControl))
    val sdl0 = F1Intermediate.sessionDriverLapsOptimized(lapsAll, positionAll)
    val sdl = if (persistSdl) sdl0.persist(StorageLevel.MEMORY_AND_DISK) else sdl0
    val features = F1Intermediate.driverLapFeaturesSinglePass(sdl)
    Marts(
      F1Marts.fctDriverLaps(features),
      F1Marts.fctDriverRaceSummary(features),
      F1Marts.finalF1Windowed(features),
      raceControlAll)
  }

  /** Materialize the marts as Parquet under `outDir`, partitioned by the
    * session-scoped filter keys.
    */
  def run(raw: Raw, outDir: String): Unit = {
    val marts = build(raw)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite")
        .partitionBy("season_year", "meeting_key")
        .parquet(s"$outDir/$name")
    write(marts.fctDriverLaps, "fct_driver_laps")
    // summary has no season_year column — partition by meeting_key only
    marts.fctDriverRaceSummary.write.mode("overwrite")
      .partitionBy("meeting_key").parquet(s"$outDir/fct_driver_race_summary")
    write(marts.finalF1, "final_f1")
  }
}
