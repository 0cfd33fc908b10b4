package graft

import graft.pipeline.F1Synthetic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract: one named query per operator family from SURVEY.md §2,
  * exercised on the harness tables (TESTDATA.md), each with a DuckDB oracle in
  * [[oracleSql]]. Scaladoc tags map queries to the survey inventory IDs.
  *
  * Conventions keeping Spark and the DuckDB oracle hash-aligned:
  *   - `events.ts` is parquet TIMESTAMP(NANOS); both sides are normalized to
  *     epoch MICROseconds (`unix_micros` ↔ `epoch_us`) — see
  *     [[graft.sources.Tables.events]].
  *   - timestamp outputs are emitted as epoch-µs BIGINT (never raw timestamps,
  *     whose tz-awareness differs between engines at rest).
  *   - ordering over nullable columns spells out NULLS FIRST/LAST explicitly
  *     on both sides (Snowflake-vs-Spark default divergence, SURVEY §2.6).
  *   - every aggregate/computed column is aliased identically on both sides.
  */
object SparkEntry {


  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0): the ENTIRE
    * reference pipeline — staging cast-projections, realtime W1/W2 dedup, the
    * as-of join of laps to position ticks, the full feature-window layer, and
    * the per-driver session summary mart — end-to-end over synthetic raw data
    * ([[graft.pipeline.F1Synthetic]]; oracle-checked as q38/q39 at sf0.01).
    */
  def entry(spark: SparkSession): DataFrame =
    F1Synthetic.summary(spark, "/root/testdata/sf0.001")

  /** Driver surface: one named query per operator family, merged from the
    * per-family registries under [[graft.queries]] (split so no file tops
    * 1.5k lines; the map is byte-identical to the former single-file form).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.F1Queries.queries ++
    graft.queries.StorageQueries.queries ++
    graft.queries.DedupQueries.queries ++
    graft.queries.SimilarityQueries.queries ++
    graft.queries.CurationQueries.queries ++
    graft.queries.AnalyticsQueries.queries ++
    graft.queries.SqlGraphQueries.queries

  /** DuckDB oracle per query (same keys as [[queries]]). */
  def oracleSql: Map[String, String] =
    graft.queries.F1Queries.oracleSql ++
    graft.queries.StorageQueries.oracleSql ++
    graft.queries.DedupQueries.oracleSql ++
    graft.queries.SimilarityQueries.oracleSql ++
    graft.queries.CurationQueries.oracleSql ++
    graft.queries.AnalyticsQueries.oracleSql ++
    graft.queries.SqlGraphQueries.oracleSql
}
