package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Readers for the harness tables (TESTDATA.md) and generic sources.
  *
  * The reference ingests HTTP JSON into all-VARCHAR warehouse tables
  * (`/root/reference/dags/open_f1_historical.py:48-57,111-113`); this engine's
  * at-rest model is typed columnar Parquet read through Spark's vectorized
  * reader, so predicate pushdown and column pruning reach the scan.
  */
object Tables {

  /** `events.parquet`'s `ts` has shipped in two physical forms across harness
    * generations: parquet `TIMESTAMP(NANOS)` (which Spark's reader rejects —
    * `PARQUET_TYPE_ILLEGAL` — so it is read as a nanos LONG via
    * `spark.sql.legacy.parquet.nanosAsLong` and truncated to microseconds),
    * and plain `TIMESTAMP(MICROS)` without UTC adjustment (which Spark reads
    * as TIMESTAMP_NTZ). Dispatch on the type that actually arrives and
    * normalize both to a session-TZ `timestamp` — all sessions here run UTC,
    * so the micros match what DuckDB's own ns→µs / naive handling produces
    * and oracle comparisons align exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Load a harness table by name from an sf directory.
    *
    * Note on parallelism: the harness tables are single-file single-row-group
    * parquet — an unsplittable scan. Queries whose first real operator is a
    * shuffle (joins/aggregates/windows) parallelize right after it, so no
    * intervention is needed (and a blanket repartition here measurably hurts
    * them). CPU-heavy NARROW pipelines (shingling, per-pair cosine) instead
    * rebalance explicitly at their own entry — see
    * [[graft.operators.TextDedup.wordShingles]] /
    * [[graft.operators.Similarity.cosineNearDupPairs]].
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** S8: bind every harness table as a named temp view so `spark.sql`
    * queries run against the same catalog surface the reference declares in
    * `dbt/models/source.yml` (database/schema/table bindings).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** JSON fixture source with an explicit schema — the Spark-native stand-in
    * for the reference's HTTP JSON fetch (S1/S2,
    * `dags/open_f1_historical.py:178-185,48-57`): errors and absent fields
    * surface as NULLs in a declared schema rather than swallowed exceptions.
    */
  def jsonFixtures(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)
}
