package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins / latest-record dedup — the reference's W1/W2 pattern
  * (`/root/reference/dbt/models/staging/stg_openf1_laps_realtime.sql:5-25`,
  * `dbt/models/intermediate/int_openf1_laps_all.sql:55-63,87`):
  * `row_number() over (partition by keys order by …) = 1`.
  *
  * Snowflake's `ORDER BY x DESC` defaults to NULLS FIRST while Spark's
  * `desc` is NULLS LAST — callers replicating reference semantics over
  * nullable order columns must pass `desc_nulls_first` columns (SURVEY §2.6).
  */
object Dedup {

  /** Reference-faithful formulation: one shuffle + full sort per partition,
    * then keep the first row of each key group.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Scale path: the same answer as [[latestPerKey]] via a single hash
    * aggregate — `max_by(struct(all columns), struct(order columns))` gets a
    * map-side partial combine, so the shuffle carries one row per key instead
    * of every duplicate. Use when the ordering columns are non-null and the
    * desired winner is the MAX of the (lexicographic) order tuple; at 100 TB
    * this beats the sort-window by the dedup ratio.
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__best"))
      .select(df.columns.map(n => col(s"__best.$n").as(n)).toIndexedSeq: _*)
  }

  /** Exact duplicate removal over a column subset (extension scope). */
  def exactDedup(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)
}
