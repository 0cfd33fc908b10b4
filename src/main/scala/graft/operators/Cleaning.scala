package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-side row transforms (SURVEY.md §2.2, F1–F8), re-expressed as
  * Catalyst column expressions instead of the reference's eager per-row pandas
  * code (`/root/reference/dags/open_f1_historical.py:60-108,190-209,260-265`).
  * Everything here stays inside whole-stage codegen — no UDFs.
  */
object Cleaning {

  /** Null-equivalent sentinel strings (`clean_df`,
    * `dags/open_f1_historical.py:60-67`): membership is tested on the trimmed
    * value, but the surviving value is the ORIGINAL (untrimmed) string,
    * faithfully to the reference.
    */
  val NullSentinels: Seq[String] =
    Seq("", " ", "None", "none", "NULL", "null", "NaN", "nan", "NAN")

  /** F1: sentinel-string → NULL. */
  def nullNormalize(c: Column): Column =
    when(trim(c).isin(NullSentinels: _*), lit(null)).otherwise(c)

  /** F1 applied to every string column of a frame. */
  def nullNormalizeAll(df: DataFrame): DataFrame = {
    val strCols = df.schema.fields.collect { case f if f.dataType == StringType => f.name }.toSet
    df.select(df.columns.map(n => if (strCols(n)) nullNormalize(col(n)).as(n) else col(n)).toIndexedSeq: _*)
  }

  /** F2: nested values → JSON strings (`dags/open_f1_historical.py:69-70`). */
  def jsonifyNested(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)

  /** F3: stringify everything — reproduces the reference's all-VARCHAR bronze
    * layer (`dags/open_f1_historical.py:72-77,112-113`).
    */
  def stringifyAll(df: DataFrame): DataFrame =
    df.select(df.columns.map(n => col(n).cast(StringType).as(n)).toIndexedSeq: _*)

  /** F5: coercing timestamp parse — invalid strings → NULL, like
    * `pd.to_datetime(..., errors="coerce")` (`dags/open_f1_historical.py:190-191`).
    * Uses `try_to_timestamp` so ANSI mode (Spark 4 default) does not throw.
    */
  def parseTimestampCoercing(c: Column): Column = try_to_timestamp(c)

  /** F6: default-fill (`dags/open_f1_historical.py:193-200`). */
  def fillDefault(df: DataFrame, name: String, default: String): DataFrame =
    if (df.columns.contains(name)) df.withColumn(name, coalesce(col(name), lit(default)))
    else df.withColumn(name, lit(default))

  /** F7: derived priority column (`dags/open_f1_historical.py:206-209`):
    * 1 when the value equals the priority label, else 0.
    */
  def typePriority(c: Column, priorityValue: String): Column =
    when(c === priorityValue, lit(1)).otherwise(lit(0))

  /** F8: ensure key columns exist on every row
    * (`dags/open_f1_historical.py:260-265`).
    */
  def ensureColumns(df: DataFrame, defaults: Map[String, Column]): DataFrame =
    defaults.foldLeft(df) { case (d, (name, value)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, value)
    }
}
