package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F1-F8 ingest transforms (`clean_df` and friends,
  * `/root/reference/dags/open_f1_historical.py:60-108,190-209,260-265`).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("F1: sentinel strings → NULL, membership on trimmed value, original kept") {
    val df = Seq("None", " null ", "NaN", " ok ", "", "0").toDF("v")
    val out = Cleaning.nullNormalizeAll(df).collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, None, None, Some(" ok "), None, Some("0")))
  }

  test("F2/F3: nested → JSON, then stringify-everything (bronze layer)") {
    val df = Seq((1, Seq(2049, 2051), 3.5)).toDF("k", "segs", "x")
    val bronze = Cleaning.stringifyAll(Cleaning.jsonifyNested(df))
    assert(bronze.schema.fields.forall(_.dataType.typeName == "string"))
    val r = bronze.head()
    assert(r.getString(1) == "[2049,2051]")
    assert(r.getString(2) == "3.5")
  }

  test("F5: coercing timestamp parse — invalid → NULL, no ANSI throw") {
    val df = Seq("2023-11-26 13:00:00+00:00", "not a time").toDF("v")
    val out = df.select(Cleaning.parseTimestampCoercing($"v").as("t")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("F6/F7/F8: default-fill, priority, key backfill") {
    val df = Seq(("Race", null: String), ("Practice", "Monaco GP")).toDF("session_name", "meeting_name")
    val filled = Cleaning.fillDefault(df, "meeting_name", "Unknown GP")
      .withColumn("type_priority", Cleaning.typePriority($"session_name", "Race"))
    val rows = filled.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(("Race", "Unknown GP", 1), ("Practice", "Monaco GP", 0)))
    val ensured = Cleaning.ensureColumns(df, Map("session_key" -> lit("77"), "meeting_name" -> lit("X")))
    assert(ensured.columns.contains("session_key"))
    // existing column untouched
    assert(ensured.filter($"meeting_name" === "Monaco GP").count() == 1)
  }
}
