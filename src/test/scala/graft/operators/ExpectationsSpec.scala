package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dbt-schema-test / DLT-expectation semantics on a frame with one known
  * violation population per rule kind, plus the quarantine routing split.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (Some(1L), Some("A"), "ok", 10.0),
    (Some(2L), Some("A"), "ok", -5.0),  // expect violation (negative)
    (Some(2L), Some("B"), "ok", 20.0),  // duplicate id
    (None,     Some("B"), "bad", 30.0), // null id + bad status
    (Some(4L), None,      "ok", 40.0),  // null fk passes relationships
    (Some(5L), Some("Z"), "ok", 50.0)   // orphan fk
  ).toDF("id", "fk", "status", "value")

  private def parents = Seq("A", "B").toDF("k")

  test("report: every rule kind counts its own violation population") {
    val got = Expectations.report(frame, Seq(
      Expectations.NotNull("id"),
      Expectations.Unique(Seq("id")),
      Expectations.AcceptedValues("status", Seq("ok")),
      Expectations.Relationship("fk", parents, "k"),
      Expectations.Expect("positive_value", col("value") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null:id" -> 1L,
      "unique:id" -> 1L,              // key 2 duplicated = ONE offending key
      "accepted_values:status" -> 1L,
      "relationships:fk" -> 1L,       // 'Z'; NULL fk passes (dbt semantics)
      "expect:positive_value" -> 1L))
  }

  test("report on a clean frame is all-zero, including empty-input aggs") {
    val clean = Seq((1L, "A"), (2L, "B")).toDF("id", "fk")
    val got = Expectations.report(clean, Seq(
      Expectations.NotNull("id"),
      Expectations.Unique(Seq("id")),
      Expectations.Relationship("fk", parents, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L))
    assert(got.size == 3)
  }

  test("report rejects an empty rule list and de-duplicates repeated rules") {
    val clean = Seq((1L, "A"), (2L, "B")).toDF("id", "fk")
    intercept[IllegalArgumentException] {
      Expectations.report(clean, Seq.empty)
    }
    // the same rule listed twice would hit mapKeyDedupPolicy=EXCEPTION at
    // runtime without de-duplication; first occurrence wins
    val got = Expectations.report(clean, Seq(
      Expectations.NotNull("id"),
      Expectations.NotNull("id"),
      Expectations.Unique(Seq("id")),
      Expectations.Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 2) // one row per DISTINCT rule
    assert(got.toMap == Map("not_null:id" -> 0L, "unique:id" -> 0L))
  }

  test("report rejects two DIFFERENT rules sharing a name") {
    val clean = Seq((1L, "A"), (2L, "B")).toDF("id", "status")
    // same name (accepted_values:status), different value sets — silently
    // keeping the first would report a check as passed that never ran
    intercept[IllegalArgumentException] {
      Expectations.report(clean, Seq(
        Expectations.AcceptedValues("status", Seq("A", "B")),
        Expectations.AcceptedValues("status", Seq("Z"))))
    }
  }

  test("quarantine routes rows by their failed row-local rules") {
    val q = Expectations.quarantine(frame, Seq(
      Expectations.NotNull("id"),
      Expectations.AcceptedValues("status", Seq("ok")),
      Expectations.Expect("positive_value", col("value") > 0)))
    val failed = q.filter(col("failed_rules") =!= "")
      .select("failed_rules").as[String].collect().sorted
    assert(failed.toSeq == Seq(
      "expect:positive_value",
      "not_null:id,accepted_values:status"))
    assert(q.filter(col("failed_rules") === "").count() == 4)
  }

  test("snapshotDrift: range expansion, row delta, and null movement flagged per column") {
    val before = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val after = (Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, -5.0)) // -5 expands v's range
      .toDF("k", "v"))
      .unionByName(Seq((5L, Option.empty[Double])).toDF("k", "v"))
    val d = Expectations.snapshotDrift(before, after, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = d("v")
    assert(v.getAs[Long]("n_before") == 3L && v.getAs[Long]("n_after") == 5L)
    assert(v.getAs[Long]("row_delta") == 2L)
    assert(v.getAs[Long]("nulls_after") == 1L && v.getAs[Long]("nulls_before") == 0L)
    assert(v.getAs[Boolean]("range_expanded")) // -5 < old min 10
    assert(v.getAs[Double]("min_after") == -5.0)
    val k = d("k")
    assert(k.getAs[Boolean]("range_expanded")) // key 5 > old max 3
    assert(k.getAs[Long]("ndv_before") == 3L && k.getAs[Long]("ndv_after") == 5L)
    // a stable snapshot drifts nowhere
    val same = Expectations.snapshotDrift(before, before, Seq("k", "v"))
      .collect()
    same.foreach { r =>
      assert(r.getAs[Long]("row_delta") == 0L)
      assert(!r.getAs[Boolean]("range_expanded"))
    }
  }
}
