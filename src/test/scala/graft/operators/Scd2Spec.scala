package graft.operators

import graft.SparkSpec
import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension maintenance on the transaction log: change rows open
  * new versions, no-ops don't, point-in-time reads resolve the interval, and
  * every merge is one snapshot-isolated commit.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-scd2").toString + "/dim"

  private def hist(path: String): Map[(Long, Long), (Option[Long], Boolean, String)] =
    TxLog.read(spark, path).collect().map { r =>
      val vf = r.getAs[Long]("valid_from")
      val vt = Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long])
      (r.getAs[Long]("k"), vf) -> ((vt, r.getAs[Boolean]("is_current"),
        r.getAs[String]("attr")))
    }.toMap

  test("change opens a version, no-op doesn't, new key inserts") {
    val path = tmp()
    val b0 = Seq((1L, "A", 0L), (2L, "B", 0L)).toDF("k", "attr", "eff")
    val b1 = Seq((1L, "A", 5L),  // no-op: attr unchanged → no new version
                 (2L, "C", 5L),  // real change → close + open
                 (3L, "D", 5L)   // brand-new key
                ).toDF("k", "attr", "eff")
    Scd2.merge(b0, path, "k", Seq("attr"), "eff", buckets = 4)
    Scd2.merge(b1, path, "k", Seq("attr"), "eff", buckets = 4)
    val h = hist(path)
    assert(h.size == 4)
    assert(h((1L, 0L)) == ((None, true, "A")))       // untouched by the no-op
    assert(h((2L, 0L)) == ((Some(5L), false, "B")))  // closed at 5
    assert(h((2L, 5L)) == ((None, true, "C")))
    assert(h((3L, 5L)) == ((None, true, "D")))
  }

  test("asOf resolves the interval containing t; current = open rows") {
    val path = tmp()
    Scd2.merge(Seq((1L, "A", 0L), (2L, "B", 0L)).toDF("k", "attr", "eff"),
      path, "k", Seq("attr"), "eff")
    Scd2.merge(Seq((2L, "C", 5L), (3L, "D", 5L)).toDF("k", "attr", "eff"),
      path, "k", Seq("attr"), "eff")
    def at(t: Long) = Scd2.asOf(spark, path, t).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("attr")).toMap
    assert(at(3L) == Map(1L -> "A", 2L -> "B"))
    assert(at(5L) == Map(1L -> "A", 2L -> "C", 3L -> "D")) // [valid_from, valid_to)
    val cur = Scd2.current(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("attr")).toMap
    assert(cur == Map(1L -> "A", 2L -> "C", 3L -> "D"))
  }

  test("each merge is one version; time travel shows the pre-merge dimension") {
    val path = tmp()
    val v1 = Scd2.merge(Seq((1L, "A", 0L)).toDF("k", "attr", "eff"),
      path, "k", Seq("attr"), "eff")
    val v2 = Scd2.merge(Seq((1L, "B", 5L)).toDF("k", "attr", "eff"),
      path, "k", Seq("attr"), "eff")
    assert(v2 == v1 + 1)
    val before = TxLog.read(spark, path, v1)
      .select("k", "attr", "is_current").as[(Long, String, Boolean)].collect().toSet
    assert(before == Set((1L, "A", true)))
    val after = TxLog.read(spark, path, v2)
      .filter($"is_current").select("attr").as[String].collect().toSet
    assert(after == Set("B"))
  }

  test("temporalJoin: each fact gets the version valid at its time; boundaries half-open") {
    val path = tmp()
    Scd2.merge(Seq((1L, "A", 0L), (2L, "B", 0L)).toDF("k", "attr", "eff"),
      path, "k", Seq("attr"), "eff")
    Scd2.merge(Seq((1L, "A2", 5L)).toDF("k", "attr", "eff"),
      path, "k", Seq("attr"), "eff")
    val facts = Seq(
      (10L, 1L, 4L),  // just before the change → A
      (11L, 1L, 5L),  // exactly at valid_from of the new version → A2 (half-open)
      (12L, 1L, 9L),  // after → A2
      (13L, 2L, 3L),  // unchanged key → B
      (14L, 9L, 3L)   // key with no dimension row → NULL attrs survive (left)
    ).toDF("fact_id", "fk", "t")
    val out = Scd2.temporalJoin(facts, "fk", "t", path, "k")
      .select($"fact_id", $"attr").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(10L -> Some("A"), 11L -> Some("A2"), 12L -> Some("A2"),
      13L -> Some("B"), 14L -> None))
    // exactly one row per fact — no interval double-match possible
    assert(Scd2.temporalJoin(facts, "fk", "t", path, "k").count() == 5)
  }

  test("NULL-safe change detection: NULL→value and value→NULL are real changes") {
    val path = tmp()
    Scd2.merge(Seq((1L, Option.empty[String], 0L), (2L, Some("X"), 0L))
      .toDF("k", "attr", "eff"), path, "k", Seq("attr"), "eff")
    Scd2.merge(Seq((1L, Some("Y"), 5L), (2L, Option.empty[String], 5L))
      .toDF("k", "attr", "eff"), path, "k", Seq("attr"), "eff")
    val h = TxLog.read(spark, path).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("valid_from")) ->
        r.getAs[Boolean]("is_current")).toMap
    assert(h.size == 4) // both keys versioned twice
    assert(h((1L, 5L)) && h((2L, 5L)))
    assert(!h((1L, 0L)) && !h((2L, 0L)))
  }
}
