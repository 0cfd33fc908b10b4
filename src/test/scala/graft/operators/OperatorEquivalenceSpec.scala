package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence proofs between the reference-faithful formulations and the
  * scale-path formulations (SURVEY §7.4), run over the real sf0.001 tables so
  * the distributions are non-trivial.
  */
class OperatorEquivalenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("latestPerKey window ≡ max_by aggregate (non-null total order)") {
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("unix_micros(ts)")).drop("ts")
    val a = Dedup.latestPerKey(ev, Seq("user_id", "event_type"),
      Seq(col("ts_us").desc, col("event_id").desc))
    val b = Dedup.latestPerKeyAgg(ev, Seq("user_id", "event_type"),
      Seq("ts_us", "event_id"))
    assertSameRows(a, b)
  }

  test("partition aggregates: window formulation ≡ groupBy+join (W7-W9)") {
    val li = Tables.load(spark, dir, "lineitem")
    val w = Window.partitionBy("l_suppkey")
    val windowed = li.select(
      col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
      min("l_quantity").over(w).as("best_qty_supp"),
      size(collect_set(col("l_partkey")).over(w)).cast("long").as("n_parts_supp"))
    val joined = li
      .join(li.groupBy("l_suppkey").agg(
        min("l_quantity").as("best_qty_supp"),
        countDistinct("l_partkey").as("n_parts_supp")), "l_suppkey")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "best_qty_supp", "n_parts_supp")
    assertSameRows(windowed, joined)
  }

  test("as-of join: joinFormulation ≡ unionMergeFormulation on sf0.001 events") {
    val a = graft.SparkEntry.queries("q09_asof_join")(spark, dir)
    val b = graft.SparkEntry.queries("q10_asof_union_merge")(spark, dir)
    assertSameRows(a, b)
  }

  test("dedup is idempotent") {
    val ev = Tables.events(spark, dir)
    val once = Dedup.latestPerKey(ev, Seq("user_id", "event_type"),
      Seq(col("ts").desc_nulls_first, col("event_id").desc))
    val twice = Dedup.latestPerKey(once, Seq("user_id", "event_type"),
      Seq(col("ts").desc_nulls_first, col("event_id").desc))
    assertSameRows(once, twice)
  }

  test("union dedup: hist∪rt ≡ rt∪hist under last-write-wins (order-insensitive)") {
    val ev = Tables.events(spark, dir).limit(200)
    val hist = ev.withColumn("is_realtime", lit(false))
    val rt = ev.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") + 1.0).withColumn("is_realtime", lit(true))
    val ord = Seq(col("is_realtime").desc_nulls_first, col("ts").desc_nulls_first,
      col("event_id").desc)
    val ab = Dedup.latestPerKey(hist.unionByName(rt), Seq("event_id"), ord)
    val ba = Dedup.latestPerKey(rt.unionByName(hist), Seq("event_id"), ord)
    assertSameRows(ab, ba)
  }
}
