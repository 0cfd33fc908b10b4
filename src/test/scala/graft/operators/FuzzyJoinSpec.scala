package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PassJoin segment-blocked edit-distance join: exactness against the naive
  * quadratic formulation (the blocking must lose NOTHING — recall 1 — and
  * the final verify makes precision 1), the short-string branch, and the
  * no-nested-loop plan property.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def naive(l: DataFrame, r: DataFrame, d: Int): Set[(Long, Long, Long)] =
    l.join(r, abs(length(col("l_name")) - length(col("r_name"))) <= d)
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")).cast("long"))
      .filter(col("dist") <= d)
      .select("l_id", "r_id", "dist")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  private def blocked(l: DataFrame, r: DataFrame, d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editDistanceJoin(l, "l_id", "l_name", r, "r_id", "r_name", d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  test("segment blocking ≡ quadratic scan on real part names, d = 1 and 2") {
    val names = Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("l_id"), col("p_name").as("l_name"))
    // perturbations exercising all three edit kinds at varying positions:
    // delete first char, substitute a middle char, insert at the end
    val r = names.select((col("l_id") + 1000000L).as("r_id"),
      when(col("l_id") % 3 === 0, expr("substring(l_name, 2)"))
        .when(col("l_id") % 3 === 1,
          concat(expr("substring(l_name, 1, 7)"), lit("#"),
            expr("substring(l_name, 9)")))
        .otherwise(concat(col("l_name"), lit("q"))).as("r_name"))
    for (d <- Seq(1, 2)) {
      val exact = naive(names, r, d)
      assert(exact.nonEmpty, s"fixture planted no matches at d=$d")
      assert(blocked(names, r, d) == exact, s"d=$d")
    }
  }

  test("short strings (below segment count) still join exactly") {
    val l = Seq((1L, "ab"), (2L, "a"), (3L, ""), (4L, "xyz")).toDF("l_id", "l_name")
    val r = Seq((10L, "b"), (11L, "aq"), (12L, "x"), (13L, "xxyz")).toDF("r_id", "r_name")
    for (d <- Seq(1, 2)) assert(blocked(l, r, d) == naive(l, r, d), s"d=$d")
  }

  test("plan: equi-join on segments, never a nested loop; naive IS the contrast") {
    val names = Tables.load(spark, dir, "part").limit(100)
      .select(col("p_partkey").as("l_id"), col("p_name").as("l_name"))
    val r = names.select((col("l_id") + 9L).as("r_id"), col("l_name").as("r_name"))
    val sp = FuzzyJoin.editDistanceJoin(names, "l_id", "l_name",
      r, "r_id", "r_name", 1).queryExecution.sparkPlan
    // the segment path must be an equi-join; the only nested loop allowed is
    // the short-string branch (both sides length-filtered to ≤ 2d chars)
    val loops = sp.collect {
      case j if j.nodeName.contains("NestedLoop") ||
        j.nodeName.contains("Cartesian") => j
    }
    assert(loops.size <= 1, sp.toString)
    val equi = sp.collect {
      case j if j.nodeName.contains("HashJoin") ||
        j.nodeName.contains("SortMergeJoin") => j
    }
    assert(equi.nonEmpty, sp.toString)
    val naivePlan = names.join(r,
        levenshtein(col("l_name"), col("r_name")) <= 1).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("sortedNeighborhood: window-adjacent near pairs found; no self-join in the plan") {
    val df = Seq(
      (1L, "alpha one"), (2L, "alpha one!"),   // dist 1, adjacent in sort
      (3L, "alpha two"),                       // same block, dist > 1 from both
      (4L, "beta x"), (5L, "beta xy"),         // dist 1, different block from alpha
      (6L, "gamma")                            // alone
    ).toDF("id", "nm")
    val out = FuzzyJoin.sortedNeighborhood(df, "id", "nm",
        blockLen = 4, windowSize = 5, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (4L, 5L)))
    // one window pass, no join: the pair stream comes from exploded leads
    val plan = FuzzyJoin.sortedNeighborhood(df, "id", "nm", 4, 5, 1)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("fellegiSunter: hand-computed m/u weights, thresholds on rounded weight") {
    // labeled: 2 matches (field agrees), 2 non-matches (field disagrees)
    // m = (2+1)/(2+2) = 0.75, u = (0+1)/(2+2) = 0.25
    // agree → log2(3) = 1.584963, disagree → log2(1/3) = -1.584963
    val pairs = Seq(
      (1L, true, Some(true)), (2L, true, Some(true)),
      (3L, false, Some(false)), (4L, false, Some(false)),
      (5L, true, None), (6L, false, None))
      .toDF("pid", "f_agree", "is_match")
    val out = FuzzyJoin.fellegiSunter(pairs, Seq("f_agree"), "is_match",
      upper = 1.5, lower = -1.5)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(r.fieldIndex("weight")),
          r.getString(r.fieldIndex("decision")))).toMap
    assert(out(5L) == (1.584963, "match"),
      "an agreeing unlabeled pair scores the match weight")
    assert(out(6L) == (-1.584963, "nonmatch"))
    assert(out(1L)._1 == 1.584963 && out(3L)._1 == -1.584963,
      "labeled pairs are scored too, by the same rates")
    // a clerical band: thresholds outside the weight range → review
    val rev = FuzzyJoin.fellegiSunter(pairs, Seq("f_agree"), "is_match",
      upper = 2.0, lower = -2.0)
      .filter(col("decision") =!= "review").count()
    assert(rev == 0, "weights inside (lower, upper) are clerical review")
  }
}
