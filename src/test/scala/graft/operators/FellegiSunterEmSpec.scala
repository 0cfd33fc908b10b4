package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unsupervised Fellegi–Sunter ([[FuzzyJoin.fellegiSunterEm]]): fixed-
  * iteration EM over the agreement-pattern census must (a) be exactly
  * deterministic, (b) separate a planted match/nonmatch universe without
  * ever seeing a label, and (c) land near the labeled-subset estimator's
  * decisions on the same pairs — Winkler 1988's claim, spec'd.
  */
class FellegiSunterEmSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a_id", LongType), StructField("b_id", LongType),
    StructField("f1", BooleanType), StructField("f2", BooleanType),
    StructField("f3", BooleanType), StructField("f4", BooleanType),
    StructField("lab", BooleanType)))

  /** 60 planted matches (mostly all-agree) + 600 nonmatches (mostly
    * all-disagree, with noisy single-field agreements) — fully labeled so
    * the supervised estimator is a reference, the EM never reads `lab`.
    */
  private def pairs() = {
    var id = 0L
    def mk(n: Int, f: (Boolean, Boolean, Boolean, Boolean), lab: Boolean) =
      (0 until n).map { _ =>
        id += 1
        Row(id, id + 100000L, f._1, f._2, f._3, f._4, lab)
      }
    val rows =
      mk(50, (true, true, true, true), lab = true) ++
      mk(10, (true, true, false, true), lab = true) ++
      mk(500, (false, false, false, false), lab = false) ++
      mk(60, (true, false, false, false), lab = false) ++
      mk(40, (false, true, false, false), lab = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private val fields = Seq("f1", "f2", "f3", "f4")

  test("EM separates the planted universe with no labels; deterministic") {
    val p = pairs()
    val em = FuzzyJoin.fellegiSunterEm(p, fields, iters = 5,
      upper = 3.0, lower = -3.0)
    val byPattern = em
      .groupBy(fields.map(col): _*)
      .agg(min("decision").as("dmin"), max("decision").as("dmax"),
        min("match_prob").as("pmin"), max("match_prob").as("pmax"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)) -> (r.getString(4), r.getString(5),
        r.getDouble(6), r.getDouble(7)))
      .toMap
    // identical pattern => identical score: the model sees only the fields
    byPattern.values.foreach { case (dmin, dmax, pmin, pmax) =>
      assert(dmin == dmax && pmin == pmax, "same pattern scored differently")
    }
    val allT = byPattern((true, true, true, true))
    val allF = byPattern((false, false, false, false))
    assert(allT._1 == "match" && allT._3 > 0.99,
      s"all-agree pattern not recovered as match: $allT")
    assert(allF._1 == "nonmatch" && allF._3 < 0.01,
      s"all-disagree pattern not recovered as nonmatch: $allF")

    // bit-exact determinism across runs
    val again = FuzzyJoin.fellegiSunterEm(pairs(), fields, iters = 5,
      upper = 3.0, lower = -3.0)
      .select("a_id", "match_prob", "weight", "decision")
      .collect().sortBy(_.getLong(0)).toSeq
    val first = em.select("a_id", "match_prob", "weight", "decision")
      .collect().sortBy(_.getLong(0)).toSeq
    assert(again == first, "EM is not deterministic across runs")
  }

  test("EM decisions converge to the labeled-subset estimator's on the planted fixture") {
    val p = pairs()
    val em = FuzzyJoin.fellegiSunterEm(p, fields, iters = 5,
      upper = 3.0, lower = -3.0)
      .select(col("a_id"), col("decision").as("d_em"))
    val sup = FuzzyJoin.fellegiSunter(p, fields, "lab",
      upper = 3.0, lower = -3.0)
      .select(col("a_id"), col("decision").as("d_sup"))
    val joined = em.join(sup, "a_id")
    val n = joined.count()
    val agree = joined.filter(col("d_em") === col("d_sup")).count()
    assert(agree.toDouble / n >= 0.95,
      s"EM agrees with the labeled estimator on only $agree of $n pairs")
    // and the unsupervised route never inverts a planted truth: no labeled
    // match decided nonmatch, no labeled nonmatch decided match
    val inverted = FuzzyJoin.fellegiSunterEm(p, fields, iters = 5,
      upper = 3.0, lower = -3.0)
      .filter((col("lab") && col("decision") === "nonmatch") ||
        (!col("lab") && col("decision") === "match"))
      .count()
    assert(inverted == 0L, s"$inverted pairs decided against their truth")
  }
}
