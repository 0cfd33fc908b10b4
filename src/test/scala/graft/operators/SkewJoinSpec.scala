package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Salted-join equivalence: salting redistributes, never changes the result. */
class SkewJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted inner join ≡ plain inner join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    val supp = Tables.load(spark, dir, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = SkewJoin.saltedJoin(li, supp, "l_suppkey", n = 7)
    assertSameRows(plain, salted)
  }

  test("salted left join preserves unmatched rows exactly once") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    // dim missing some keys → unmatched fact rows must appear once with NULLs
    val partialDim = Tables.load(spark, dir, "supplier")
      .filter(org.apache.spark.sql.functions.col("s_suppkey") <= 5)
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(partialDim, Seq("l_suppkey"), "left")
    val salted = SkewJoin.saltedJoin(li, partialDim, "l_suppkey", n = 4, joinType = "left")
    assertSameRows(plain, salted)
  }

  test("skewReport: hand-computed shares and skew factors, hot key first") {
    import spark.implicits._
    // key "hot" 6 rows, "warm" 2, "cold" 1 -> total 9, n_keys 3, mean 3
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("warm") ++ Seq("cold")).toDF("k")
    val rep = SkewJoin.skewReport(df, Seq("k"), topN = 2).collect()
    assert(rep.length == 2)
    val hot = rep(0)
    assert(hot.getString(0) == "hot" && hot.getAs[Long]("cnt") == 6L)
    assert(math.abs(hot.getAs[Double]("row_share") - 6.0 / 9.0) < 1e-12)
    assert(math.abs(hot.getAs[Double]("skew_factor") - 2.0) < 1e-12)
    assert(rep(1).getString(0) == "warm")
  }
}
