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
}
