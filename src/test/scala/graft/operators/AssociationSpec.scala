package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: hand-checked support/confidence/lift; apriori floor prunes") {
    // 4 baskets; x in 3, y in 2, z in 1; {x,y} together in 2
    val baskets = Seq(
      (1, "x"), (1, "y"),
      (2, "x"), (2, "y"),
      (3, "x"), (3, "z"),
      (4, "w"),
      (1, "x") // duplicate (basket, item) rows must not double-count
    ).toDF("b", "i")
    val rules = Association.pairRules(baskets, "b", "i", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(rules.length == 1) // only {x,y} clears the floor on both levels
    val (a, b, na, nb, nab, sup, conf, lift) = rules.head
    assert((a, b) == ("x", "y") && na == 3 && nb == 2 && nab == 2)
    assert(sup == 2.0 / 4 && conf == 2.0 / 3)
    assert(math.abs(lift - (2.0 * 4) / (3.0 * 2)) < 1e-15)
  }

  test("pairRules: item below the floor never reaches the pair join") {
    val baskets = Seq((1, "a"), (1, "rare"), (2, "a"), (2, "b"), (3, "a"), (3, "b"))
      .toDF("b", "i")
    val rules = Association.pairRules(baskets, "b", "i", minCount = 2)
    assert(!rules.select("item_a", "item_b").collect()
      .exists(r => r.getString(0) == "rare" || r.getString(1) == "rare"))
  }
}
