package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions (SURVEY §7.4.6 posture).
  * AQE's skew-join handles most cases at runtime; explicit salting remains
  * the tool when one key dominates so heavily that even split shuffle blocks
  * straggle, or when AQE is unavailable (e.g. inside a cached subtree).
  *
  * The fact (skewed, large) side gets a deterministic salt in [0, n); the
  * dimension side is replicated n× with every salt value, so the join key
  * becomes (key, salt) and the hot key's rows spread over n reducers.
  * Result-equivalent to the unsalted join (spec-proven) — salt assignment
  * affects only placement, never matching.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
