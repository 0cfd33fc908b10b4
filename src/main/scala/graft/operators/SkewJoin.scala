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
    // NOT deterministic across task retries (monotonically_increasing_id is
    // partition-layout-dependent) — safe HERE and only here because the salt
    // never influences which rows match, only which reducer a (key, salt)
    // pair lands on: a retried task re-salting its rows still joins them to
    // the same replicated-dim rows. Do not reuse this idiom where the derived
    // column reaches the output or a dedup/sample decision (those need the
    // content-hash idiom, `Curation.hash28`). Salting by a hash OF THE KEY
    // would defeat the whole point: the hot key must fan out over n salts.
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew diagnostic: the top-N hottest keys with their row share and skew
    * factor (count ÷ mean-count-per-key) — the measurement that DECIDES
    * between plain AQE, AQE skew-join, and [[saltedJoin]], and picks `n`
    * for the latter (skew_factor ≈ how many reducers the hot key needs).
    *
    * Plan shape: one partial-combined count aggregate, a 1-row global
    * aggregate broadcast back, and a TakeOrderedAndProject top-N — the
    * corpus never shuffles, and only N·tasks rows reach the driver-side
    * merge. Deterministic: ties break on the key columns.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String], topN: Int): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").cast("long").as("__total"),
      count(lit(1)).cast("long").as("__n_keys"))
    counts.crossJoin(broadcast(totals))
      .orderBy(col("cnt").desc +: keyCols.map(col): _*)
      .limit(topN)
      .select(keyCols.map(col) ++ Seq(
        col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("row_share"),
        (col("cnt").cast("double") * col("__n_keys").cast("double") /
          col("__total").cast("double")).as("skew_factor")): _*)
  }
}
