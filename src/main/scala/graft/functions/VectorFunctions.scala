package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `ArrayType(FloatType)` embeddings
  * (extension scope: similarity search). Built on Spark's higher-order array
  * functions (`zip_with`/`aggregate`) — native Catalyst expressions, no UDF
  * serialization, operating in double precision regardless of the stored
  * element type.
  */
object VectorFunctions {

  /** Dot product in double precision; left-to-right accumulation (array order)
    * so results are deterministic across runs and partitionings.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either norm is zero (guard keeps ANSI mode
    * from raising on divide-by-zero).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom =!= 0.0, dot(a, b) / denom)
  }

  /** Element-wise mean of an array-of-vectors column (chunk-embedding
    * pooling): fold with `zip_with` sums in the array's order, then scale by
    * the count — all higher-order Catalyst expressions, codegen'd, no UDF.
    * Pass the vectors pre-sorted (e.g. `sort_array` of (id, vec) structs)
    * when cross-run determinism matters.
    */
  def meanPool(vs: Column): Column = {
    val zero = array_repeat(lit(0.0), size(element_at(vs, 1)))
    val summed = aggregate(vs, zero,
      (acc, v) => zip_with(acc, v, (a, b) => a + b.cast("double")))
    transform(summed, x => x / size(vs).cast("double"))
  }

  /** L2-normalized copy of `v` (unit vector); NULL when the norm is zero. */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n =!= 0.0, transform(v, x => x.cast("double") / n))
  }

  /** Johnson–Lindenstrauss-style random projection d→m: component i is
    * `⟨v, planes(i)⟩ / sqrt(m/12)`. With plane entries i.i.d.-uniform on
    * [-0.5, 0.5) (variance 1/12 — [[graft.operators.Similarity
    * .hyperplanesFrom]]'s deterministic dyadic rationals), the denominator
    * makes the map norm-unbiased: E‖f(v)‖² = ‖v‖², so pairwise distances
    * are preserved in expectation and concentrate as m grows (the JL
    * lemma's sub-Gaussian case). The 100 TB use: collapse 1k-d embeddings
    * to 16–64 dims BEFORE a shuffle-heavy stage (clustering, bucketed
    * near-dup, sort-based sharding) — the projection itself is one
    * codegen'd map over the scan, no shuffle, and cuts the shuffled bytes
    * by d/m. Division (not a precomputed reciprocal) keeps the arithmetic
    * bit-identical to the SQL oracle's `/ sqrt(m/12)`.
    */
  def randomProject(v: Column, planes: Seq[Seq[Double]]): Column = {
    val denom = lit(math.sqrt(planes.length / 12.0))
    array(planes.map(p => dot(v, array(p.map(lit): _*)) / denom): _*)
  }

  /** Codegen'd fast path over float arrays — see [[CosineSimilarity]];
    * bit-for-bit equivalent to [[cosine]] on `ArrayType(FloatType)` inputs.
    */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
