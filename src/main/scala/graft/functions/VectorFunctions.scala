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

  /** Codegen'd fast path over float arrays — see [[CosineSimilarity]];
    * bit-for-bit equivalent to [[cosine]] on `ArrayType(FloatType)` inputs.
    */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
