package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed [[Aggregator]] computing the element-wise mean of float vectors in
  * one pass — the custom-aggregate machinery of the engine (SURVEY §2.11
  * anticipated exactly one such need: vector aggregation for similarity).
  *
  * Versus the `posexplode + groupBy(dim)` formulation this avoids the ×dim
  * row explosion and gets full map-side partial aggregation: each task
  * reduces its vectors into a single (sums, count) buffer, and only k×dim
  * doubles cross the shuffle. Buffer merge order is task-scheduling-dependent,
  * so results are deterministic up to double-addition ULPs (same as any
  * distributed mean).
  */
class VectorMean(dim: Int)
    extends Aggregator[Seq[Float], VectorMean.Buf, Seq[Double]] {

  override def zero: VectorMean.Buf = VectorMean.Buf(new Array[Double](dim), 0L)

  override def reduce(b: VectorMean.Buf, a: Seq[Float]): VectorMean.Buf = {
    var i = 0
    val n = math.min(dim, a.length)
    while (i < n) { b.sums(i) += a(i); i += 1 }
    VectorMean.Buf(b.sums, b.n + 1)
  }

  override def merge(x: VectorMean.Buf, y: VectorMean.Buf): VectorMean.Buf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    VectorMean.Buf(x.sums, x.n + y.n)
  }

  override def finish(b: VectorMean.Buf): Seq[Double] =
    if (b.n == 0) Seq.fill(dim)(0.0)
    else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VectorMean.Buf] = ExpressionEncoder[VectorMean.Buf]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

object VectorMean {
  case class Buf(sums: Array[Double], n: Long)
}
