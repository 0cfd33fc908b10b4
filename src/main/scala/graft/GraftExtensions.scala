package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension surface: makes the engine's custom Catalyst expressions
  * callable from SQL. Two entry points:
  *
  *   - configure at launch: `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - or register into a live session: `GraftExtensions.register(spark)`
  *
  * After either, `spark.sql("SELECT cosine_similarity(a, b) ...")` plans the
  * codegen'd [[CosineSimilarity]] expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineEntry)
    e.injectFunction(GraftExtensions.zvalueEntry)
  }
}

object GraftExtensions {
  private def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) {
      // surface the same error class built-in functions raise, with SQL
      // error-class metadata, instead of a bare runtime exception
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`cosine_similarity`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    CosineSimilarity(exprs.head, exprs(1))
  }

  private val cosineEntry = (
    new FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (exprs: Seq[Expression]) => build(exprs))

  /** `graft_zvalue(x, y, bits)` — the Morton interleave as a SQL function.
    * `bits` must be a foldable integer literal (it shapes the expression
    * tree, exactly like the window-frame sizes built-ins take literally).
    */
  private def buildZ(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.GraftColumnBridge
    if (exprs.length != 3) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_zvalue`",
          "expectedNum" -> "3",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    val bits = exprs(2) match {
      case e if e.foldable && e.eval() != null =>
        e.eval().toString.toInt
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "SEED_EXPRESSION_IS_UNFOLDABLE",
        messageParameters = Map(
          "exprWithSeed" -> "`graft_zvalue`", "seedExpr" -> exprs(2).sql))
    }
    // built from raw Catalyst nodes (not the Column API): a function builder
    // must return a tree the analyzer can resolve in place — Column-built
    // trees arrive as unresolvable ColumnNode wrappers here
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Literal, ShiftLeft, ShiftRight}
    import org.apache.spark.sql.types.LongType
    val xs = Cast(exprs.head, LongType)
    val ys = Cast(exprs(1), LongType)
    (0 until bits).map { b =>
      val xb = ShiftLeft(BitwiseAnd(ShiftRight(xs, Literal(b)), Literal(1L)), Literal(2 * b))
      val yb = ShiftLeft(BitwiseAnd(ShiftRight(ys, Literal(b)), Literal(1L)), Literal(2 * b + 1))
      Add(xb, yb)
    }.reduce[Expression]((a, b) => Add(a, b))
  }

  private val zvalueEntry = (
    new FunctionIdentifier("graft_zvalue"),
    new ExpressionInfo(graft.functions.ZOrder.getClass.getName, "graft_zvalue"),
    (exprs: Seq[Expression]) => buildZ(exprs))

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zvalue", buildZ, "built-in")
  }
}
