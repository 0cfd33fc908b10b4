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
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.cosineEntry)
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

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "built-in")
}
