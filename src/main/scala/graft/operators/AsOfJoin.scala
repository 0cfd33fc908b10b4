package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — J1, the heart of the reference's
  * `int_session_driver_laps` model
  * (`/root/reference/dbt/models/intermediate/int_session_driver_laps.sql:41-78`):
  * each left row is matched to the single latest right row with equal keys and
  * `right.ts <= left.ts`; left rows with no prior right row survive with NULLs.
  *
  * Two formulations, proven equivalent in tests:
  *   - [[joinFormulation]] — reference-faithful: equi+range left join then
  *     `row_number() = 1`. Simple, but the join materializes every (left row ×
  *     earlier right row) pair before the rank filter — quadratic blow-up per
  *     key at 100 TB (SURVEY §7.4.3).
  *   - [[unionMergeFormulation]] — scale path: union both sides into one
  *     event stream and take `last(payload, ignoreNulls)` over an unbounded
  *     preceding window. One shuffle + one sort, output linear in input.
  */
object AsOfJoin {

  /** @param on            equi-key pairs (leftCol, rightCol)
    * @param leftRowKey    unique key of the left relation (the rank partition)
    * @param rightTieBreak extra right ordering columns (descending) so equal
    *                      timestamps resolve deterministically
    * @param leftSelect    (srcCol, outName) projection from the left side
    * @param rightSelect   (srcCol, outName) projection from the matched right row
    */
  def joinFormulation(
      left: DataFrame, right: DataFrame,
      on: Seq[(String, String)], leftTs: String, rightTs: String,
      leftRowKey: Seq[String], rightTieBreak: Seq[String],
      leftSelect: Seq[(String, String)], rightSelect: Seq[(String, String)]): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val keyCond = on.map { case (lk, rk) => col(s"l.$lk") === col(s"r.$rk") }.reduce(_ && _)
    val cond = keyCond && (col(s"r.$rightTs") <= col(s"l.$leftTs"))
    val w = Window
      .partitionBy(leftRowKey.map(k => col(s"l.$k")): _*)
      .orderBy((col(s"r.$rightTs").desc +: rightTieBreak.map(c => col(s"r.$c").desc)): _*)
    l.join(r, cond, "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((leftSelect.map { case (s, n) => col(s"l.$s").as(n) } ++
               rightSelect.map { case (s, n) => col(s"r.$s").as(n) }): _*)
  }

  /** Union-merge formulation. Right rows sort BEFORE left rows at equal
    * timestamps (inclusive `<=` boundary), and among equal-timestamp right
    * rows the LAST in ascending tie-break order wins — matching
    * [[joinFormulation]]'s `order by ts desc, tieBreak desc` pick.
    */
  def unionMergeFormulation(
      left: DataFrame, right: DataFrame,
      on: Seq[(String, String)], leftTs: String, rightTs: String,
      rightTieBreak: Seq[String],
      leftSelect: Seq[(String, String)], rightSelect: Seq[(String, String)]): DataFrame = {
    val keyNames = on.indices.map(i => s"__k$i")
    val tieNames = rightTieBreak.indices.map(i => s"__tie$i")

    val rPart = right.select(
      on.map { case (_, rk) => col(rk) }.zip(keyNames).map { case (c, n) => c.as(n) } ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(rightSelect.map { case (s, n) => col(s).as(n) }: _*).as("__rpay")) ++
        rightTieBreak.zip(tieNames).map { case (c, n) => col(c).as(n) }: _*)
    val rPayType = rPart.schema("__rpay").dataType

    val lPart0 = left.select(
      on.map { case (lk, _) => col(lk) }.zip(keyNames).map { case (c, n) => c.as(n) } ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(rPayType).as("__rpay"),
          struct(leftSelect.map { case (s, n) => col(s).as(n) }: _*).as("__lpay")) ++
        tieNames.map(n => lit(null).cast(rPart.schema(n).dataType).as(n)): _*)
    val lPayType = lPart0.schema("__lpay").dataType
    val rPartAligned = rPart.withColumn("__lpay", lit(null).cast(lPayType))

    val unioned = rPartAligned.unionByName(lPart0)
    val w = Window
      .partitionBy(keyNames.map(col): _*)
      .orderBy((Seq(col("__ts").asc, col("__side").asc) ++ tieNames.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Join-key outputs come from the TOP-LEVEL __k columns, not the struct:
    // Project is alias-aware about output partitioning, so downstream
    // operators clustered on these keys (feature windows, per-driver
    // aggregates) reuse this window's hashpartitioning instead of
    // re-exchanging — the whole feature layer then needs sorts only.
    val keyOut: Map[String, String] =
      on.map(_._1).zip(keyNames).toMap // left key col -> __k alias
    unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftSelect.map { case (s, n) =>
                 keyOut.get(s).map(k => col(k).as(n)).getOrElse(col(s"__lpay.$n").as(n)) } ++
               rightSelect.map { case (_, n) => col(s"__match.$n").as(n) }): _*)
  }
}
