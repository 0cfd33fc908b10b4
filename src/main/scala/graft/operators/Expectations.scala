package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations. The reference's ENTIRE test
  * surface is dbt schema tests — `not_null` on every model column the DAG
  * depends on (SURVEY §5; `dbt/models/staging/schema.yml`) — and the same
  * idea ships in Delta Live Tables as expectations with report/drop
  * actions. Engine-side, a rule set becomes the fewest passes its mix
  * allows:
  *
  *   - all ROW-LOCAL rules (`not_null`, `accepted_values`, arbitrary
  *     predicates) fold into ONE map-side aggregate over a single scan —
  *     adding a rule costs an expression, not a pass;
  *   - each `unique` is one map-combined groupBy on its key;
  *   - each `relationships` (FK) is one anti-join against the distinct
  *     parent keys.
  *
  * At 100 TB that means the whole dbt test suite for a model is one scan
  * plus one shuffle per keyed rule — never a scan per test, which is what
  * `SELECT count(*) WHERE col IS NULL` per rule degenerates to.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** dbt `not_null`. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null:$col"
  }
  /** dbt `unique` (composite keys allowed). Violations = number of DISTINCT
    * key values that occur more than once (dbt's count).
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique:${cols.mkString("+")}"
  }
  /** dbt `accepted_values`. NULL is a violation only if `not_null` says so
    * — mirror dbt, where the two tests are independent.
    */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Rule {
    def name = s"accepted_values:$col"
  }
  /** dbt `relationships`: every non-NULL child key has a parent. Violations
    * = child ROWS with no parent (dbt's count).
    */
  final case class Relationship(col: String, ref: DataFrame, refCol: String) extends Rule {
    def name = s"relationships:$col"
  }
  /** DLT-style arbitrary expectation: a row violates when the predicate is
    * FALSE or NULL.
    */
  final case class Expect(label: String, predicate: Column) extends Rule {
    def name = s"expect:$label"
  }

  private def rowLocalViolation(r: Rule): Option[(String, Column)] = r match {
    case NotNull(c) => Some(r.name -> col(c).isNull)
    case AcceptedValues(c, vs) =>
      Some(r.name -> (col(c).isNotNull && !col(c).isin(vs: _*)))
    case Expect(_, p) => Some(r.name -> !coalesce(p, lit(false)))
    case _ => None
  }

  /** One (rule, n_violations) row per rule — the dbt test report.
    * IDENTICAL duplicate rules are de-duplicated by name (the row-local
    * counts travel through a map() literal and Spark's default
    * mapKeyDedupPolicy=EXCEPTION would otherwise throw at runtime on the
    * same rule listed twice), but two DIFFERENT rules sharing a name are
    * rejected: silently keeping the first would report a check as passed
    * that was never evaluated. (Column/DataFrame equality is structural /
    * by-reference respectively — a re-constructed but semantically equal
    * `Expect`/`Relationship` may compare unequal and be rejected; give such
    * rules distinct labels, which is what the report keys on anyway.)
    */
  def report(df: DataFrame, rulesIn: Seq[Rule]): DataFrame = {
    require(rulesIn.nonEmpty, "report needs at least one rule")
    val byName = scala.collection.mutable.LinkedHashMap.empty[String, Rule]
    rulesIn.foreach { r =>
      byName.get(r.name) match {
        case None => byName(r.name) = r
        case Some(prev) => require(prev == r,
          s"two different rules share the name '${r.name}' — the second " +
            "would be silently dropped; give them distinct labels/columns")
      }
    }
    val rules = byName.values.toSeq
    val rowLocal = rules.flatMap(rowLocalViolation)
    val parts = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      val agg = df.agg(
        sum(when(rowLocal.head._2, 1L).otherwise(0L)).as("v0"),
        rowLocal.tail.zipWithIndex.map { case ((_, v), i) =>
          sum(when(v, 1L).otherwise(0L)).as(s"v${i + 1}") }: _*)
      parts += agg.select(explode(map(
          rowLocal.zipWithIndex.flatMap { case ((n, _), i) =>
            Seq(lit(n), coalesce(col(s"v$i"), lit(0L))) }: _*))
        .as(Seq("rule", "n_violations")))
    }
    rules.foreach {
      case r @ Unique(cols) =>
        parts += df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case r @ Relationship(c, ref, refCol) =>
        parts += df.filter(col(c).isNotNull).select(col(c))
          .join(ref.select(col(refCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case _ => ()
    }
    parts.result().reduce(_ unionByName _)
  }

  /** DLT enforcement for the row-local rules: the input rows plus a
    * `failed_rules` column (comma-joined names, '' = clean) — callers
    * split on it to route clean rows forward and quarantine the rest.
    * Keyed rules (`unique`/`relationships`) are corpus properties, not
    * row properties, and stay in [[report]].
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowLocal = rules.flatMap(rowLocalViolation)
    require(rowLocal.nonEmpty, "quarantine needs at least one row-local rule")
    df.withColumn("failed_rules", concat_ws(",",
      rowLocal.map { case (n, v) => when(v, lit(n)) }: _*))
  }

  /** Per-column statistical profile of a frame — count, nulls, exact
    * distinct, min/max over the DOUBLE view of each column — as one row per
    * column. ONE pass over the data: columns explode to (col_name, v) pairs
    * and a single map-side-combinable aggregate carries every statistic
    * (countDistinct plans the standard two-phase expand). Everything
    * emitted is exact integer/extremal arithmetic — no means or float sums,
    * so profiles compare bit-identically across engines and partitionings.
    */
  def profile(df: DataFrame, cols: Seq[String], tag: String): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*))
        .as("__x"))
      .select(col("__x.col_name").as("col_name"), col("__x.v").as("v"))
      .groupBy("col_name")
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as(s"nulls_$tag"),
        countDistinct(col("v")).as(s"ndv_$tag"),
        min(col("v")).as(s"min_$tag"),
        max(col("v")).as(s"max_$tag"))
  }

  /** SNAPSHOT DRIFT audit between two versions of a table (before/after a
    * batch of commits — the table-level data-quality monitor every
    * production warehouse runs beside row-level expectations, cf.
    * Deequ/Delta metrics): joins the two [[profile]]s per column and flags
    * what changed — row delta, null-fraction movement, value-range
    * expansion (new values OUTSIDE the old min/max — the classic upstream
    * schema-semantics break that type checks can't see). Cost: one pass
    * per side, a columns-sized join; pairs naturally with
    * [[graft.sources.TxLog.versionAsOf]] time travel, which is what makes
    * the "before" reproducible at all.
    */
  def snapshotDrift(before: DataFrame, after: DataFrame,
                    cols: Seq[String]): DataFrame =
    profile(before, cols, "before")
      .join(profile(after, cols, "after"), Seq("col_name"), "full_outer")
      .withColumn("row_delta", col("n_after") - col("n_before"))
      .withColumn("range_expanded",
        col("min_after") < col("min_before") ||
          col("max_after") > col("max_before"))
}
