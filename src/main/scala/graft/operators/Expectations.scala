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
}
