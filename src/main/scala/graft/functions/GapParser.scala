package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

/** F4 — the reference's only nontrivial string parser,
  * `normalize_intervals_df` (`/root/reference/dags/open_f1_historical.py:81-108`):
  * `gap_to_leader` strings like `"+1 LAP"` → `"1"` (first integer token),
  * `"+3.729"` → `"3.729"` (`str(float(x))`), unparseable → NULL; and
  * `driver_number` `"44.0"` → 44 (int-floored).
  *
  * Pure Catalyst expressions (codegen'd) — no UDF. The numeric branch guards
  * with a regex instead of `try_cast` so the exact same predicate is
  * expressible in the DuckDB oracle; Spark's double→string rendering matches
  * Python's `repr` for the short decimal forms the OpenF1 API emits
  * (`"1.0"`, `"3.729"`).
  */
object GapParser {

  /** Strict decimal-literal shape accepted by the numeric branch. Mirrors what
    * `float(s)` accepts in the data actually seen (signed decimals); exotic
    * forms (exponents, inf) are deliberately out — the reference nulls them in
    * practice via its try/except.
    */
  val NumericRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$"

  /** Regex-guarded double parse — NULL instead of ANSI cast error. */
  def tryDouble(c: Column): Column =
    when(trim(c).rlike(NumericRe), trim(c).cast(DoubleType))

  /** gap_to_leader normalization (`:88-101`). */
  def parseGap(c: Column): Column = {
    val t = upper(trim(c))
    val firstInt = regexp_extract(t, "([0-9]+)", 1)
    when(c.isNull, lit(null).cast(StringType))
      .when(t.contains("LAP"),
        when(length(firstInt) > 0, firstInt.cast(IntegerType).cast(StringType)))
      .otherwise(tryDouble(c).cast(StringType))
  }

  /** driver_number normalization: `int(float(strip(x)))` or NULL (`:82-86`).
    * floor() first keeps the double integral so the ANSI double→int cast is
    * exact; the reference truncates toward zero via `int()` but only ever sees
    * non-negative driver numbers, where floor ≡ truncate.
    */
  def parseIntFloored(c: Column): Column =
    floor(tryDouble(c)).cast(IntegerType)
}
