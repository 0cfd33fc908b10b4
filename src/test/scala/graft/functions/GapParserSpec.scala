package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F4 semantics pinned against `normalize_intervals_df`
  * (`/root/reference/dags/open_f1_historical.py:81-108`).
  */
class GapParserSpec extends SparkSpec {
  import spark.implicits._

  private def parse(vals: (String, String)*): Map[String, Option[String]] = {
    val df = vals.toSeq.toDF("k", "v")
    df.select($"k", GapParser.parseGap($"v").as("p")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
  }

  test("LAP forms take the first integer token") {
    val out = parse("a" -> "+1 LAP", "b" -> "2 LAPS", "c" -> "LAP", "d" -> "lap 3")
    assert(out("a") == Some("1"))
    assert(out("b") == Some("2"))
    assert(out("c") == None)       // no digits → NULL
    assert(out("d") == Some("3"))  // case-insensitive
  }

  test("numeric forms render like python str(float(x))") {
    val out = parse("a" -> "+3.729", "b" -> "0.0", "c" -> "7", "d" -> " 12.5 ")
    assert(out("a") == Some("3.729"))
    assert(out("b") == Some("0.0"))
    assert(out("c") == Some("7.0")) // int-like → float repr
    assert(out("d") == Some("12.5")) // stripped first
  }

  test("garbage and null → NULL") {
    val out = parse("a" -> "garbage", "b" -> "", "c" -> "1.2.3")
    assert(out("a") == None && out("b") == None && out("c") == None)
    val n = Seq(("k", null: String)).toDF("k", "v")
      .select(GapParser.parseGap($"v")).head()
    assert(n.isNullAt(0))
  }

  test("driver_number int-floor: '44.0' → 44, junk → NULL") {
    val df = Seq("44.0", "44", " 7.0 ", "x").toDF("v")
      .select($"v", GapParser.parseIntFloored($"v").as("p"))
    val out = df.collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out("44.0") == Some(44) && out("44") == Some(44) &&
      out(" 7.0 ") == Some(7) && out("x") == None)
  }
}
