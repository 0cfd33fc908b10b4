package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String): String =
    Option(NormalizeText.normalize(UTF8String.fromString(s)))
      .map(_.toString).orNull

  test("normalize: NFC composes decomposed marks before the strip") {
    // decomposed e + COMBINING ACUTE and composed é collapse identically
    assert(norm("e\u0301tude") == "etude")
    assert(norm("étude") == "etude")
    assert(norm("u\u0308ber") == "uber")
  }

  test("normalize: casefold + accent strip; non-marks survive") {
    assert(norm("CAFÉ NaÏve") == "cafe naive")
    // ß/Ø/Œ are letters, not marks — lowercased, not stripped
    assert(norm("STRAßE") == "straße")
    assert(norm("ØRE Œuf") == "øre œuf")
    assert(norm(null) == null)
  }

  test("ASCII fast path ≡ Normalizer slow path") {
    // force the slow path by appending a non-ASCII char, then strip it
    val asciis = Seq("Hello World", "x", "", "MIXED case 123 !?")
    asciis.foreach { s =>
      val slow = norm(s + "é")
      assert(norm(s) + "e" == slow, s"fast/slow disagree on '$s'")
    }
  }

  test("Column form, SQL form, and interpreted eval agree on real data") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq("Café du MONDE", "élève Über",
      "plain ascii TEXT", "STRAßE ØRE").toDF("t")
    val viaColumn = df.select(TextFunctions.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    df.createOrReplaceTempView("norm_in")
    val viaSql = spark.sql("SELECT graft_normalize_text(t) AS n FROM norm_in")
      .as[String].collect().toSeq
    val viaEval = df.as[String].collect().toSeq.map(norm)
    assert(viaColumn == viaSql)
    assert(viaColumn == viaEval)
    assert(viaColumn == Seq("cafe du monde", "eleve uber",
      "plain ascii text", "straße øre"))
  }
}
