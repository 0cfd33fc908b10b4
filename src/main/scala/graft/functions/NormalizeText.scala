package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode text normalization — the first
  * step of every web-scale text curation pipeline (casefold + diacritic
  * fold before dedup/lang-ID/tokenization, cf. CCNet/C4 preprocessing).
  * One pass per row:
  *
  *   1. NFC-normalize (UAX #15) — composed and decomposed spellings of the
  *      same grapheme ("é" vs "e"+U+0301) collapse to one byte sequence, so
  *      hashes/fingerprints downstream agree;
  *   2. lowercase (root locale — no Turkish-İ surprises varying by host);
  *   3. strip diacritics: NFD-decompose and drop non-spacing marks
  *      (category Mn) — "café"/"CAFÉ"/"cafe" all normalize to "cafe",
  *      while non-mark letters (ø, ß, œ) pass through unchanged, matching
  *      utf8proc/DuckDB `strip_accents` semantics (alignment spot-verified
  *      over the Latin repertoire in the oracle fixture).
  *
  * Spark lacks a built-in for any of these (UAX #15 isn't expressible with
  * `translate`/`regexp_replace` — the mark repertoire is ~2k codepoints),
  * which is why this is a custom expression rather than a composition.
  * Whole-stage codegen emits one static call — no boxing beyond the
  * unavoidable String materialization the JDK Normalizer requires; the
  * expression stays inside the WholeStageCodegen span, so filters composed
  * on top still push down around it.
  *
  * NULL in → NULL out. Registered in SQL as `graft_normalize_text` via
  * [[graft.GraftExtensions]].
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_text expects a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    NormalizeText.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  /** NFC → lowercase(ROOT) → NFD → drop Mn. Fast path: pure-ASCII inputs
    * (the overwhelming majority of a real web corpus after lang-ID) skip
    * the Normalizer entirely — one byte scan + in-place ASCII lowercase.
    */
  def normalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val bytes = u.getBytes
    var ascii = true
    var needsLower = false
    var i = 0
    while (i < bytes.length && ascii) {
      val b = bytes(i)
      if (b < 0) ascii = false
      else if (b >= 'A' && b <= 'Z') needsLower = true
      i += 1
    }
    if (ascii) {
      if (!needsLower) return u
      val out = new Array[Byte](bytes.length)
      var j = 0
      while (j < bytes.length) {
        val b = bytes(j)
        out(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        j += 1
      }
      return UTF8String.fromBytes(out)
    }
    import java.text.Normalizer
    val nfc = Normalizer.normalize(u.toString, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var k = 0
    while (k < nfd.length) {
      val cp = nfd.codePointAt(k)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      k += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
