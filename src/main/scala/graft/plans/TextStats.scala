package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-scoring statistics as ONE native per-row pass — the
  * signals graft.functions.TextAnalysis derives with five separate
  * regex scans (4 language stopword extract-alls + Han rlike) plus
  * three more for quality (stopword count, punctuation count, token
  * split):
  *
  *   han  — any BMP Han char (U+4E00..U+9FFF) in the lowered text
  *   en/es/de/fr — DISTINCT language-stopword hits (the
  *          `size(array_distinct(regexp_extract_all(t,'\b(..)\b',1)))`
  *          semantics: a \b-delimited word run counts once per
  *          distinct set member it equals)
  *   qsh  — TOTAL quality-stopword matches
  *          (`regexp_count(t,'\b(..)\b')`: one per matching run)
  *   nw   — whitespace token count with the exact
  *          `size(split(trim(text),'\s+'))` quirks: trim strips
  *          0x20 only, Java split (limit -1) keeps one empty token
  *          per leading and per trailing non-space whitespace run,
  *          blank→0 — computed on the ORIGINAL text (ICU lowering
  *          can change code-unit positions)
  *   pc   — `regexp_count(t,'[^a-z0-9\s]')`: code points of the
  *          lowered text outside [a-z0-9] and ASCII \s
  *   nc   — `length(text)`: code points of the ORIGINAL text
  *
  * Bit-equivalence with the Column formulations is pinned by a
  * PropertySpec adversarial-text comparison; the DuckDB oracle SQL
  * (TextOps) is untouched — it replays the Column semantics, which
  * this expression reproduces exactly. Word boundaries follow Java
  * regex defaults: \w = ASCII [A-Za-z0-9_], \s = ASCII
  * [ \t\n\x0B\f\r]; lowering goes through Spark's ICU path, and `nc`
  * is measured BEFORE lowering (ICU lowercasing can change code-point
  * counts).
  *
  * NOTE: like every graft text expression (SimHash64, Shingles), the
  * ICU lowering is PINNED — it does not consult
  * `spark.sql.icu.caseMappings.enabled`. A session running with that
  * JDK-compat escape hatch OFF would see `lower()` diverge from this
  * expression for the handful of code points where ICU and JDK case
  * mapping differ; graft pins ICU so signatures and scores are
  * identical across sessions regardless of that conf. To close the
  * loop, every graft session entry point (Bench, Verify, Explain,
  * ProfMain, the test session) FORCES the conf to true, so the
  * Column forms ride the same path and the PropertySpec equivalences
  * hold by construction, not by default.
  */
case class TextStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = TextStats.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_textstats"

  protected override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val Schema: StructType = StructType(Seq(
    StructField("han", BooleanType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("qsh", IntegerType, nullable = false),
    StructField("nw", IntegerType, nullable = false),
    StructField("pc", IntegerType, nullable = false),
    StructField("nc", IntegerType, nullable = false)))

  // word lists mirror graft.functions.TextAnalysis.{StopwordSets,
  // QualityStopwords}; TextAnalysisSpec pins them equal so the two
  // definitions can't drift. Longest listed word is 4 chars — the
  // run-matching loop skips longer runs outright.
  val LangWords: Array[Array[String]] = Array(
    Array("the", "a", "of", "to", "and", "is", "in", "that"),
    Array("el", "la", "de", "que", "y", "los", "una", "por"),
    Array("der", "die", "und", "das", "ist", "mit", "von", "ein"),
    Array("le", "les", "des", "une", "et", "est", "dans", "pour"))
  val QualityWords: Array[String] =
    Array("the", "a", "of", "to", "and", "is", "in", "that", "for", "it")
  private val MaxWordLen = 4

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isSpaceChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static entry point referenced by generated code. */
  def compute(text: UTF8String): InternalRow = {
    val nc = text.numChars()
    // ICU lowering — identical to the lower() function (SimHash64's
    // locale note applies)
    val lowered = org.apache.spark.sql.catalyst.util.CollationSupport
      .Lower.execBinaryICU(text).toString

    var han = false
    var qsh = 0
    var pc = 0
    var m0, m1, m2, m3 = 0

    val n = lowered.length
    var i = 0
    var runStart = -1
    while (i <= n) {
      val c = if (i < n) lowered.charAt(i) else ' ' // sentinel closes a trailing run
      val word = i < n && isWordChar(c)
      if (word) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        val len = i - runStart
        if (len <= MaxWordLen) {
          var l = 0
          while (l < 4) {
            val ws = LangWords(l)
            var w = 0
            while (w < ws.length) {
              if (ws(w).length == len && lowered.regionMatches(runStart, ws(w), 0, len)) {
                val bit = 1 << w
                l match {
                  case 0 => m0 |= bit
                  case 1 => m1 |= bit
                  case 2 => m2 |= bit
                  case _ => m3 |= bit
                }
              }
              w += 1
            }
            l += 1
          }
          var q = 0
          var hit = false
          while (q < QualityWords.length && !hit) {
            if (QualityWords(q).length == len &&
                lowered.regionMatches(runStart, QualityWords(q), 0, len)) {
              qsh += 1; hit = true
            }
            q += 1
          }
        }
        runStart = -1
      }
      if (i < n) {
        // punctuation ([^a-z0-9\s] per code point) + Han, with
        // supplementary code points consumed as one unit
        if (Character.isHighSurrogate(c) && i + 1 < n &&
            Character.isLowSurrogate(lowered.charAt(i + 1))) {
          pc += 1 // supplementary: never a-z/0-9/ASCII \s
          i += 2
        } else {
          val isLowAlnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
          if (!isLowAlnum && !isSpaceChar(c)) pc += 1
          if (c >= 0x4E00 && c <= 0x9FFF) han = true
          i += 1
        }
      } else i += 1
    }

    // nw on the ORIGINAL text: space-only trim bounds, then
    // \s-run segmentation with the Java-split empty-token quirks
    val orig = text.toString
    val on = orig.length
    var lo = 0
    var hi = on
    while (lo < hi && orig.charAt(lo) == ' ') lo += 1
    while (hi > lo && orig.charAt(hi - 1) == ' ') hi -= 1
    var nw = 0
    if (hi > lo) {
      var runs = 0
      var inRun = false
      var j = lo
      while (j < hi) {
        val ws = isSpaceChar(orig.charAt(j))
        if (!ws && !inRun) { runs += 1; inRun = true }
        else if (ws) inRun = false
        j += 1
      }
      nw = runs
      if (isSpaceChar(orig.charAt(lo))) nw += 1
      if (isSpaceChar(orig.charAt(hi - 1))) nw += 1
    }

    new GenericInternalRow(Array[Any](
      han,
      Integer.bitCount(m0), Integer.bitCount(m1),
      Integer.bitCount(m2), Integer.bitCount(m3),
      qsh, nw, pc, nc))
  }
}
