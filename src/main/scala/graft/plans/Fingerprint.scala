package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical-text md5 fingerprint as a native expression: one fused
  * loop per row replacing the
  * `md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]",
  * " "), " +", " ")))` Column pipeline (two full regex passes + an
  * intermediate string per pass). Hot across d01 exact dedup, t04,
  * the corpus-clean cascade and the streaming dedup ingest.
  *
  * Bit-exact with the Column form: lowercasing uses the same ICU path
  * as Spark's lower(), the character classes are pure-ASCII (so the
  * per-code-point loop is exactly the regex semantics), and the digest
  * is md5 over the UTF-8 bytes like Spark's md5().
  */
case class Fingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  protected override def nullSafeEval(input: Any): Any =
    Fingerprint.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Fingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static entry point referenced by generated code. */
  def compute(text: UTF8String): UTF8String = {
    val lowered = org.apache.spark.sql.catalyst.util.CollationSupport
      .Lower.execBinaryICU(text).toString
    // canonicalize: keep [a-z0-9 ], everything else becomes a space;
    // collapse space runs; trim. One pass over code points — the kept
    // classes are ASCII, so non-ASCII code points (any width) each
    // collapse into the same space a regex replacement would produce.
    val sb = new java.lang.StringBuilder(lowered.length)
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (keep) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
      } else {
        pendingSpace = true // space or replaced char: collapse + trim
      }
      i += Character.charCount(cp)
    }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((digest(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexDigits(digest(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }
}
