package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (WordPiece-style) token count of lowercased text as a
  * native codegen'd expression — the tokenizer-realistic counting
  * basis for sequence packing (c03's whitespace counts under-budget
  * real training sequences, which are packed on SUBWORD counts).
  *
  * Algorithm: the public BERT WordPiece greedy longest-match — per
  * whitespace word, repeatedly take the LONGEST vocab piece prefixing
  * the remaining suffix (word-start pieces at position 0,
  * "##"-continuation pieces after); any step with no match, or a word
  * over [[SubwordCount.MaxWordChars]] chars, makes the whole word one
  * [UNK]. No backtracking — greedy can UNK a word a different split
  * would cover; that is the published algorithm, pinned by spec.
  *
  * The DEFAULT vocab is PINNED ([[SubwordCount.Vocab]]) so the
  * tokenization is a pure function both engines can evaluate: the
  * DuckDB oracle replays the greedy loop as a generated chain of
  * bounded step CTEs ([[SubwordCount.oracleTokensCtes]]) whose
  * longest-match CASE is built from the same constant — bit-exact, no
  * rows-only face needed. A LEARNED vocab (operators.BpeLearn's
  * pair-frequency merge fit) rides the expression as a per-instance
  * [[SubwordTokenizer]] reference object — same greedy loop, fit
  * pieces — closing the c17→c03c loop with a produced, not pinned,
  * vocabulary.
  *
  * Tokenization mirrors Shingles: ICU lower, space trim, \s+ split.
  */
case class SubwordCount(child: Expression,
    tok: SubwordTokenizer = SubwordCount.pinned)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_subword_count"

  protected override def nullSafeEval(input: Any): Any =
    tok.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("subwordTok", tok,
      classOf[SubwordTokenizer].getName)
    defineCodeGen(ctx, ev, c => s"$t.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)

  // vocab-value equality (the PqCodes convention): two instances over
  // the same piece list are the same expression to the planner
  override def equals(o: Any): Boolean = o match {
    case SubwordCount(c, otok) => c == child && tok.vocab == otok.vocab
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + tok.vocab.hashCode()
}

/** The greedy WordPiece matcher over an arbitrary piece list —
  * word-start pieces plus "##" continuations. Serializable: instances
  * ride generated code as reference objects. */
class SubwordTokenizer(val vocab: Seq[String]) extends Serializable {
  import SubwordCount.{MaxWordChars, Unk}

  // longest-first match order; equal-length pieces can never both
  // prefix the same suffix, so ties are unreachable
  private val starts: Array[String] =
    vocab.filterNot(_.startsWith("##")).sortBy(p => (-p.length, p)).toArray
  private val conts: Array[String] =
    vocab.filter(_.startsWith("##")).map(_.drop(2))
      .sortBy(p => (-p.length, p)).toArray

  private def longestMatch(table: Array[String], rest: String): String = {
    var i = 0
    while (i < table.length) {
      if (rest.startsWith(table(i))) return table(i)
      i += 1
    }
    null
  }

  /** Greedy piece list of one (already lowercased) word;
    * Seq([[SubwordCount.Unk]]) when uncovered. */
  def encode(word: String): Seq[String] = {
    if (word.isEmpty || word.length > MaxWordChars) return Seq(Unk)
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val m = longestMatch(if (pos == 0) starts else conts,
        word.substring(pos))
      if (m == null) return Seq(Unk)
      out += (if (pos == 0) m else "##" + m)
      pos += m.length
    }
    out.result()
  }

  /** Total subword pieces of the text (generated-code entry point). */
  def compute(text: UTF8String): Long = {
    val lowered = org.apache.spark.sql.catalyst.util
      .CollationSupport.Lower.execBinaryICU(text)
    val trimmed = lowered.trim.toString
    if (trimmed.isEmpty) return 0L
    val toks = SubwordCount.Spaces.split(trimmed, -1)
    var total = 0L
    var i = 0
    while (i < toks.length) {
      total += encode(toks(i)).length
      i += 1
    }
    total
  }
}

object SubwordCount {
  /** Words longer than this are [UNK] outright (BERT's
    * max_input_chars_per_word, small here) — it also bounds the steps
    * the SQL replay must unroll. */
  val MaxWordChars = 16

  val Unk = "[UNK]"

  /** Pinned toy vocab: word-start pieces plus "##" continuations,
    * sized to the documents corpus so every split class occurs there:
    * whole-word hits, 2- and 3-piece splits, a greedy-overlap pair
    * ("ta"/"tab" — greedy must take "tab"+"##le" for "table"), and an
    * uncovered word ("dup" → [UNK]). */
  val Vocab: Seq[String] = Seq(
    // whole words
    "the", "a", "row", "key", "data", "join", "scan", "sort", "hash",
    // word-start fragments
    "ta", "tab", "ba", "val", "mer", "win", "str", "sp", "fil", "col",
    "cus", "vec", "qu", "or", "gr", "li", "par", "sma", "slo", "fa",
    "fas", "ag", "bi",
    // continuations
    "##ble", "##le", "##tch", "##ue", "##ge", "##dow", "##eam", "##ark",
    "##ter", "##umn", "##tom", "##er", "##tor", "##ery", "##der",
    "##oup", "##ne", "##t", "##ll", "##w", "##st", "##g")

  /** The pinned-vocab matcher (the 1-arg SQL function's tokenizer). */
  lazy val pinned: SubwordTokenizer = new SubwordTokenizer(Vocab)

  /** Greedy piece list under the PINNED vocab (fidelity-spec entry). */
  def encode(word: String): Seq[String] = pinned.encode(word)

  /** Static entry point kept for external callers: total subword
    * pieces of the text under the pinned vocab. */
  def compute(text: UTF8String): Long = pinned.compute(text)

  private[plans] val Spaces = java.util.regex.Pattern.compile("\\s+")

  /** DuckDB replay of the greedy loop: `MaxWordChars` unrolled step
    * CTE pairs over a per-word state (rest, piece count, dead flag),
    * with the longest-match as a length-descending CASE generated
    * from [[Vocab]]. Emits CTE text (no WITH keyword) defining
    * `sub(doc_id, tokens)` — per-doc subword totals over `src`, a
    * prior CTE of (doc_id, text). Docs with blank text count 0. */
  def oracleTokensCtes: String = {
    val starts = Vocab.filterNot(_.startsWith("##"))
      .sortBy(p => (-p.length, p))
    val conts = Vocab.filter(_.startsWith("##")).map(_.drop(2))
      .sortBy(p => (-p.length, p))
    def matchCase(pieces: Seq[String]): String =
      pieces.map(p => s"WHEN starts_with(rest, '$p') THEN ${p.length}")
        .mkString("CASE ", " ", " ELSE 0 END")
    val sCase = matchCase(starts)
    val cCase = matchCase(conts)
    val steps = (1 to MaxWordChars).map { k =>
      s"""m$k AS (SELECT doc_id, rest, np, dead,
           CASE WHEN dead OR rest = '' THEN 0
                WHEN np = 0 THEN $sCase
                ELSE $cCase END AS ml
         FROM s${k - 1}),
       s$k AS (SELECT doc_id,
           CASE WHEN ml > 0 THEN substr(rest, ml + 1) ELSE rest END AS rest,
           CASE WHEN ml > 0 THEN np + 1 ELSE np END AS np,
           dead OR (rest <> '' AND ml = 0) AS dead
         FROM m$k)"""
    }.mkString(",\n       ")
    s"""toks AS (SELECT doc_id, w[i] AS word FROM
         (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
          FROM src WHERE len(trim(text)) > 0),
         LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)),
       s0 AS (SELECT doc_id, word AS rest, 0 AS np,
                len(word) > $MaxWordChars AS dead FROM toks),
       $steps,
       fin AS (SELECT doc_id,
                 CASE WHEN dead OR rest <> '' THEN 1 ELSE np END AS pieces
               FROM s$MaxWordChars),
       agg AS (SELECT doc_id, CAST(sum(pieces) AS BIGINT) AS tokens
               FROM fin GROUP BY 1),
       sub AS (SELECT s.doc_id, coalesce(a.tokens, 0) AS tokens
               FROM src s LEFT JOIN agg a ON s.doc_id = a.doc_id)"""
  }
}
