package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static wordpiece vocabulary for the greedy subword encoder.
  *
  * Real tokenizers learn this table (BPE merges / wordpiece likelihood)
  * and ship it as an artifact; the ENCODER — greedy longest-prefix
  * match, every single character a fallback piece — is the same
  * regardless of how the table was learned. The table here is a fixed
  * library constant so the DuckDB oracle can replay the identical
  * segmentation (the oracle's step CASE is generated from this Seq —
  * one source of truth); a deployment would load its trained vocabulary
  * into the same structure.
  *
  * Simplification vs BERT-style wordpiece, documented: no `##`
  * continuation marking (a piece matches anywhere in the word) and no
  * [UNK] — unmatched characters are their own single-char pieces, so
  * encoding never loses text and concatenating pieces always restores
  * the word (property-tested).
  */
object WordpieceVocab {

  /** Multi-character pieces; single characters are implicit fallbacks. */
  val Pieces: Seq[String] = Seq(
    "custom",
    "spark",
    "wind", "data", "hash", "join", "line", "part", "scan", "slow",
    "sort", "fast",
    "row", "key", "agg", "big", "dup", "the", "tab", "val", "vec",
    "tor", "str", "eam", "col", "umn", "fil", "ter", "ery", "der",
    "bat", "all", "mer", "gro", "dow",
    "ow", "le", "ue", "er", "qu", "or", "ch", "sm", "ge", "up")

  val MaxLen: Int = Pieces.map(_.length).max

  private[functions] val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](Pieces.size * 2)
    Pieces.foreach(s.add)
    s
  }
}

/** Greedy longest-prefix wordpiece segmentation kernel: one pass per
  * document, word boundaries at single 0x20 (the corpus token
  * contract shared with [[graft.ext.TextHash.tokens]] and the DuckDB
  * `string_split(text, ' ')` oracle side). Output is the pieces of all
  * words joined by single spaces — `size(split(out, ' '))` IS the
  * wordpiece token count the packing/budget operators need.
  *
  * At each position the longest vocabulary piece (≤ MaxLen, ≥ 2 chars)
  * matching the remaining word wins; otherwise one character is
  * emitted. Progress is ≥ 1 char per piece, so the loop is linear in
  * the text. Fused into a single codegen'd projection — the
  * compositional alternative (per-token HOF with an iterative
  * longest-match) is a CodegenFallback interpreter with per-element
  * re-evaluation.
  */
object WordpieceKernels {

  def segment(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length * 2)
    var i = 0
    val n = s.length
    var wordStart = 0
    var first = true
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (!first) sb.append(' ')
        first = false
        segmentWord(s, wordStart, i, sb)
        wordStart = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Append the pieces of s[from, until) joined by spaces. An empty
    * word appends nothing (its group is the empty string, matching the
    * oracle's string_agg of an empty segmentation).
    */
  private def segmentWord(s: String, from: Int, until: Int,
                          sb: java.lang.StringBuilder): Unit = {
    var pos = from
    var firstPiece = true
    while (pos < until) {
      var len = math.min(WordpieceVocab.MaxLen, until - pos)
      var step = 0
      while (len >= 2 && step == 0) {
        if (WordpieceVocab.set.contains(s.substring(pos, pos + len))) step = len
        len -= 1
      }
      if (step == 0) {
        // single-CODEPOINT fallback: a non-BMP char is a surrogate
        // pair of two UTF-16 units — splitting it would emit lone
        // surrogates (encoded '?'), destroying the 'concat of pieces
        // restores the word' invariant for any emoji/CJK-ext corpus
        step = Character.charCount(s.codePointAt(pos))
        if (pos + step > until) step = until - pos // defensive: never cross the word
      }
      if (!firstPiece) sb.append(' ')
      firstPiece = false
      sb.append(s, pos, pos + step)
      pos += step
    }
  }
}

/** `graft_wordpiece(text)` — see [[WordpieceKernels.segment]]. */
case class WordpieceSegment(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_wordpiece"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    WordpieceKernels.segment(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordpieceKernels.segment($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column API for the wordpiece kernel. */
object WordpieceFunctions {
  def wordpiece(text: Column): Column =
    GraftBridge.column(WordpieceSegment(GraftBridge.expression(text)))
}
