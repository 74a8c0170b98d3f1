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

  private[functions] val set: java.util.HashSet[String] = toSet(Pieces)

  private[functions] def toSet(pieces: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.size * 2)
    pieces.foreach(s.add)
    s
  }

  /** Load an EXTERNAL vocabulary artifact from a table — the deploy
    * path (a shipped tokenizer's piece list read from parquet/JSON)
    * where [[Pieces]] is the oracle-replayable library constant. Keeps
    * only multi-character pieces (single characters are the encoder's
    * implicit fallbacks), distinct, sorted for a deterministic
    * expression tree.
    *
    * Driver-side collect, justified class: a tokenizer vocabulary is a
    * bounded artifact (30k-250k rows for every published tokenizer) —
    * the broadcast-table size class, never corpus-scaled.
    */
  def fromTable(vocab: org.apache.spark.sql.DataFrame,
                piece: org.apache.spark.sql.Column): Seq[String] =
    // filter + distinct run Spark-side so the driver transfer is
    // bounded by DISTINCT multi-char pieces, not raw rows (a
    // corpus-derived vocab table can carry heavy duplication);
    // normalize() stays the single audited copy of the final rules
    normalize(vocab.select(piece.cast("string").as("p"))
      .filter(org.apache.spark.sql.functions.col("p").isNotNull &&
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("p")) >= 2)
      .distinct()
      .collect().map(_.getString(0)).toSeq)

  /** Load a HuggingFace/BERT-style `vocab.txt` artifact — one token
    * per line, `##`-prefixed continuation pieces, bracketed special
    * tokens (`[PAD]`, `[UNK]`, `[CLS]`, …). The mapping into this
    * encoder's simplified model is documented: the `##` prefix is
    * STRIPPED (pieces here match at any position in a word, so the
    * continuation distinction collapses onto the same piece string)
    * and special tokens are dropped (this encoder never emits
    * sentinels — unmatched characters are their own pieces). The rest
    * is [[fromTable]]'s normalization: multi-char, distinct, sorted.
    *
    * Read driver-side through the Hadoop filesystem (works for
    * file://, HDFS, S3A alike) — a vocabulary file is the bounded
    * artifact class (30k-250k lines), and line ORDER must not depend
    * on a distributed read's partitioning.
    */
  def fromVocabFile(path: String): Seq[String] =
    normalize(graft.ops.Staging.readString(path).split('\n').toSeq
      .map(_.stripSuffix("\r"))
      .filter(_.nonEmpty)
      .filterNot(l => l.startsWith("[") && l.endsWith("]"))
      .map(l => if (l.startsWith("##")) l.substring(2) else l))

  /** Shared normalization for every vocabulary source: keep only
    * multi-character pieces (single characters are the encoder's
    * implicit fallbacks), distinct, sorted for a deterministic
    * expression tree.
    */
  private def normalize(pieces: Seq[String]): Seq[String] =
    pieces.filter(_.length >= 2).distinct.sorted
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

  def segment(text: UTF8String): UTF8String =
    segment(text, WordpieceVocab.set, WordpieceVocab.MaxLen)

  /** Vocabulary-parameterized form: same greedy longest-prefix walk
    * against an arbitrary piece set (the [[WordpieceVocab.fromTable]]
    * deploy path).
    */
  def segment(text: UTF8String, vocab: java.util.HashSet[String],
              maxLen: Int): UTF8String = {
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
        segmentWord(s, wordStart, i, sb, vocab, maxLen)
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
                          sb: java.lang.StringBuilder,
                          vocab: java.util.HashSet[String],
                          maxLen: Int): Unit = {
    var pos = from
    var firstPiece = true
    while (pos < until) {
      var len = math.min(maxLen, until - pos)
      var step = 0
      while (len >= 2 && step == 0) {
        if (vocab.contains(s.substring(pos, pos + len))) step = len
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

/** `graft_wordpiece(text)` — see [[WordpieceKernels.segment]].
  * `pieces = None` runs the library-constant vocabulary through the
  * static set (the oracle-replayable path); `Some(pieces)` carries an
  * external vocabulary into codegen as a reference object — same
  * kernel, zero per-row overhead beyond the hash probes it already
  * does. The vocabulary participates in expression equality via the
  * piece SEQUENCE (a HashSet field would break semanticEquals).
  */
case class WordpieceSegment(child: Expression,
                            pieces: Option[Seq[String]] = None)
    extends UnaryExpression {

  @transient private lazy val vocabSet: java.util.HashSet[String] =
    pieces.fold(WordpieceVocab.set)(WordpieceVocab.toSet)
  @transient private lazy val vocabMaxLen: Int =
    pieces.fold(WordpieceVocab.MaxLen)(p =>
      if (p.isEmpty) 2 else p.map(_.length).max)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_wordpiece"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    WordpieceKernels.segment(s.asInstanceOf[UTF8String], vocabSet,
      vocabMaxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    pieces match {
      case None =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.WordpieceKernels.segment($c)")
      case Some(_) =>
        val setRef = ctx.addReferenceObj("wordpieceVocab", vocabSet,
          "java.util.HashSet<String>")
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.WordpieceKernels.segment($c, $setRef, $vocabMaxLen)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column API for the wordpiece kernel. */
object WordpieceFunctions {
  def wordpiece(text: Column): Column =
    GraftBridge.column(WordpieceSegment(GraftBridge.expression(text)))

  /** Encode against an EXTERNAL vocabulary (a shipped tokenizer
    * artifact loaded via [[WordpieceVocab.fromTable]]) — same greedy
    * encoder, caller-supplied piece table.
    */
  def wordpiece(text: Column, pieces: Seq[String]): Column =
    GraftBridge.column(WordpieceSegment(GraftBridge.expression(text),
      Some(pieces)))
}
