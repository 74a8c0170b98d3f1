package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row term-frequency kernel.
  *
  * The compositional tf shape — `explode(split(text)) →
  * groupBy(doc, term).count()` — shuffles one row per TOKEN through a
  * hash aggregation just to count duplicates that all live in the same
  * source row. This kernel folds that aggregation into the projection:
  * one pass over the text bytes, one open-addressed count per distinct
  * term, emitted as `array<struct<term, tf>>` in first-occurrence
  * order (deterministic in the input). `explode(graft_term_counts(t))`
  * then yields (doc, term, tf) with ZERO shuffle, so tf-idf's only
  * data-sized exchanges are the ones that genuinely cross rows
  * (document frequency and the per-doc top-k window).
  *
  * Tokenization matches [[graft.ext.TextHash.tokens]] (split on a
  * single 0x20; repeated spaces yield empty tokens, which are counted
  * like any term — byte-compatible with `string_split(text, ' ')` in
  * the DuckDB oracle). The 0x20 delimiter never occurs inside a
  * multi-byte UTF-8 sequence, so byte scanning is codepoint-safe
  * (same argument as [[HashKernels.shingleHashes]]).
  */
object TermKernels {

  /** (term, tf) pairs in first-occurrence order. */
  def termCounts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // terms keyed by their byte span; LinkedHashMap preserves
    // first-occurrence order so the output is deterministic
    val counts = new java.util.LinkedHashMap[UTF8String, Integer]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val term = UTF8String.fromBytes(bytes, start, i - start)
        counts.put(term, counts.getOrDefault(term, 0) + 1)
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_term_counts(text)` — see [[TermKernels.termCounts]]. */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_term_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    TermKernels.termCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermKernels.termCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native word n-gram kernel: the string shingles themselves (the
  * hashed variant is [[HashKernels.shingleHashes]]).
  *
  * The compositional shape — `transform(sequence(...), i ->
  * concat_ws(" ", element_at(tok, i), ...))` — is a higher-order
  * function, which Spark evaluates INTERPRETED (CodegenFallback) and
  * re-evaluates the element_at chain per element; at corpus scale that
  * made q_freq_bigrams the most expensive text query. Because tokens
  * are split on a single 0x20 and re-joined with a single 0x20, each
  * n-gram is exactly one contiguous byte span of the original text, so
  * the kernel emits zero-copy-sliced spans in one pass: no per-token
  * assembly, no interpreter. Byte-compatible with
  * `array_to_string(string_split(text, ' ')[i:i+n-1], ' ')` in DuckDB
  * (empty tokens from repeated spaces included, same as `split`).
  */
object ShingleKernels {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](nTok - n + 1)
    var s = 0
    while (s <= nTok - n) {
      val from = starts(s)
      val until = if (s + n < nTok) starts(s + n) - 1 else bytes.length
      out(s) = UTF8String.fromBytes(bytes, from, until - from)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_shingles(text, n)` — see [[ShingleKernels.shingles]]. */
case class StringShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    ShingleKernels.shingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowKernels {
  /** All token windows of `win` tokens starting every `stride` tokens,
    * each as (joined text, token count) — one byte pass, zero
    * intermediate token arrays. Window s's joined text equals
    * `array_join(slice(split(text, " "), s+1, win), " ")` because
    * consecutive tokens are separated by exactly ONE 0x20 in the
    * source, so the join is a byte-range view of the original text
    * (the [[HashKernels.shingleHashes]] identity, applied to strided
    * windows); the count is `min(win, nTok − s)` — the tail window is
    * CLIPPED, exactly like slice() past the array end.
    */
  def tokenWindows(text: UTF8String, win: Int, stride: Int): ArrayData = {
    val bytes = text.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nWin = (nTok + stride - 1) / stride // starts 0, stride, … < nTok
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val s = w * stride
      val from = starts(s)
      val until = if (s + win < nTok) starts(s + win) - 1 else bytes.length
      val row = new GenericInternalRow(2)
      row.update(0, UTF8String.fromBytes(bytes, from, until - from))
      row.update(1, math.min(win, nTok - s))
      out(w) = row
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_token_windows(text, win, stride)` — the strided-chunking
  * kernel ([[WindowKernels.tokenWindows]]). Replaces
  * `transform(sequence(0, size(tok)-1, stride), s -> slice(tok, s+1,
  * win))`, whose interpreted lambda re-materializes the token array
  * and allocates a slice per window — the hot projection of RAG
  * chunking and fixed-grid passage dedup. `explode`/`posexplode` of
  * this array yields one (txt, n) row per chunk with the window index
  * as `pos`, corpus-token-linear with NO per-element interpreter.
  */
case class TokenWindows(child: Expression, win: Int, stride: Int)
    extends UnaryExpression {

  require(win > 0 && stride > 0, "win and stride must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("txt", StringType, nullable = false),
      StructField("n", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_windows"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    WindowKernels.tokenWindows(s.asInstanceOf[UTF8String], win, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowKernels.tokenWindows($c, $win, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native quality-score kernel (the exact-BIGINT bps score of
  * [[graft.ext.TextAnalysis.qualityBps]]).
  *
  * The compositional shape — `size(split(text)) ` for the token count
  * plus `size(filter(split(text), t -> t = 'the' OR t = 'a'))` for the
  * function-word count — evaluates THREE split() array materializations
  * per row and a higher-order `filter` lambda, which Spark runs
  * interpreted (CodegenFallback), knocking every consumer stage out of
  * whole-stage codegen. This kernel computes both counts in ONE pass
  * over the text bytes (no arrays, no interpreter) and applies the same
  * exact-BIGINT credits; consumers stay inside WSCG.
  *
  * Arithmetic identity with the Column formulation (and the DuckDB
  * `duckQbps` twin): token count = 0x20 count + 1 (split keeps empty
  * tokens); `min(5000, 25·n_tok) + min(5000, ⌊stop·50000/n_tok⌋)`,
  * where the long floor-division equals the double-divide-then-floor of
  * the built-in chain because the magnitudes are non-negative and far
  * below 2^53. Null text yields null (the expression layer
  * null-propagates — the least()-collapse hazard of the built-in shape
  * cannot occur here).
  */
object QualityKernels {

  /** Shared per-row text surface statistics in one byte pass:
    * split-token count, function-word count, and the count of tokens
    * containing an ASCII lowercase letter (the `rlike("[a-z]")`
    * predicate — safe as a byte test because UTF-8 lead/continuation
    * bytes are >= 0x80, never inside 0x61-0x7a). One kernel feeds
    * stats()/langId/qualityScore/qualityRules/qualityLogit, replacing
    * up to three interpreted split()/filter() HOF evaluations per row.
    */
  def textStats(text: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val bytes = text.getBytes
    var nTok = 0L
    var stop = 0L
    var alpha = 0L
    var hasAlpha = false
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        nTok += 1
        val len = i - start
        var w = 0
        while (w < stops.length) {
          val s = stops(w)
          if (s.length == len) {
            var j = 0
            while (j < len && bytes(start + j) == s(j)) j += 1
            if (j == len) { stop += 1; w = stops.length }
            else w += 1
          } else w += 1
        }
        if (hasAlpha) alpha += 1
        hasAlpha = false
        start = i + 1
      } else {
        val b = bytes(i)
        if (b >= 'a' && b <= 'z') hasAlpha = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, stop, alpha))
  }

  def qualityBps(text: UTF8String, stops: Array[Array[Byte]]): Long = {
    // ONE tokenize/stop-match byte scan shared with textStats — a
    // second copy of that loop here would silently drift from the
    // struct kernel on any future tokenization change. The alpha
    // bookkeeping textStats additionally carries is one byte-range
    // test per non-space byte; the struct row is a 3-field stack-local
    // allocation — both noise next to the scan itself.
    val st = textStats(text, stops)
    val nTok = st.getLong(0)
    val stop = st.getLong(1)
    val lenCredit = if (nTok * 25L < 5000L) nTok * 25L else 5000L
    val sc = stop * 50000L / nTok
    lenCredit + (if (sc < 5000L) sc else 5000L)
  }
}

/** `graft_quality_bps(text)` — see [[QualityKernels.qualityBps]].
  * `stopWords` is bound at construction from the ONE shared
  * [[graft.ext.TextAnalysis.StopWords]] definition.
  */
case class QualityBps(child: Expression, stopWords: Seq[String])
  extends UnaryExpression {

  require(stopWords.nonEmpty)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quality_bps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopWords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(s: Any): Any =
    QualityKernels.qualityBps(s.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("graftStops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QualityKernels.qualityBps($c, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_text_stats(text)` — see [[QualityKernels.textStats]].
  * Returns struct(n_tok, stop, alpha), all BIGINT; null text yields a
  * null struct (field access then null-propagates like the size/filter
  * chain it replaces).
  */
case class TextStats(child: Expression, stopWords: Seq[String])
  extends UnaryExpression {

  require(stopWords.nonEmpty)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("stop", LongType, nullable = false),
    StructField("alpha", LongType, nullable = false)))

  override def prettyName: String = "graft_text_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopWords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(s: Any): Any =
    QualityKernels.textStats(s.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("graftStops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QualityKernels.textStats($c, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermFunctions {
  /** Column API for [[TermCounts]]. */
  def termCounts(text: Column): Column =
    GraftBridge.column(TermCounts(GraftBridge.expression(text)))

  /** Column API for [[StringShingles]]. */
  def stringShingles(text: Column, n: Int): Column =
    GraftBridge.column(StringShingles(GraftBridge.expression(text), n))

  /** Column API for [[QualityBps]]. */
  def qualityBps(text: Column, stopWords: Seq[String]): Column =
    GraftBridge.column(QualityBps(GraftBridge.expression(text), stopWords))

  /** Column API for [[TextStats]]. */
  def textStats(text: Column, stopWords: Seq[String]): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(text), stopWords))

  /** Column API for [[TokenWindows]]. */
  def tokenWindows(text: Column, win: Int, stride: Int): Column =
    GraftBridge.column(TokenWindows(GraftBridge.expression(text), win, stride))
}
