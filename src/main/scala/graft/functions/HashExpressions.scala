package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 48-bit md5-prefix hash and fused MinHash signatures.
  *
  * The built-in formulation `conv(substring(md5(s), 1, 12), 16, 10)`
  * produces the same value but materializes a 32-char hex string,
  * substrings it, and parses base-16 per call — three string
  * allocations per shingle, millions of times per document batch. These
  * kernels read the first 6 digest bytes straight into a long. Values
  * are bit-identical to the built-in chain and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT)` (first 12 hex
  * chars = first 6 bytes, big-endian, < 2^48 so always positive).
  */
object HashKernels {

  /** thread-local digest — MessageDigest is not thread-safe and
    * per-call getInstance costs more than the hash itself.
    */
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 48 bits of md5(s) as a BIGINT. Called from codegen. */
  def md5Prefix48(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xffL) << 40) | ((digest(1) & 0xffL) << 32) |
      ((digest(2) & 0xffL) << 24) | ((digest(3) & 0xffL) << 16) |
      ((digest(4) & 0xffL) << 8) | (digest(5) & 0xffL)
  }

  val P = 2147483647L // 2^31 - 1, the universal-hash modulus (TextHash.P)

  /** 48-bit md5 prefix of a byte range (shared by the shingle kernel —
    * avoids materializing a string per shingle).
    */
  private def md5Prefix48Range(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md5Local.get()
    d.reset()
    d.update(bytes, off, len)
    val digest = d.digest()
    ((digest(0) & 0xffL) << 40) | ((digest(1) & 0xffL) << 32) |
      ((digest(2) & 0xffL) << 24) | ((digest(3) & 0xffL) << 16) |
      ((digest(4) & 0xffL) << 8) | (digest(5) & 0xffL)
  }

  /** Hashes of all word n-gram shingles of `text` (single-space
    * tokenization), one md5 per shingle, no intermediate strings.
    *
    * Equivalent by construction to
    * `transform(shingles(split(text, " "), n), s -> md5Prefix48(s))`:
    * consecutive tokens in the source are separated by exactly one
    * space, so the reassembled shingle `concat_ws(" ", t_i..t_{i+n-1})`
    * is byte-identical to the source substring spanning those tokens —
    * including degenerate empty tokens from repeated spaces. The kernel
    * therefore hashes windows of the original UTF-8 bytes directly.
    * The 0x20 delimiter never occurs inside a multi-byte UTF-8
    * sequence, so byte scanning is codepoint-safe.
    */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // token start offsets (token i spans [starts(i), ends(i)))
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) return Array.emptyLongArray
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Long](nTok - n + 1)
    var s = 0
    while (s <= nTok - n) {
      val from = starts(s)
      val until = if (s + n < nTok) starts(s + n) - 1 else bytes.length
      out(s) = md5Prefix48Range(bytes, from, until - from)
      s += 1
    }
    out
  }

  /** NFC-normalize (canonical composition). Fast path: ASCII and
    * already-composed text is returned as-is without re-encoding
    * (Normalizer.isNormalized is a cheap scan; most corpus text takes
    * this branch).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Fused SimHash fingerprint: tokenize by single space, one md5 per
    * token, ±1 bit votes accumulated in one pass — the explode +
    * 64-sum hash aggregation collapses into a per-row projection (no
    * shuffle of token rows at any corpus size).
    *
    * Bit sources mirror the built-in formulation exactly: vote bit j
    * reads bit j of the first-6-byte (48-bit) md5 prefix for j < 48,
    * and bit j-48 of digest bytes 6..7 (hex chars 13..16) above — so
    * fingerprints are bit-identical to the conv/substring chain and to
    * the DuckDB oracle. Tokens are byte windows between 0x20 bytes
    * (split(text, " ") semantics, empty tokens included); bit 63 of a
    * 64-bit fingerprint lands on the sign bit, giving the same
    * two's-complement BIGINT both engines compute.
    */
  def simhashFp(text: UTF8String, bits: Int): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](bits)
    val d = md5Local.get()
    val loBits = if (bits < 48) bits else 48
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        d.reset()
        d.update(bytes, start, i - start)
        val digest = d.digest()
        val lo = ((digest(0) & 0xffL) << 40) | ((digest(1) & 0xffL) << 32) |
          ((digest(2) & 0xffL) << 24) | ((digest(3) & 0xffL) << 16) |
          ((digest(4) & 0xffL) << 8) | (digest(5) & 0xffL)
        var j = 0
        while (j < loBits) {
          votes(j) += (if (((lo >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        if (bits > 48) {
          val hi = ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
          var k = 48
          while (k < bits) {
            votes(k) += (if (((hi >>> (k - 48)) & 1L) == 1L) 1 else -1)
            k += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Fused MinHash signature over precomputed 48-bit base hashes:
    * k arithmetic mins in one pass. Returns long[k]; empty input yields
    * null at the expression layer (no signature — mirrors the explode
    * formulation where shingle-less docs drop out).
    */
  def minhashSig(baseHashes: ArrayData, as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = baseHashes.numElements()
    var i = 0
    while (i < n) {
      val hm = baseHashes.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (hm * as(j) + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }
}

/** 48-bit md5 prefix as BIGINT — codegen'd drop-in for
  * `conv(substring(md5(s), 1, 12), 16, 10)` (TextHash.baseHash).
  */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_48"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    HashKernels.md5Prefix48(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.md5Prefix48($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word-n-gram shingle hashes of a text column: split once, one md5
  * per shingle window over the source bytes, no intermediate strings.
  * Replaces `transform(shingles(split(text, " "), n), baseHash)`, whose
  * interpreted lambda re-evaluates `split` for every element_at call —
  * the dominant cost of the dedup family before this kernel existed.
  */
case class ShingleHash48(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash_48"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      HashKernels.shingleHashes(s.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels.shingleHashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash signature over a base-hash array: all k family
  * members' minimums in one pass. Replaces the explode -> k min
  * aggregations shape with a pure projection — no shuffle of exploded
  * shingle rows at all, and no k-fold hash recompute (CollapseProject
  * would inline a shared base-hash projection into every family
  * member).
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  // empty shingle list -> null signature (doc too short to sign)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> of base hashes, got ${t.sql}")
  }

  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else new GenericArrayData(HashKernels.minhashSig(arr, aArr, bArr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bs", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |if ($c.numElements() == 0) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |    graft.functions.HashKernels.minhashSig($c, $aRef, $bRef));
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused SimHash fingerprint of a text column — the projection form of
  * the explode -> per-bit vote aggregation (see HashKernels.simhashFp
  * for the exact bit-source contract). `bits` in 1..64.
  */
case class SimHashFp(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in 1..64, got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    HashKernels.simhashFp(s.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.simhashFp($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization — canonical composition, the standard
  * text-cleanup step before hashing/dedup (the same logical character
  * can arrive precomposed or as base + combining marks, and every
  * content hash in this library is byte-sensitive). Wraps the JDK
  * normalizer in a codegen'd expression (no UDF); DuckDB twin:
  * `nfc_normalize(s)`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    HashKernels.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points for the hash kernels. */
object HashFunctions {
  def md5Prefix48(s: Column): Column =
    GraftBridge.column(Md5Prefix48(GraftBridge.expression(s)))

  /** 48-bit hashes of word n-gram shingles of `text`. */
  def shingleHash48(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHash48(GraftBridge.expression(text), n))

  /** MinHash signature (array of k mins) over 48-bit base hashes. */
  def minhashSig(baseHashes: Column, params: Seq[(Long, Long)]): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(baseHashes),
      params.map(_._1), params.map(_._2)))

  /** Fused `bits`-wide SimHash fingerprint of a text column. */
  def simhashFp(text: Column, bits: Int): Column =
    GraftBridge.column(SimHashFp(GraftBridge.expression(text), bits))

  /** Unicode NFC normalization (canonical composition). */
  def nfc(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
