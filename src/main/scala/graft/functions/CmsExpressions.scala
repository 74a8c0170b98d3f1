package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode–Muthukrishnan) as a mergeable
  * partial+final aggregate — the fourth entry in the custom-sketch
  * family beside [[ApproxDistinct]], [[FreqItems]], and
  * [[ApproxQuantiles]].
  *
  * Why beside Misra-Gries: MG answers "which items are heavy" with a
  * capacity-bounded summary of the items themselves; CMS answers
  * "how often did THIS item occur" for ANY item, including ones far
  * below the heavy-hitter bar, from depth·width counters that never
  * store a single item — the shape for per-key rate estimates over
  * unbounded key domains (URLs, shingles, user ids) where even the MG
  * item strings would blow the summary budget.
  *
  * Guarantees (standard CMS): estimates never undercount;
  * est − true ≤ ε·N with probability ≥ 1−δ for ε = e/width,
  * δ = e^−depth (N = total non-null rows). Merge is counter-wise
  * addition, so merged-sketch estimates are IDENTICAL to the
  * single-pass sketch of the union — stronger than the HLL/MG
  * "bounds survive merge" contract, and pinned as bit-equality by
  * the property suite.
  *
  * Output layout: array<bigint> of [depth, width, N, counters…]
  * (row-major) — a storable, mergeable artifact that
  * [[CmsEstimate]] (`graft_cms_estimate`) point-queries later, the
  * sketch-column-plus-query-function shape production sketch
  * libraries ship. String-typed input (route other types through
  * cast; the query side must present the same string).
  */
case class CountMin(
    child: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"width must be in [2, 2^20], got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  // slot 0 = N; counters follow row-major
  private val bufLen = depth * width + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf(0) += 1
      var r = 0
      while (r < depth) {
        buf(1 + CountMin.cell(v.asInstanceOf[UTF8String], r, width)) += 1
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](3 + depth * width)
    out(0) = depth.toLong
    out(1) = width.toLong
    out(2) = buf(0)
    var i = 0
    while (i < depth * width) { out(3 + i) = buf(1 + i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(offset: Int): CountMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)
}

object CountMin {
  val DefaultDepth = 4    // δ = e^-4 ≈ 1.8%
  val DefaultWidth = 256  // ε = e/256 ≈ 1.1% of N
  val Seed = 77L

  /** THE hash-to-cell mapping: row-major index of `item`'s counter in
    * hash row `r`. The single definition behind the aggregate's
    * update, the point-query estimator, and the streaming twin
    * (`TwsCms`) — the three surfaces whose bit-identity contract
    * breaks silently if any copy drifts.
    */
  def cell(item: UTF8String, r: Int, width: Int): Int =
    (r * width + java.lang.Math.floorMod(
      XxHash64Function.hash(item, StringType, Seed + r), width.toLong)).toInt

  /** Point query against a [[CountMin]] sketch array: min over the
    * depth rows of the item's counter — the CMS estimator. Shared by
    * the interpreted and codegen'd paths of [[CmsEstimate]] so the
    * hash trajectory cannot drift.
    */
  def estimate(sk: ArrayData, item: UTF8String): Long = {
    val depth = sk.getLong(0).toInt
    val width = sk.getLong(1).toInt
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sk.getLong(3 + cell(item, r, width))
      if (c < min) min = c
      r += 1
    }
    min
  }
}

/** Point query `graft_cms_estimate(sketch, item)` against a
  * [[CountMin]] sketch column: the estimated occurrence count of
  * `item`, never below the true count, at most ε·N above it. Codegen'd
  * via a static call (no interpreter round-trip when probing many
  * items per row).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, string), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(sk: Any, item: Any): Any =
    CountMin.estimate(sk.asInstanceOf[ArrayData], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, item) =>
      s"${ev.value} = graft.functions.CountMin.estimate($sk, $item);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
