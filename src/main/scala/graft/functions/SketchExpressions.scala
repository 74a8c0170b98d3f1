package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog approximate-distinct sketch as a custom partial+final
  * aggregate — the mergeable-sketch slot SURVEY.md §2.4/§2.11 reserves.
  *
  * Why not exact `countDistinct`: at 100 TB, exact distinct per
  * high-cardinality key is a full shuffle of every distinct value
  * (the dedup map IS the data). This sketch is a fixed 2^p-byte
  * register array per group — partials combine by register max, so the
  * map-side combine is total and the shuffle carries kilobytes per
  * group regardless of input size. Standard error ~= 1.04/sqrt(2^p)
  * (~0.8% at the default p=14, 16 KiB per group); prefer exact
  * countDistinct only when groups are few and small.
  *
  * Spark's own approx_count_distinct is the same HLL++ family; this
  * implementation exists as the reference-free, property-tested custom
  * `TypedImperativeAggregate` surface (per-group byte-buffer state,
  * serialize/merge/eval contract) that user-defined sketches (quantile
  * digests, Bloom/theta sketches) follow. No cross-engine oracle is
  * possible — register layouts differ per engine — so the contract is
  * pinned by properties instead: error bound vs exact, merge = union,
  * insensitivity to duplication and split order (SketchSpec).
  *
  * Estimator: classic Flajolet HLL bias-corrected raw estimate with
  * linear counting below 2.5m (the empty-register regime where raw HLL
  * biases high). 64-bit XxHash64 leaves no practical large-range
  * correction regime.
  */
case class ApproxDistinct(
    child: Expression,
    precision: Int = ApproxDistinct.DefaultPrecision,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 18,
    s"precision must be in [4, 18], got $precision")

  private val m = 1 << precision

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, ApproxDistinct.Seed)
      val idx = (h >>> (64 - precision)).toInt
      val rest = h << precision
      // rank = 1 + leading zeros of the non-index bits; rest == 0 means
      // all 64-p suffix bits are zero -> maximal rank 64-p+1 (fits a byte)
      val rank = (if (rest == 0L) 64 - precision
                  else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Double.longBitsToDouble((1023L - buf(i)) << 52) // 2^-buf(i)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = precision match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  // the register array IS its own wire format (merge is index-aligned max)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_approx_distinct"

  override def withNewMutableAggBufferOffset(offset: Int): ApproxDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ApproxDistinct =
    copy(child = newChild)
}

object ApproxDistinct {
  val DefaultPrecision = 14
  val Seed = 42L
}

/** Column-API surface for the sketch aggregates. */
object SketchFunctions {

  /** Mergeable approximate distinct count of `c` (see [[ApproxDistinct]]).
    * Usable anywhere an aggregate Column is: `groupBy(...).agg(...)`,
    * window frames, cube/rollup.
    */
  def approxDistinct(c: Column,
                     precision: Int = ApproxDistinct.DefaultPrecision): Column =
    GraftBridge.column(
      ApproxDistinct(GraftBridge.expression(c), precision).toAggregateExpression())
}
