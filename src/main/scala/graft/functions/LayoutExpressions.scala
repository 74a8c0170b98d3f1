package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * At 100 TB the scan cost of a selective two-column predicate is set by
  * LAYOUT, not compute: parquet keeps min/max per row group, and a table
  * range-partitioned by one column prunes only on that column — the
  * second predicate column is uniform inside every file, so its min/max
  * never excludes anything. Writing the table ordered by the interleaved
  * z-value instead makes every file a hyper-rectangle-ish tile: BOTH
  * columns have narrow per-file ranges, and both predicates prune —
  * the clustering trade behind Delta/Iceberg OPTIMIZE ZORDER, built
  * here from a plain expression + repartitionByRange, no table format
  * required. See [[graft.ops.Layout.clusterByZOrder]] for the
  * normalizing caller and the locality property its spec pins.
  *
  * Inputs are pre-normalized ranks/buckets in [0, 2^(64/n)). MSB-first
  * interleave: bit k of the z-value cycles through the k-th most
  * significant normalized bit of each dimension, so a z-range covers a
  * contiguous Morton tile.
  */
object LayoutKernels {

  /** Spread the low 32 bits of x so bit i lands at position 2i. */
  def spread2(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Morton code over the low 32 bits of each input (a is the
    * higher-order dimension at every bit position).
    */
  def zorder2(a: Long, b: Long): Long =
    (spread2(a) << 1) | spread2(b)

  /** 3-D Morton code over the low 21 bits of each input. */
  def zorder3(a: Long, b: Long, c: Long): Long = {
    var z = 0L
    var bit = 20
    while (bit >= 0) {
      z = (z << 3) |
        (((a >>> bit) & 1L) << 2) | (((b >>> bit) & 1L) << 1) | ((c >>> bit) & 1L)
      bit -= 1
    }
    z
  }
}

/** `graft_zorder(a, b)` — codegen'd 2-D Morton interleave of
  * pre-normalized long dimensions. Null in either dimension yields null
  * (a null has no position on the curve; route nulls to a dedicated
  * partition upstream if they must be kept).
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT dimensions, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    LayoutKernels.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LayoutKernels.zorder2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 3-D variant of [[ZOrder2]] (21 bits per dimension). */
case class ZOrder3(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT dimensions, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    LayoutKernels.zorder3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.LayoutKernels.zorder3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-API surface for the layout kernels. */
object LayoutFunctions {
  def zorder(dims: Column*): Column = dims.map(GraftBridge.expression) match {
    case Seq(a, b) => GraftBridge.column(ZOrder2(a, b))
    case Seq(a, b, c) => GraftBridge.column(ZOrder3(a, b, c))
    case other => throw new IllegalArgumentException(
      s"zorder takes 2 or 3 dimensions, got ${other.size}")
  }
}
