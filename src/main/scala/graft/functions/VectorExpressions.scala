package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * is semantically identical but runs interpreted (higher-order
  * functions are CodegenFallback) and allocates an intermediate array
  * per row — at 100 TB scale (and even at sf0.1's 2M candidate pairs)
  * that is the difference between a codegen'd fused loop and a
  * per-pair interpreter round-trip. Arithmetic is kept bit-identical
  * to the built-in/DuckDB form: cast each element to double, multiply,
  * accumulate left-to-right.
  *
  * Accepts array<float>, array<double>, or array<bigint> on either
  * side (the bigint case serves asymmetric quantized search: a float
  * query against an int8 corpus — long→double widening is exact for
  * quantized values). Null arrays propagate null (standard
  * binary-expression null semantics); element nulls are not expected
  * in the embedding data and read as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Length-mismatched inputs yield NULL even when both children are
  // non-nullable, so this expression is always nullable. Leaving the
  // default (children-derived) nullability was also a codegen bug:
  // with non-nullable children, nullSafeCodeGen binds ev.isNull to
  // the FalseLiteral and the `${ev.isNull} = true;` branch below
  // generated `false = true;` — uncompilable Java, which silently
  // knocked every Filter/WSCG stage containing this kernel back to
  // the interpreter. With nullable=true, nullSafeCodeGen declares a
  // real local and documents that resultCode may change nullability.
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths yield NULL, matching the zip_with/aggregate
    // formulation this kernel claims identity with (null padding ->
    // null sum) — a silent min-length truncation would rank corrupt
    // vectors with plausible partial dots instead of surfacing them
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    def get(d: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => d.getFloat(i).toDouble
      case LongType => d.getLong(i).toDouble
      case _ => d.getDouble(i)
    }
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      def getter(src: String, t: DataType): String = t match {
        case FloatType => s"(double) $src.getFloat($i)"
        case LongType => s"(double) $src.getLong($i)"
        case _ => s"$src.getDouble($i)"
      }
      val getA = getter(a, elemType(left))
      val getB = getter(b, elemType(right))
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value} += $getA * $getB;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd integer dot product over two array<bigint> —
  * the scan kernel for int8-quantized embeddings (Similarity
  * .quantizeInt8). Accumulates in long: |q_i| <= 127, so the sum is
  * exact up to dim ~5.7e14 — no float rounding in the hot loop, and
  * the value is exactly representable in double (< 2^53) for any
  * realistic dim, which keeps the DuckDB twin (list_dot_product over
  * the same lists) bit-identical after the final cast.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int"

  // Always nullable (length mismatch => NULL); see graft_dot — also
  // required for the generated `${ev.isNull} = true;` branch to bind
  // to a real local instead of FalseLiteral under non-null children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // see graft_dot
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  ${ev.value} = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native vector kernels. */
object VectorFunctions {
  /** Codegen'd dot(a, b) in double precision, sequential accumulation —
    * drop-in for the zip_with/aggregate formulation.
    */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd integer dot(a, b) over array<bigint> (quantized vectors). */
  def dotIntNative(a: Column, b: Column): Column =
    GraftBridge.column(DotProductLong(GraftBridge.expression(a), GraftBridge.expression(b)))
}
