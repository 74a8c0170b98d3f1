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

/** Native codegen'd max(|x_i|) over a numeric array — the per-vector
  * scale pass of int8 quantization, fused from
  * `array_max(transform(v, abs))` whose lambda runs interpreted
  * (CodegenFallback) and allocates an |v|-sized intermediate per row.
  * Arithmetic identical to the HOF form: each element cast to double,
  * abs, max. Null elements are SKIPPED (array_max's rule); an array
  * with no non-null elements (empty, all-null) yields NULL, as does a
  * NULL array. NaN elements propagate NaN (max-with-NaN, both forms).
  */
case class ArrayAbsMax(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_abs_max"
  override def nullable: Boolean = true // empty/all-null input => NULL

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double|bigint> input, got ${t.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = Double.NaN
    var seen = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = elemType match {
          case FloatType => x.getFloat(i).toDouble
          case LongType => x.getLong(i).toDouble
          case _ => x.getDouble(i)
        }
        val av = Math.abs(v)
        // java.lang.Double.compare-style max keeps NaN sticky like
        // Spark's greatest-NaN ordering in array_max
        if (!seen || av > mx || java.lang.Double.isNaN(av)) mx = av
        seen = true
      }
      i += 1
    }
    if (seen) mx else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val av = ctx.freshName("av")
      val seen = ctx.freshName("seen")
      val getter = elemType match {
        case FloatType => s"(double) $a.getFloat($i)"
        case LongType => s"(double) $a.getLong($i)"
        case _ => s"$a.getDouble($i)"
      }
      s"""
         |final int $n = $a.numElements();
         |boolean $seen = false;
         |${ev.value} = Double.NaN;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final double $av = java.lang.Math.abs($getter);
         |    if (!$seen || $av > ${ev.value} || Double.isNaN($av)) {
         |      ${ev.value} = $av;
         |    }
         |    $seen = true;
         |  }
         |}
         |${ev.isNull} = !$seen;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd fixed-point quantization of a numeric array:
  * element-wise `floor(x * scale + 0.5)` cast to long — fused from
  * `transform(v, x => floor(x.cast("double") * scale + 0.5)
  * .cast("long"))`, the interpreted-HOF hot path of int8/µ-unit
  * quantization (corpus-row-sized in every quantize/covariance/
  * standardize consumer). Arithmetic identical to the HOF form and to
  * DuckDB's `list_transform(v, x -> floor(x * scale + 0.5))`.
  *
  * Null semantics mirror the transform lambda exactly: NULL array →
  * NULL; a NULL element OR a NULL scale → NULL at that element (so an
  * EMPTY array under a NULL scale stays an empty array, never NULL —
  * the null-fixture empty-vector class depends on it).
  */
case class QuantizeArray(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_quantize"
  override def nullable: Boolean = left.nullable

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType | LongType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double|bigint>, double), " +
            s"got (${l.sql}, ${r.sql})")
    }

  // NULL scale must NOT null the whole result (empty arrays survive it
  // with zero elements; non-empty arrays get all-null elements), so
  // eval bypasses the null-intolerant BinaryExpression default for the
  // right child only.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val s = right.eval(input)
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (s == null || x.isNullAt(i)) null
        else {
          val v = elemType match {
            case FloatType => x.getFloat(i).toDouble
            case LongType => x.getLong(i).toDouble
            case _ => x.getDouble(i)
          }
          Math.floor(v * s.asInstanceOf[Double] + 0.5).toLong
        }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val arr = ctx.freshName("arr")
    val getter = elemType match {
      case FloatType => s"(double) ${leftGen.value}.getFloat($i)"
      case LongType => s"(double) ${leftGen.value}.getLong($i)"
      case _ => s"${leftGen.value}.getDouble($i)"
    }
    val leftNullCheck =
      if (left.nullable) s"${ev.isNull} = ${leftGen.isNull};" else ""
    val scaleIsNull =
      if (right.nullable) rightGen.isNull else "false"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val newCode =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = false;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |$leftNullCheck
         |if (!${ev.isNull}) {
         |  ${rightGen.code}
         |  final int $n = ${leftGen.value}.numElements();
         |  Object[] $arr = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$scaleIsNull && !${leftGen.value}.isNullAt($i)) {
         |      $arr[$i] = java.lang.Long.valueOf((long) java.lang.Math.floor(
         |        $getter * ${rightGen.value} + 0.5));
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """
    ev.copy(code = newCode)
  }

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

  /** Codegen'd max(|x_i|) — drop-in for `array_max(transform(v, abs))`. */
  def absMax(v: Column): Column =
    GraftBridge.column(ArrayAbsMax(GraftBridge.expression(v)))

  /** Codegen'd element-wise `floor(x * scale + 0.5)` as long — drop-in
    * for the quantize transform lambda.
    */
  def quantize(v: Column, scale: Column): Column =
    GraftBridge.column(QuantizeArray(
      GraftBridge.expression(v), GraftBridge.expression(scale)))
}
