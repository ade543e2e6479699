package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector arithmetic as native codegen expressions.
  *
  * The round-1 forms (`aggregate(zip_with(a,b,*),0.0,+)` etc.) are
  * higher-order functions — CodegenFallback, interpreted, with the
  * 30-60x tax measured in Dedup — and they sat on the hottest path of
  * every similarity operator (one cosine per scored candidate). Each
  * expression here compiles to a static kernel call that whole-stage
  * codegen inlines: a tight double loop over ArrayData, no boxing, no
  * per-element closures.
  *
  * Arithmetic contract (oracle parity): every sum is a strict
  * left-to-right fold, exactly the element order of the HOF forms and
  * of the DuckDB `list_reduce` oracles, so results are bit-identical.
  */
object VectorKernel {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def maxAbs(a: ArrayData): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val v = math.abs(a.getDouble(i)); if (v > m) m = v; i += 1 }
    m
  }

  /** Symmetric int8 quantization: round-half-up of v/scale (floor(x+0.5)
    * — no banker's-rounding ambiguity across engines). Caller guarantees
    * scale > 0 and |v|/scale <= 127.
    */
  def quantI8(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getDouble(i) / scale + 0.5).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Cosine over int8-quantized vectors. Cosine is scale-invariant, so
    * the per-vector scales cancel and scoring runs on the raw bytes —
    * exact integer accumulation (max |sum| = dim * 127² — long is far
    * more than safe), one double division at the end.
    */
  def cosineI8(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong; val y = b.getByte(i).toLong
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
  }

  /** Dense matrix-vector product: out(j) = strict left-to-right fold of
    * vec·planes(j) — one double loop per output dim, the exact element
    * order of a DuckDB `list_reduce` left fold, so ±1-signed projections
    * (x·(+1.0) == x, x·(−1.0) == −x, both IEEE-exact) are bit-identical
    * across engines.
    */
  def matVec(vec: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    val out = new Array[Any](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(vec.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * plane(i); i += 1 }
      out(p) = s
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** SRP bucket id: bit i set iff dot(vec, planes(i)) > 0. */
  def srpBucket(vec: ArrayData, planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(vec.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * plane(i); i += 1 }
      if (s > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }
}

/** Left-fold dot product of two array<double> columns (DoubleType). */
final case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernel.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Cosine similarity of two array<double> columns (DoubleType):
  * dot/(sqrt(dot(a,a))*sqrt(dot(b,b))), all left folds.
  */
final case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernel.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** Max |element| of an array<double> column (DoubleType) — the int8
  * quantization scale finder, codegen like the other kernels (the HOF
  * form `array_max(transform(abs))` is CodegenFallback).
  */
final case class VecMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_max_abs"
  override def nullSafeEval(input: Any): Any =
    VectorKernel.maxAbs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernel.maxAbs($v)")
  override protected def withNewChildInternal(newChild: Expression): VecMaxAbs =
    copy(child = newChild)
}

/** array<double> × scale → array<tinyint> symmetric int8 quantization. */
final case class VecQuantI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "vec_quant_i8"
  override def nullSafeEval(a: Any, s: Any): Any =
    VectorKernel.quantI8(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) => s"graft.functions.VectorKernel.quantI8($a, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantI8 =
    copy(left = l, right = r)
}

/** Cosine over two array<tinyint> quantized vectors (DoubleType). */
final case class VecCosineI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine_i8"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosineI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernel.cosineI8($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosineI8 =
    copy(left = l, right = r)
}

/** Matrix-vector projection of a vector against a fixed plane matrix
  * (array<double> of `planes.length` dims) — the dimensionality-reduction
  * kernel. Same reference-object design as [[SrpBucket]]; see
  * [[VectorKernel.matVec]] for the cross-engine fold contract.
  */
final case class VecProject(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_project"
  override def nullSafeEval(input: Any): Any =
    VectorKernel.matVec(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernel.matVec($v, $p)")
  }
  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)
}

/** SRP-LSH bucket of a vector against a fixed hyperplane matrix
  * (IntegerType) — the matrix rides as one reference object instead of
  * planes x dim literal nodes with an interpreted dot per plane.
  */
final case class SrpBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"
  override def nullSafeEval(input: Any): Any =
    VectorKernel.srpBucket(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernel.srpBucket($v, $p)")
  }
  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}
