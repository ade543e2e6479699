package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF coarse-quantizer cell assignment as native Catalyst expressions.
  *
  * Why an Expression and not literals or HOFs: inlining nlist centroids
  * as `array(lit...)` columns puts nlist x dim literal nodes in the plan
  * (round-1 form — blows up codegen/driver plan size past nlist ~1k),
  * while a `typedLit` 2-D array + HOF argmax stays interpreted
  * (CodegenFallback, the 30-60x tax measured in Dedup). Here the
  * centroid matrix rides along as ONE reference object — O(1) plan
  * nodes at any nlist — and `doGenCode` emits a static kernel call that
  * whole-stage codegen inlines: a tight double[] loop per row, no
  * boxing, no per-centroid expression nodes. The matrix is serialized
  * once per executor with the expression, the moral equivalent of a
  * broadcast of the centroid table.
  *
  * Arithmetic contract (oracle/test parity with the round-1 literal
  * form): cosine = leftFoldDot(v,c) / (sqrt(leftFoldDot(v,v)) *
  * sqrt(leftFoldDot(c,c))), all sums strictly left-to-right.
  */
object CentroidKernel {

  /** sqrt of the left-fold self-dot of each centroid (computed once per
    * expression instance, identically to the per-row fold it replaces).
    */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  def cosines(vec: ArrayData, cents: Array[Array[Double]],
              norms: Array[Double]): Array[Double] = {
    val n = vec.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); vv += x * x; i += 1 }
    val vn = math.sqrt(vv)
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val d = math.min(n, cent.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += vec.getDouble(j) * cent(j); j += 1 }
      out(c) = dot / (vn * norms(c))
      c += 1
    }
    out
  }

  /** argmax cell; ties pick the LARGEST index — the `greatest` over
    * (score, idx) structs semantics of the literal form.
    */
  def nearest(vec: ArrayData, cents: Array[Array[Double]],
              norms: Array[Double]): Int = {
    val s = cosines(vec, cents, norms)
    var best = 0
    var i = 1
    while (i < s.length) { if (s(i) >= s(best)) best = i; i += 1 }
    best
  }

  /** Top-`nprobe` cells by cosine desc; ties keep ascending index — the
    * stable `array_sort`-with-comparator semantics of the literal form.
    */
  def probe(vec: ArrayData, cents: Array[Array[Double]],
            norms: Array[Double], nprobe: Int): ArrayData = {
    val s = cosines(vec, cents, norms)
    val idx = Array.tabulate(s.length)(identity)
      .sortBy(i => s(i))(Ordering[Double].reverse)
    UnsafeArrayData.fromPrimitiveArray(idx.take(math.min(nprobe, s.length)))
  }
}

/** Index of the nearest centroid by cosine (IntegerType). */
final case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  @transient private lazy val centNorms = CentroidKernel.norms(cents)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.nearest(input.asInstanceOf[ArrayData], cents, centNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cents", cents, "double[][]")
    val nm = ctx.addReferenceObj("norms", centNorms, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.CentroidKernel.nearest($v, $c, $nm)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid indices (ArrayType(IntegerType)). */
final case class ProbeCentroids(child: Expression, cents: Array[Array[Double]],
                                nprobe: Int)
    extends UnaryExpression {

  @transient private lazy val centNorms = CentroidKernel.norms(cents)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "probe_centroids"

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.probe(input.asInstanceOf[ArrayData], cents, centNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cents", cents, "double[][]")
    val nm = ctx.addReferenceObj("norms", centNorms, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.CentroidKernel.probe($v, $c, $nm, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCentroids =
    copy(child = newChild)
}
