package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels as native codegen expressions (same design as
  * [[VectorKernel]]).
  */
object TextKernel {

  /** Distinct k-token shingles of one document, first-occurrence order.
    *
    * Tokenizer contract: single-space separator, empty tokens kept
    * (Java `split(" ", -1)` == Spark `split(text, ' ')` == DuckDB
    * `string_split`), shingles joined with a single space — exactly the
    * rows the explode→lead-window→distinct pipeline produces, but in
    * ONE linear pass per document with per-doc dedup, so the caller
    * needs no window shuffle and no distinct shuffle at all.
    */
  def distinctShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  /** Adjacent character pairs of one token, in order, non-distinct —
    * the symbol-pair stream of BPE training's counting step. Code-point
    * based (surrogate pairs stay whole) so lengths and substrings agree
    * with character-semantics engines like DuckDB, not UTF-16 units.
    */
  def charPairs(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    if (cps.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cps.length - 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cps.length - 1) {
      sb.setLength(0)
      sb.appendCodePoint(cps(i))
      sb.appendCodePoint(cps(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<string> of a document's distinct k-shingles — the scan-side
  * generator input for every shingle-based dedup tier. Null text yields
  * null (explode drops it), matching the explode-pipeline's behavior on
  * null documents.
  */
final case class DistinctShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"
  override def nullSafeEval(input: Any): Any =
    TextKernel.distinctShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.distinctShingles($t, $k)")
  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

/** array<string> of a token's adjacent character pairs (BPE pair-count
  * generator input). Null yields null; explode drops it.
  */
final case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_pairs"
  override def nullSafeEval(input: Any): Any =
    TextKernel.charPairs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernel.charPairs($t)")
  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}
