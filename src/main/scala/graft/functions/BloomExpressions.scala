package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom filter over 64-bit fingerprints, as a mergeable sketch
  * aggregate plus a codegen membership test — the scan-only membership
  * primitive: build the sketch over the SMALL side (a benchmark set, a
  * blocklist, yesterday's keys), ship its bits to every task as a plan
  * reference object, and test the 100 TB side in a pure whole-stage-
  * codegen filter with ZERO shuffle of the big side. The join the sketch
  * replaces would shuffle the full corpus on the key.
  *
  * Determinism (oracle parity): no RNG anywhere — the k probe positions
  * of value v are double-hashed from two fixed-seed XXH64 passes
  * (h_i = h1 + i·h2 mod m, Kirsch-Mitzenmacher), so the same inputs
  * always build the same bits and the same probes on EVERY engine and
  * partition count. False positives are therefore deterministic too;
  * callers that need exactness re-verify the (tiny) surviving set — see
  * `Decontaminate.decontaminateBloom`, whose END result is exact and
  * DuckDB-oracle-checked.
  *
  * Sizing: standard m = ceil(−n·ln p / ln²2) bits, k = round(m/n·ln 2)
  * probes via [[BloomRuntime.sizeFor]]. The buffer is `Array[Long]`
  * words; merge is word-wise OR — associative + commutative, correct
  * under partial aggregation at any partition count.
  */
object BloomRuntime {

  private val Seed1 = 0x51ed270bL
  private val Seed2 = 0x2545f491L

  /** (numBits, numHashes) for `n` expected items at false-positive rate
    * `p`. numBits is rounded up to a multiple of 64 (whole words).
    */
  def sizeFor(n: Long, p: Double): (Int, Int) = {
    require(n > 0, "expected items must be positive")
    require(p > 0 && p < 1, "fpp out of (0,1)")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-n * math.log(p) / (ln2 * ln2)).toLong
    val m = math.min(((mRaw + 63) / 64) * 64, Int.MaxValue.toLong - 63).toInt
    val k = math.max(1, math.round(m.toDouble / n * ln2).toInt)
    (m, k)
  }

  def set(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = XXH64.hashLong(v, Seed1)
    val h2 = XXH64.hashLong(v, Seed2)
    var i = 0
    while (i < numHashes) {
      // floorMod: h1 + i*h2 wraps; Java % would go negative
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  def mightContain(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Boolean = {
    val h1 = XXH64.hashLong(v, Seed1)
    val h2 = XXH64.hashLong(v, Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(fingerprint, numBits, numHashes)` → binary sketch (the
  * word array, little-endian longs). Null inputs are skipped.
  */
final case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_agg"
}

/** Membership test against a DRIVER-HELD sketch: the word array rides
  * the plan as a codegen reference object (serialized once per task via
  * the plan, like a broadcast variable — never per row), and the probe
  * is a static kernel call inside whole-stage codegen.
  */
final case class BloomMightContain(
    child: Expression,
    words: Array[Long],
    numBits: Int,
    numHashes: Int) extends UnaryExpression {

  require(words.length == numBits / 64, "word count must match numBits")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    BloomRuntime.mightContain(words, numBits, numHashes, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BloomRuntime.mightContain($w, $numBits, $numHashes, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.GraftExpressionBridge

  def bloomAgg(col: Column, numBits: Int, numHashes: Int): Column =
    GraftExpressionBridge.column(
      BloomFilterAgg(GraftExpressionBridge.expression(col), numBits, numHashes)
        .toAggregateExpression())

  def bloomMightContain(col: Column, bytes: Array[Byte], numBits: Int,
                        numHashes: Int): Column = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
    GraftExpressionBridge.column(
      BloomMightContain(GraftExpressionBridge.expression(col), words, numBits, numHashes))
  }
}
