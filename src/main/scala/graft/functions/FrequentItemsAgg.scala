package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable aggregate: per
  * group, at most `capacity` (item → weight) counters; an update that
  * would overflow decrements every counter instead (dropping zeros), so
  * any item with true frequency > N/(capacity+1) is guaranteed present
  * and every reported weight undercounts by at most N/(capacity+1)
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12: sum counters, then subtract the (capacity+1)-th
  * largest and drop non-positives — error bounds add).
  *
  * This is the per-group heavy-hitters path at 100 TB: `groupBy(lang)
  * .agg(frequent_items(token, 4096))` holds 4096 counters per group in
  * each partial buffer — independent of vocabulary size — where the
  * exact form (`groupBy(lang, token).count` + top-k window) shuffles
  * the full (group, token) cross space. EXACTNESS ESCAPE HATCH: when
  * `capacity >=` the group's distinct-item count the decrement path
  * never triggers, counters are exact frequencies and the output is
  * engine-reproducible (that degenerate-exact mode is what the DuckDB
  * oracle pins; the sketch bounds are spec-tested separately).
  *
  * Output: `map<string, long>` of surviving item → counter weight.
  * Items and weights are deterministic for exact mode; in sketch mode
  * the SET is order-dependent (like any MG sketch) but the guarantee
  * above always holds.
  */
final case class FrequentItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def add(buf: java.util.HashMap[String, Long], item: String, w: Long): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + w)
    else if (buf.size < capacity) buf.put(item, w)
    else {
      // decrement-all by the incoming weight, clamped at the smallest
      // counter so at least one slot frees when w covers it
      val it = buf.entrySet().iterator()
      var min = Long.MaxValue
      while (it.hasNext) { val e = it.next(); if (e.getValue < min) min = e.getValue }
      val dec = math.min(w, min)
      val it2 = buf.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - dec
        if (nv <= 0) it2.remove() else e.setValue(nv)
      }
      val rem = w - dec
      if (rem > 0) add(buf, item, rem)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach { (k, w) =>
      val cur = a.get(k)
      if (cur != 0L || a.containsKey(k)) a.put(k, cur + w) else a.put(k, w)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter value, drop <= 0
      val values = new Array[Long](a.size)
      var i = 0
      a.forEach { (_, v) => values(i) = v; i += 1 }
      java.util.Arrays.sort(values)
      val sub = values(a.size - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - sub
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    buf.forEach { (k, v) => keys(i) = UTF8String.fromString(k); vals(i) = v; i += 1 }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len); in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "frequent_items"
}

object FrequentItems {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.GraftExpressionBridge

  /** `frequent_items(col, capacity)` → map<item, weight> Misra–Gries
    * sketch (exact counts when capacity covers the distinct items).
    */
  def frequentItems(col: Column, capacity: Int): Column =
    GraftExpressionBridge.column(
      FrequentItemsAgg(GraftExpressionBridge.expression(col), capacity)
        .toAggregateExpression())
}
