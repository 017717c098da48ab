package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over a long column: every partial holds at
  * most k values, so map-side combine ships k longs per group instead of
  * the group's rows. This is the AGGREGATE-shaped top-k the built-ins
  * don't offer at scale: `slice(sort_array(collect_list(x)))` buffers the
  * ENTIRE group in one partial (OOM on a hot group), and the rank-window
  * form emits rows (WindowGroupLimit-bounded, but not usable inside a
  * `groupBy(...).agg(...)` alongside other aggregates). Partials merge
  * associatively (union → prune to k), making it safe under any
  * combine/shuffle order; the result — the k LARGEST values, sorted
  * descending — is a multiset and therefore deterministic under ties.
  *
  * Returns array<bigint> of min(k, group size) values, descending. */
case class TopKLongs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Long]] {
  require(k > 0 && k <= 1024, s"k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](k)

  override def update(buf: ArrayBuffer[Long],
                      input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  private def insert(buf: ArrayBuffer[Long], v: Long): Unit =
    if (buf.length < k) {
      buf += v
    } else {
      // O(k) min scan — k is small by contract; a heap pays off only for
      // k large enough that this aggregate is the wrong tool anyway
      var minIdx = 0
      var i = 1
      while (i < buf.length) { if (buf(i) < buf(minIdx)) minIdx = i; i += 1 }
      if (v > buf(minIdx)) buf(minIdx) = v
    }

  override def merge(a: ArrayBuffer[Long],
                     b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray.sorted(Ordering[Long].reverse))

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[Long](math.max(n, k))
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren.head)
}
