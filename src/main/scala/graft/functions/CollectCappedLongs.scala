package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped `collect_list` over a LONG column that also reports the
  * TRUE group count: returns `struct(ds: array<bigint>, n: bigint)`
  * where `ds` holds every element when `n <= cap` and is EMPTY when the
  * group overflows the cap (the stored prefix would be dead weight —
  * consumers drop over-cap groups entirely).
  *
  * Why it exists: LSH bucket building needs "the doc list per band
  * bucket, unless the bucket is degenerate". Every two-pass formulation
  * (count-then-anti-join) pays a second full signature pass over the
  * corpus, and every single-pass builtin materializes the degenerate
  * bucket before a filter can drop it — `collect_list` builds the full
  * list in one aggregation buffer (a single 128 MB allocation for a
  * ~16M-doc bucket) and a window count sorts that bucket in one task's
  * sorter (same allocation, different structure). This aggregate bounds
  * the buffer at `cap` longs per group ON BOTH the partial (map) and
  * final (reduce) side — an overflowing group's buffer is cleared the
  * moment its running count passes the cap, so a 16M-row degenerate
  * bucket costs 8 bytes of count, not 128 MB of list — while `n` keeps
  * counting, so skew metrics (dropped buckets, true max bucket size)
  * survive in the same single pass.
  *
  * Buffer invariant: `ds` is the complete element list iff `n <= cap`,
  * else empty. Merge preserves it: partials with `n_i <= cap` carry
  * complete lists, so their concatenation is complete when the merged
  * count stays under the cap, and anything else clears.
  *
  * Element order is partition-nondeterministic, exactly like
  * `collect_list` — callers treat `ds` as a set.
  */
case class CollectCappedLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectCappedLongs.Buf]
  with UnaryLike[Expression] {

  require(cap > 0, s"cap must be positive: $cap")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"collect_capped requires a bigint argument, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("ds", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "collect_capped"

  override def createAggregationBuffer(): CollectCappedLongs.Buf =
    new CollectCappedLongs.Buf(0L, ArrayBuffer.empty[Long])

  override def update(buf: CollectCappedLongs.Buf, input: InternalRow): CollectCappedLongs.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      if (buf.n <= cap) buf.ds += v.asInstanceOf[Long]
      else if (buf.ds.nonEmpty) buf.ds.clear()
    }
    buf
  }

  override def merge(b1: CollectCappedLongs.Buf, b2: CollectCappedLongs.Buf): CollectCappedLongs.Buf = {
    b1.n += b2.n
    if (b1.n <= cap) b1.ds ++= b2.ds
    else if (b1.ds.nonEmpty) b1.ds.clear()
    b1
  }

  override def eval(buf: CollectCappedLongs.Buf): Any =
    InternalRow(
      new GenericArrayData(
        if (buf.n <= cap) buf.ds.toArray else Array.emptyLongArray),
      buf.n)

  override def serialize(buf: CollectCappedLongs.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * buf.ds.length)
    bb.putLong(buf.n).putInt(buf.ds.length)
    buf.ds.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectCappedLongs.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val len = bb.getInt()
    val ds = new ArrayBuffer[Long](len)
    var i = 0
    while (i < len) { ds += bb.getLong(); i += 1 }
    new CollectCappedLongs.Buf(n, ds)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCappedLongs =
    copy(child = newChild)
}

object CollectCappedLongs {
  final class Buf(var n: Long, val ds: ArrayBuffer[Long])
}
