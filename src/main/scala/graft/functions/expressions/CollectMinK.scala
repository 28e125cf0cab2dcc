package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded "K smallest values" aggregate: the scale-safe replacement
  * for `sort_array(collect_list(x))[:k]`. `collect_list` materializes
  * the ENTIRE group in one aggregation buffer before any slicing — on
  * a dup-heavy 100 TB corpus a single hot content-hash group (billions
  * of boilerplate docs) becomes one multi-GB row in one task. Here
  * every buffer — map-side partial, shuffle row, and final merge — holds
  * at most `k` elements (a max-at-head heap of the k smallest seen), so
  * group size never affects memory. Result is the ascending-sorted
  * array of the k smallest values; with k ≥ group size it is exactly
  * `sort_array(collect_list(x))`.
  *
  * Supports LONG and STRING children (doc ids / record keys). Nulls are
  * ignored, matching collect_list.
  */
case class CollectMinK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  require(k > 0, s"collect_min_k needs k > 0, got $k")

  private def isLong = child.dataType == LongType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_min_k supports BIGINT and STRING, got ${other.sql}")
    }

  // max at the head so the largest of the kept k is evicted first
  private def newQueue(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](k + 1,
      new java.util.Comparator[Any] {
        override def compare(a: Any, b: Any): Int =
          b.asInstanceOf[Comparable[Any]].compareTo(a)
      })

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] = newQueue()

  // own() runs only when a value actually enters the buffer, so the
  // overwhelmingly common hot-group path (v >= current kth-smallest)
  // costs one compare and zero allocation per row
  private def add(buf: java.util.PriorityQueue[Any], v: Any,
                  own: Any => Any = identity): Unit =
    if (buf.size < k) buf.add(own(v))
    else if (v.asInstanceOf[Comparable[Any]].compareTo(buf.peek()) < 0) {
      buf.poll(); buf.add(own(v))
    }

  // UTF8String from an unsafe row is backed by reused memory — copy
  // iff the value outlives this input row (i.e. it is kept)
  @transient private lazy val ownValue: Any => Any = {
    case s: UTF8String => s.clone()
    case other => other
  }

  override def update(buf: java.util.PriorityQueue[Any], input: InternalRow)
      : java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) add(buf, v, ownValue)
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Any],
                     other: java.util.PriorityQueue[Any])
      : java.util.PriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[Any] {
      override def compare(a: Any, b: Any): Int =
        a.asInstanceOf[Comparable[Any]].compareTo(b)
    })
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      if (isLong) out.writeLong(it.next().asInstanceOf[Long])
      else {
        val b = it.next().asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = newQueue()
    var i = 0
    while (i < n) {
      if (isLong) buf.add(in.readLong())
      else {
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        buf.add(UTF8String.fromBytes(b))
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectMinK =
    copy(child = newChildren.head)

  override def prettyName: String = "collect_min_k"
}
