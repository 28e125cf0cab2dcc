package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded "k smallest DISTINCT values" aggregate — the KMV/bottom-k
  * sketch builder ([[graft.functions.Sketch.kmvSetOps]]'s sample, as
  * ONE aggregation): where [[CollectMinK]] keeps duplicates (a sample
  * of rows), this keeps each value once (a sample of the value SPACE),
  * which is what a distinct-count estimator needs — a hot key occurring
  * billions of times must occupy one slot, not flood the sketch.
  *
  * Buffers are a ≤ k-element ordered set; merge is set-union-then-
  * truncate, so partials combine associatively and order/duplication-
  * insensitively — the mergeable-sketch property that lets the SAME
  * aggregation run batch, streaming (state = k longs per group), or
  * as a cross-cluster union of pre-sketched partitions.
  *
  * LONG children only (the 60-bit md5-prefix hash domain).
  */
case class CollectMinKDistinct(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k > 0, s"collect_min_k_distinct needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_min_k_distinct supports BIGINT, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  // hot path: a value ≥ the current k-th smallest (and full buffer)
  // costs one comparison; a duplicate costs one contains()
  private def add(buf: java.util.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last() && !buf.contains(v)) {
      buf.pollLast(); buf.add(v); ()
    }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow)
      : java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
                     other: java.util.TreeSet[Long])
      : java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectMinKDistinct =
    copy(child = newChildren.head)

  override def prettyName: String = "collect_min_k_distinct"
}
