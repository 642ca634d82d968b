package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: the k lexicographically-smallest
  * (dist2, nid) pairs seen so far, kept in a max-heap so insertion is
  * O(log k) and the buffer never exceeds k entries.
  */
final class TopKBuffer(val k: Int) {
  // max-heap: head is the current worst of the kept k
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](Ordering.Tuple2[Double, Long])

  def insert(d: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((d, id))
    else {
      val (hd, hid) = heap.head
      if (d < hd || (d == hd && id < hid)) {
        heap.dequeue()
        heap.enqueue((d, id))
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (d, id) => insert(d, id) }

  /** ascending (dist2, nid) — the kNN rank order (ties by id, matching the
    * reference kd-tree iterator's deterministic ordering and the oracle's
    * ORDER BY dist2, nid). */
  def sorted: Array[(Double, Long)] = heap.toArray.sortBy(identity)
}

/** Catalyst aggregate `topk_neighbors(dist2, nid, k)` →
  * `array<struct<dist2:double, nid:bigint>>` of the k nearest, ascending.
  *
  * This is the scale piece of the kNN join (reference semantics:
  * planar/index/kdtree NearestNeighborIterator): unlike a
  * `row_number() OVER (PARTITION BY qid)` window — which must shuffle
  * EVERY candidate row to the qid partition before ranking — a
  * TypedImperativeAggregate participates in partial aggregation, so each
  * map task forwards at most k pairs per query and hot cells never
  * concentrate their full candidate lists on one reducer.
  */
case class TopKNeighbors(
    dist: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(dist, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKNeighbors.resultType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      buffer.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val arr = buffer.sorted
    new GenericArrayData(arr.map { case (d, i) => InternalRow(d, i) })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val arr = buffer.sorted
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (d, i) => bb.putDouble(d); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNeighbors =
    copy(dist = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_neighbors"
}

object TopKNeighbors {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("dist2", DoubleType, nullable = false),
      StructField("nid", LongType, nullable = false))),
    containsNull = false)
}
