package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** SEGMENT_PARTITIONED_DISTINCT_COUNT
  * (`SegmentPartitionedDistinctCountAggregationFunction.java`): assumes
  * the value column is partitioned by segment and therefore sums the
  * PER-SEGMENT distinct counts instead of deduplicating globally —
  * cheap (a long per segment crosses the wire, no set union) and exact
  * under the partitioning assumption.
  *
  * Spark mapping: segment ≙ input partition. The update phase
  * deduplicates within its partial buffer (one per partition per
  * group); merge collapses each side to its distinct COUNT and adds —
  * after the shuffle only counts travel, mirroring the reference's
  * leaf-stage-distinct / reduce-stage-sum split.
  */
case class SegmentPartitionedDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SegmentPartitionedDistinctCount.State] {
  import SegmentPartitionedDistinctCount.State

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "segment_partitioned_distinct_count"

  override def createAggregationBuffer(): State = new State()

  // string form is injective per single-typed column; UTF8String values
  // must not be retained (buffer reuse), toString copies
  private def key(v: Any): String = v match {
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case x => x.toString
  }

  override def update(st: State, row: InternalRow): State = {
    val v = child.eval(row)
    if (v != null) st.set.add(key(v))
    st
  }

  override def merge(st: State, other: State): State = {
    st.count += st.set.size + other.count + other.set.size
    st.set.clear()
    other.set.clear()
    st
  }

  override def eval(st: State): Any = st.count + st.set.size

  override def serialize(st: State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(st.count)
    out.writeInt(st.set.size)
    val it = st.set.iterator()
    while (it.hasNext) out.writeUTF(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new State()
    st.count = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { st.set.add(in.readUTF()); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): SegmentPartitionedDistinctCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SegmentPartitionedDistinctCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object SegmentPartitionedDistinctCount {
  /** Per-partial distinct set + already-collapsed downstream count. */
  final class State {
    val set = new java.util.HashSet[String]()
    var count: Long = 0L
  }
}
