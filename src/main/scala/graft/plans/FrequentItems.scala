package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch: approximate heavy hitters with at
  * most k counters of state; any item with true frequency > n/(k+1) is
  * guaranteed present, and each reported count undercounts by at most
  * n/(k+1).
  *
  * Reference surface: apache/pinot frequent-items aggregates
  * (`AggregationFunctionType.java:158-160`,
  * FREQUENTSTRINGSSKETCH / FREQUENTLONGSSKETCH via DataSketches).
  * Implemented as a `TypedImperativeAggregate` (SURVEY §7.4 sketch
  * tier): the partial state crossing the shuffle is ≤ k (item, count,
  * error) triples, and the merge (counter addition + joint decrement)
  * preserves the deterministic error bound.
  *
  * Result: map<string, long> of surviving items → lower-bound counts,
  * restricted to the top `k` counters.
  */
case class FrequentItemsSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def offer(buf: java.util.HashMap[String, Long], item: String,
      weight: Long): Unit = {
    if (buf.containsKey(item)) buf.put(item, buf.get(item) + weight)
    else if (buf.size < k) buf.put(item, weight)
    else {
      // joint decrement by the minimum count (batched Misra–Gries)
      var dec = weight
      val it = buf.values().iterator()
      var minV = Long.MaxValue
      while (it.hasNext) minV = math.min(minV, it.next())
      dec = math.min(dec, minV)
      if (dec > 0) {
        val entries = buf.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          val v = e.getValue - dec
          if (v <= 0) entries.remove() else e.setValue(v)
        }
      }
      val rem = weight - dec
      if (rem > 0 && buf.size < k) buf.put(item, rem)
    }
  }

  override def update(buf: java.util.HashMap[String, Long], row: InternalRow)
      : java.util.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); offer(buf, e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new scala.collection.mutable.ArrayBuffer[(String, Long)]
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries += ((e.getKey, e.getValue)) }
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    ArrayBasedMapData(
      sorted.map(e => UTF8String.fromString(e._1)).toArray,
      sorted.map(_._2).toArray)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val items = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]
    val it = buf.entrySet().iterator()
    var bytes = 4
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items += ((b, e.getValue)); bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.size)
    items.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object FrequentItems {
  def frequentItems(c: Column, k: Int = 64): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      FrequentItemsSketch(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), k)
        .toAggregateExpression())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def build(exprs: Seq[Expression]): Expression = {
      val k = if (exprs.size > 1) exprs(1).eval().toString.toInt else 64
      FrequentItemsSketch(exprs.head, k)
    }
    // the MAP-returning heavy-hitter surface
    reg.createOrReplaceTempFunction("frequentitems", build, "built-in")
    // the reference names return WIRE-FORMAT DataSketches blobs
    // (FrequentStringsSketchAggregationFunction.java:46 — base64
    // ItemsSketch<String> / LongsSketch, default maxMapSize 256)
    def buildStrings(exprs: Seq[Expression]): Expression =
      FrequentStringsSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval().toString.toInt
        else FrequentSketchDs.DefaultMaxMapSize)
    def buildLongs(exprs: Seq[Expression]): Expression =
      FrequentLongsSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval().toString.toInt
        else FrequentSketchDs.DefaultMaxMapSize)
    reg.createOrReplaceTempFunction("frequentstringssketch", buildStrings,
      "built-in")
    reg.createOrReplaceTempFunction("frequentlongssketch", buildLongs,
      "built-in")
  }
}
