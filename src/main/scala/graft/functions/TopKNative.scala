package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Mutable bounded top-k buffer: parallel primitive arrays kept sorted
  * by (sortKey desc, id1 asc, id2 asc) — zero per-row allocation on
  * the reject path, one shift on the (rare) accept path. */
final class TopKBuf(val k: Int) {
  var size: Int = 0
  val keys = new Array[Double](k)
  val id1s = new Array[Long](k)
  val id2s = new Array[Int](k)

  /** (key,i1,i2) strictly precedes slot j in (key desc, i1 asc, i2 asc). */
  @inline private def before(key: Double, i1: Long, i2: Int, j: Int): Boolean = {
    val kj = keys(j)
    if (key != kj) key > kj
    else if (i1 != id1s(j)) i1 < id1s(j)
    else i2 < id2s(j)
  }

  def insert(key: Double, i1: Long, i2: Int): Unit = {
    if (size == k && !before(key, i1, i2, k - 1)) return
    var idx = if (size == k) k - 1 else size
    while (idx > 0 && before(key, i1, i2, idx - 1)) idx -= 1
    var j = if (size == k) k - 1 else size
    while (j > idx) {
      keys(j) = keys(j - 1); id1s(j) = id1s(j - 1); id2s(j) = id2s(j - 1); j -= 1
    }
    keys(idx) = key; id1s(idx) = i1; id2s(idx) = i2
    if (size < k) size += 1
  }
}

/** Bounded-heap grouped top-k as a hand-rolled
  * [[TypedImperativeAggregate]] — the performance twin of
  * [[TopKAgg]]'s typed Aggregator with IDENTICAL semantics and output
  * (array of (sortKey, id1, id2) structs ranked by sortKey desc, ids
  * asc; TopKAggSpec pins the three forms — window, udaf, native — to
  * byte-identical results). The udaf route deserializes an Entry case
  * class per input row and rebuilds an immutable Vector per accepted
  * row; at tens of millions of candidate rows (the kNN join's
  * aggregate input) that encoder + allocation churn dominated the
  * whole query (measured ~2× the native-aggregate floor at sf10).
  * This form touches three primitive arrays per row and serializes
  * only at shuffle boundaries.
  *
  * Like every TypedImperativeAggregate it runs under
  * ObjectHashAggregateExec: raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128
  * by default) when grouping by a high-cardinality key, or the map
  * falls back to sort-based aggregation — re-introducing exactly the
  * full-candidate sort this aggregate exists to avoid. */
case class TopKNativeAgg(
    k: Int,
    sortKey: Expression,
    id1: Expression,
    id2: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = Seq(sortKey, id1, id2)
  // callers must bind (double, bigint, int) children — the only two
  // call sites (qKnnJoin, qTopkAgg) do; no implicit coercion here
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sortKey", DoubleType, nullable = false),
    StructField("id1", LongType, nullable = false),
    StructField("id2", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_native"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val kv = sortKey.eval(input)
    if (kv != null) {
      val i1 = id1.eval(input)
      val i2 = id2.eval(input)
      if (i1 != null && i2 != null)
        buf.insert(kv.asInstanceOf[Double],
          i1.asInstanceOf[Long], i2.asInstanceOf[Int])
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.keys(i), other.id1s(i), other.id2s(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { i =>
      InternalRow(buf.keys(i), buf.id1s(i), buf.id2s(i))
    })

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 20)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.keys(i)); bb.putLong(buf.id1s(i)); bb.putInt(buf.id2s(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuf(k)
    buf.size = n
    var i = 0
    while (i < n) {
      buf.keys(i) = bb.getDouble(); buf.id1s(i) = bb.getLong(); buf.id2s(i) = bb.getInt(); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNativeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNativeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNativeAgg =
    copy(sortKey = newChildren(0), id1 = newChildren(1), id2 = newChildren(2))
}

object TopKNative {
  /** Column form: `topK(3)(col("sim"), col("vec_id"), lit(0))`. */
  def topK(k: Int)(sortKey: Column, id1: Column, id2: Column): Column =
    GraftSqlBridge.column(TopKNativeAgg(k,
      GraftSqlBridge.expression(sortKey),
      GraftSqlBridge.expression(id1),
      GraftSqlBridge.expression(id2)).toAggregateExpression())

  /** Column form of the string-payload variant:
    * `topKStr(3)(col("tf").cast("double"), col("df"), col("term"))`. */
  def topKStr(k: Int)(sortKey: Column, tie: Column, str: Column): Column =
    GraftSqlBridge.column(TopKNativeStrAgg(k,
      GraftSqlBridge.expression(sortKey),
      GraftSqlBridge.expression(tie),
      GraftSqlBridge.expression(str)).toAggregateExpression())
}

/** Bounded top-k buffer with a STRING payload, kept sorted by
  * (sortKey desc, tie asc, str asc — UTF8String binary order, which is
  * exactly how a Spark window ORDER BY compares strings, so the heap
  * form reproduces the window form byte-for-byte). */
final class TopKStrBuf(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  var size: Int = 0
  val keys = new Array[Double](k)
  val ties = new Array[Long](k)
  val strs = new Array[UTF8String](k)

  @inline private def before(key: Double, t: Long, s: UTF8String, j: Int): Boolean = {
    val kj = keys(j)
    if (key != kj) key > kj
    else if (t != ties(j)) t < ties(j)
    else s.compareTo(strs(j)) < 0
  }

  def insert(key: Double, t: Long, s: UTF8String): Unit = {
    if (size == k && !before(key, t, s, k - 1)) return
    var idx = if (size == k) k - 1 else size
    while (idx > 0 && before(key, t, s, idx - 1)) idx -= 1
    var j = if (size == k) k - 1 else size
    while (j > idx) {
      keys(j) = keys(j - 1); ties(j) = ties(j - 1); strs(j) = strs(j - 1); j -= 1
    }
    keys(idx) = key; ties(idx) = t; strs(idx) = s
    if (size < k) size += 1
  }
}

/** Grouped top-k with a string payload — the [[TopKNativeAgg]] shape
  * for TEXT operators (top terms per document / per group), where the
  * ranked entity is a string, not a vector id. Same contract: partial
  * buffers truncate to k entries BEFORE the shuffle, so the exchange
  * carries O(k · groups), never the full candidate relation (the
  * difference between shuffling 3 terms per doc and shuffling every
  * distinct (doc, term) pair). Input strings are defensively copied on
  * accept — `eval` hands out UTF8Strings that may alias reused row
  * buffers. */
case class TopKNativeStrAgg(
    k: Int,
    sortKey: Expression,
    tie: Expression,
    str: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuf] {
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(sortKey, tie, str)
  // callers must bind (double, bigint, string) children
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sortKey", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false),
    StructField("str", org.apache.spark.sql.types.StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_native_str"

  override def createAggregationBuffer(): TopKStrBuf = new TopKStrBuf(k)

  override def update(buf: TopKStrBuf, input: InternalRow): TopKStrBuf = {
    val kv = sortKey.eval(input)
    if (kv != null) {
      val t = tie.eval(input)
      val s = str.eval(input)
      if (t != null && s != null)
        buf.insert(kv.asInstanceOf[Double], t.asInstanceOf[Long],
          s.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(buf: TopKStrBuf, other: TopKStrBuf): TopKStrBuf = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.keys(i), other.ties(i), other.strs(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKStrBuf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { i =>
      InternalRow(buf.keys(i), buf.ties(i), buf.strs(i))
    })

  override def serialize(buf: TopKStrBuf): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) { bytes += 20 + buf.strs(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putDouble(buf.keys(i)); bb.putLong(buf.ties(i))
      val sb = buf.strs(i).getBytes
      bb.putInt(sb.length); bb.put(sb); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKStrBuf(k)
    buf.size = n
    var i = 0
    while (i < n) {
      buf.keys(i) = bb.getDouble(); buf.ties(i) = bb.getLong()
      val len = bb.getInt(); val sb = new Array[Byte](len); bb.get(sb)
      buf.strs(i) = UTF8String.fromBytes(sb); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNativeStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNativeStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNativeStrAgg =
    copy(sortKey = newChildren(0), tie = newChildren(1), str = newChildren(2))
}
