package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable primitive-long group buffer for the collect aggregates below:
  * one `Array[Long]` (amortized doubling) plus a null bitmap, instead of
  * collect_list's per-element UnsafeRow copies boxed in a
  * `mutable.ArrayBuffer`. For the d06/d07 band/block buckets this is the
  * difference between 2 objects per GROUP and 2+ objects per ROW on the
  * aggregation hot path (448 ms of a profiled sf0.1 d06 run was GC), and
  * the serialized spill/shuffle form is the raw longs. Nulls are kept —
  * the aggregates replace `collect_list(struct(x, …))`, whose non-null
  * struct wrapper keeps rows whose FIELDS are null, so dropping them here
  * would change the bucket member sets. */
private[functions] final class LongsBuffer(initialCapacity: Int = 8) {
  var values: Array[Long] = new Array[Long](initialCapacity)
  var nulls: java.util.BitSet = null // allocated on first null — rare path
  var size: Int = 0

  def append(v: Long): Unit = {
    if (size == values.length)
      values = java.util.Arrays.copyOf(values, values.length << 1)
    values(size) = v
    size += 1
  }

  def appendNull(): Unit = {
    if (nulls == null) nulls = new java.util.BitSet()
    nulls.set(size)
    append(0L)
  }

  def isNullAt(i: Int): Boolean = nulls != null && nulls.get(i)

  def appendAll(o: LongsBuffer): Unit = {
    var i = 0
    while (i < o.size) {
      if (o.isNullAt(i)) appendNull() else append(o.values(i))
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    val nullBytes = if (nulls == null) Array.emptyByteArray else nulls.toByteArray
    val bb = ByteBuffer.allocate(8 + nullBytes.length + 8 * size)
    bb.putInt(size)
    bb.putInt(nullBytes.length)
    bb.put(nullBytes)
    var i = 0
    while (i < size) { bb.putLong(values(i)); i += 1 }
    bb.array()
  }
}

private[functions] object LongsBuffer {
  def deserialize(bytes: Array[Byte]): LongsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val nullLen = bb.getInt
    val buf = new LongsBuffer(math.max(n, 8))
    if (nullLen > 0) {
      val nb = new Array[Byte](nullLen)
      bb.get(nb)
      buf.nulls = java.util.BitSet.valueOf(nb)
    }
    var i = 0
    while (i < n) { buf.values(i) = bb.getLong; i += 1 }
    buf.size = n
    buf
  }
}

/** `collect_longs(x)` — arrival-ordered `array<bigint>` of EVERY row's
  * value, nulls included: the primitive-buffer replacement for
  * `collect_list(struct(x))` when callers only ever read the one field
  * (d06's bare-id band buckets). Same execution shape (ObjectHashAggregate
  * with partial/merge), no per-row object allocation, raw-long
  * serialization. NOT registered in SQL — the null-keeping contract
  * differs from collect_list's null-skipping one, so use is deliberate,
  * from the operators that know which contract they need. */
case class CollectLongs(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "collect_longs"
  override def dataType: DataType = ArrayType(LongType, containsNull = child.nullable)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"collect_longs input must be bigint, got ${t.sql}")
  }

  override def createAggregationBuffer(): LongsBuffer = new LongsBuffer()

  override def update(buf: LongsBuffer, input: InternalRow): LongsBuffer = {
    val v = child.eval(input)
    if (v == null) buf.appendNull() else buf.append(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongsBuffer, b2: LongsBuffer): LongsBuffer = {
    b1.appendAll(b2); b1
  }

  override def eval(buf: LongsBuffer): Any =
    if (buf.nulls == null)
      new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.size))
    else {
      val out = new Array[Any](buf.size)
      var i = 0
      while (i < buf.size) {
        if (!buf.isNullAt(i)) out(i) = buf.values(i)
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: LongsBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): LongsBuffer =
    LongsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectLongs =
    copy(child = newChild)
}

/** `collect_long_pairs(a, b)` — arrival-ordered
  * `array<struct<aName:bigint, bName:bigint>>` of every row's (a, b),
  * null fields included: the primitive-buffer replacement for
  * `collect_list(struct(a, b))` over two bigint columns (d07's
  * (id, sim) block buckets). One interleaved long buffer per group;
  * the struct rows exist only in the final eval. */
case class CollectLongPairs(left: Expression, right: Expression,
    leftName: String, rightName: String,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "collect_long_pairs"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField(leftName, LongType, left.nullable),
    StructField(rightName, LongType, right.nullable))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"collect_long_pairs inputs must be bigint, got ${l.sql}, ${r.sql}")
    }

  override def createAggregationBuffer(): LongsBuffer = new LongsBuffer(16)

  override def update(buf: LongsBuffer, input: InternalRow): LongsBuffer = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null) buf.appendNull() else buf.append(a.asInstanceOf[Long])
    if (b == null) buf.appendNull() else buf.append(b.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongsBuffer, b2: LongsBuffer): LongsBuffer = {
    b1.appendAll(b2); b1
  }

  override def eval(buf: LongsBuffer): Any = {
    val n = buf.size / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = InternalRow(
        if (buf.isNullAt(2 * i)) null else buf.values(2 * i),
        if (buf.isNullAt(2 * i + 1)) null else buf.values(2 * i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: LongsBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): LongsBuffer =
    LongsBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CollectLongPairs =
    copy(left = newLeft, right = newRight)
}

object CollectLongs {
  /** Column form of [[CollectLongs]]. */
  def collectLongs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftSql.column(
      CollectLongs(org.apache.spark.sql.graft.GraftSql.expression(c))
        .toAggregateExpression())

  /** Column form of [[CollectLongPairs]]. */
  def collectLongPairs(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      aName: String, bName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftSql.column(
      CollectLongPairs(org.apache.spark.sql.graft.GraftSql.expression(a),
        org.apache.spark.sql.graft.GraftSql.expression(b), aName, bName)
        .toAggregateExpression())
}
