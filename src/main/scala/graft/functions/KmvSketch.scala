package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-60bit hashing for the KMV family — ONE definition so the
  * cross-engine bit-exactness contract cannot drift between the
  * aggregates, with a reused per-thread digest (a fresh
  * MessageDigest.getInstance per row is a JCA lookup on the agg hot
  * path). */
private[functions] object KmvHash {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(rendering) — positive, matches the DuckDB twin's
    * 15-hex-digit slice `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = first 7 bytes + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def render(v: Any): String = v match {
    case u: UTF8String => u.toString
    case other         => other.toString
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a REAL distributed
  * aggregate — a custom Catalyst `TypedImperativeAggregate` with
  * partial/merge support, the same execution shape as Spark's own HLL
  * aggregate, but DETERMINISTIC and therefore oracle-checkable:
  *
  *   - each value hashes to the top 60 bits of md5 of its string
  *     rendering — exactly `('0x' || substr(md5(CAST(x AS VARCHAR)),
  *     1, 15))::BIGINT` in DuckDB, so a SQL twin reproduces every
  *     hash, bit for bit (HLL/approx_count_distinct use engine-private
  *     xxhash layouts and can never hash-match across engines);
  *   - the state is the k smallest DISTINCT hashes (a bounded sorted
  *     set — ≤ 8k bytes serialized);
  *   - merge = union-then-trim, associative and order-insensitive, so
  *     map-side partial aggregation and AQE coalescing cannot change
  *     the result;
  *   - estimate: exact size while |set| < k (the sketch IS a distinct
  *     count until it saturates), else the standard KMV estimator
  *     (k−1)·2⁶⁰ / h₍ₖ₎ — one long→double conversion and one IEEE
  *     division, both exactly specified, so the twin's double agrees
  *     to the last bit.
  *
  * At 100 TB: constant-size state per group (vs collect_set's unbounded
  * one), mergeable across partitions/batches/days — the property that
  * lets a nightly job fold yesterday's sketches instead of rescanning
  * history (same contract as q99's mergeable histogram).
  *
  * Reference behavior anchor: the reference exposes DuckDB's
  * approx_count_distinct over zeek logs (README.md example queries);
  * this is that capability with a cross-engine-verifiable estimator.
  */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_distinct requires k >= 2")

  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct input must be string or integral (rendered identically by every engine), got ${t.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = KmvHash.hash60(KmvHash.render(v))
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k) b1.add(h)
      else if (h < b1.last) { b1.add(h); if (b1.size > k) b1.pollLast() }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / buf.last.longValue().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** Deterministic bounded-state uniform sample: the k values whose
  * md5-derived hashes are smallest — "bottom-k by hash", the mergeable
  * aggregate form of the d13 sampling idiom. ONE pass, no global sort,
  * no shuffle beyond the group-by, constant 8k-ish state per group, and
  * a second engine reproduces the exact same sample (`ORDER BY
  * md5(v) LIMIT k` per group) — none of which holds for rand()-based
  * TABLESAMPLE. Distinct-value semantics: duplicates hash identically,
  * so the sample is over the distinct values (the useful contract for
  * "show me k example documents per bucket"). Returns the values sorted
  * by hash (the draw order). */
case class KmvSample(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, String]]
  with UnaryLike[Expression] {

  require(k >= 1, "kmv_sample requires k >= 1")

  override def prettyName: String = "kmv_sample"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_sample input must be string or integral, got ${t.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, String] =
    new java.util.TreeMap[java.lang.Long, String]()

  private def add(buf: java.util.TreeMap[java.lang.Long, String], h: Long, v: String): Unit = {
    if (buf.size < k) buf.put(h, v)
    else if (h < buf.lastKey) { buf.put(h, v); if (buf.size > k) buf.pollLastEntry() }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, String], input: InternalRow)
      : java.util.TreeMap[java.lang.Long, String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = KmvHash.render(v)
      add(buf, KmvHash.hash60(s), s)
    }
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, String],
      b2: java.util.TreeMap[java.lang.Long, String]): java.util.TreeMap[java.lang.Long, String] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(b1, e.getKey, e.getValue) }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, String]): Any = {
    val vals = new Array[Any](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { vals(i) = UTF8String.fromString(it.next()); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vals)
  }

  // explicit int-length + raw UTF-8 bytes: writeUTF's 16-bit length cap
  // would crash the shuffle/state serialization on any value over ~64 KB
  override def serialize(buf: java.util.TreeMap[java.lang.Long, String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      val b = e.getValue.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val m = new java.util.TreeMap[java.lang.Long, String]()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val h = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(h, new String(b, "UTF-8"))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSample =
    copy(child = newChild)
}

/** The rollup half of the sketch pattern: `kmv_state` materializes a
  * group's sketch as BINARY (store it in a daily summary table);
  * `kmv_merge_estimate` folds stored sketches into a higher-level
  * estimate WITHOUT rescanning the raw data. Merging bottom-k sets is
  * exact — the merged k smallest hashes are identical to the k smallest
  * computed globally — so a rollup over states equals the direct global
  * sketch bit-for-bit (q118 proves it against a direct-SQL oracle). */
case class KmvState(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_state requires k >= 2")
  override def prettyName: String = "kmv_state"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    KmvDistinct(child, k).checkInputDataTypes()

  @transient private lazy val inner = KmvDistinct(child, k)
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = inner.update(buf, input)
  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    inner.merge(b1, b2)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = serialize(buf)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvState =
    copy(child = newChild)
}

case class KmvMergeEstimate(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_merge_estimate requires k >= 2")
  override def prettyName: String = "kmv_merge_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge_estimate input must be a kmv_state BINARY, got ${t.sql}")
  }

  @transient private lazy val helper = KmvDistinct(child, k)
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) helper.merge(buf, helper.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    helper.merge(b1, b2)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = helper.eval(buf)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    helper.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    helper.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeEstimate =
    copy(child = newChild)
}

/** The k smallest DISTINCT values of a string column, ascending — bit-
  * identical to `slice(array_sort(collect_set(x)), 1, k)` (same binary
  * UTF8String ordering, same set semantics, same truncation) but with
  * BOUNDED state. `collect_set` holds a group's ENTIRE local distinct
  * set in the aggregation buffer and ships it through the shuffle
  * before the slice ever truncates: q138's register merge collected up
  * to 32·degree md5-hex strings per node per round (576M exploded rows
  * through the exchange at sf1). This aggregate holds ≤ k values at
  * every stage, so map-side partials emit ≤ k strings per group and
  * the shuffle carries the truncated registers — the aggregation
  * equivalent of the bare-id band-shuffle rule. Measured on q138 in
  * BASELINE.md (round 10). */
case class MinKStrings(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  require(k >= 1, "min_k_strings requires k >= 1")

  override def prettyName: String = "min_k_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_k_strings input must be string, got ${t.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  private def add(buf: java.util.TreeSet[UTF8String], v: UTF8String): Unit = {
    // clone before storing: eval'd UTF8Strings can point into a reused
    // row buffer, and the buffer must own its bytes across rows
    if (buf.size < k) buf.add(v.clone())
    else if (v.compareTo(buf.last) < 0) {
      buf.add(v.clone()); if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow)
      : java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: java.util.TreeSet[UTF8String],
      b2: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any = {
    val vals = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vals)
  }

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    var total = 4
    val it0 = buf.iterator()
    while (it0.hasNext) total += 4 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      bb.putInt(b.length)
      bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[UTF8String]()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s.add(UTF8String.fromBytes(b))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKStrings =
    copy(child = newChild)
}

/** [[MinKStrings]] over BIGINT values — identical semantics
  * (`slice(array_sort(collect_set(x)), 1, k)` with bounded ≤ k state),
  * numeric ordering instead of UTF8String binary ordering. Exists for
  * register pipelines whose elements are integer hash values: q138's
  * HyperBall registers moved from 32-hex-char md5 strings (~40 B per
  * element in the unsafe row) to their leading-60-bit BIGINTs (8 B) —
  * the SAME bits its estimator already extracted via conv(substr(h))
  * — cutting every per-round register shuffle ~5×. */
case class MinKLongs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "min_k_longs requires k >= 1")

  override def prettyName: String = "min_k_longs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_k_longs input must be bigint, got ${t.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      buf.add(v); if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val vals = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vals)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    val n = bb.getInt
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)
}

/** [[MinKLongs]] over ALREADY-AGGREGATED `array<bigint>` registers:
  * `min_k_longs_merge(regs, k)` ≡ `min_k_longs(explode(regs), k)` but
  * without the explode — each input row contributes its whole array to
  * the ≤ k-element buffer in one update() call. The explode form
  * multiplies the aggregation input by the register width (q138 at
  * sf10: 180M edge rows × 32 register elements = 5.8·10⁹ rows into
  * the partial aggregate, whose sort-based spill exhausted the disk);
  * merging arrays keeps the input at edge-row cardinality and the
  * register payload never leaves its array. NULL arrays and NULL
  * elements are both skipped — exactly what the explode form does
  * (explode drops a NULL array, min_k_longs skips a NULL input), so
  * the documented equivalence holds for ANY array<bigint>, not just
  * the containsNull = false registers this repo builds (the function
  * is SQL-registered, so user queries can feed nullable arrays). */
case class MinKLongsMerge(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "min_k_longs_merge requires k >= 1")

  override def prettyName: String = "min_k_longs_merge"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_k_longs_merge input must be array<bigint>, got ${t.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      buf.add(v); if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) add(buf, arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val vals = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vals)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    val n = bb.getInt
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKLongsMerge =
    copy(child = newChild)
}

/** KMV set algebra: intersection / union / Jaccard ESTIMATES between two
  * stored `kmv_state` sketches — the audience-overlap / cross-corpus-
  * contamination probe that runs on summary-table states without ever
  * rescanning (or co-shuffling) the raw data.
  *
  * The textbook KMV pair estimator (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations"): with SA/SB the
  * two bottom-k hash sets and L the k smallest of SA ∪ SB,
  * matches = |L ∩ SA ∩ SB|, union_est from L's kth minimum,
  * jaccard_est = matches/|L|, inter_est = jaccard_est · union_est.
  * Every step is set arithmetic on 60-bit integers plus correctly-
  * rounded IEEE divisions — the DuckDB oracle replays it bit-for-bit
  * (q120), which no HLL-intersection heuristic can offer.
  *
  * Scalar, not aggregate: it runs on the (tiny) pair join of a state
  * table — eval-only is fine off the per-row hot path. */
case class KmvPairStats(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2, "kmv_pair_stats requires k >= 2")
  override def prettyName: String = "kmv_pair_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("matches", LongType, nullable = false),
    StructField("union_est", DoubleType, nullable = false),
    StructField("inter_est", DoubleType, nullable = false),
    StructField("jaccard_est", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_pair_stats takes two kmv_state BINARY columns, got ${l.sql}, ${r.sql}")
    }

  @transient private lazy val codec = KmvDistinct(left, k)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = codec.deserialize(a.asInstanceOf[Array[Byte]])
    val sb = codec.deserialize(b.asInstanceOf[Array[Byte]])
    // L = the k smallest of SA ∪ SB (set union: equal hashes collapse)
    val l = new java.util.TreeSet[java.lang.Long](sa)
    l.addAll(sb)
    while (l.size > k) l.pollLast()
    val lSize = l.size
    var matches = 0L
    val it = l.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (sa.contains(h) && sb.contains(h)) matches += 1
    }
    val unionEst =
      if (lSize < k) lSize.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 / l.last.longValue().toDouble
    val jaccardEst = if (lSize == 0) 0.0 else matches.toDouble / lSize.toDouble
    val interEst = if (lSize == 0) 0.0
      else matches.toDouble * unionEst / lSize.toDouble
    InternalRow(matches, unionEst, interEst, jaccardEst)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KmvPairStats = copy(left = newLeft, right = newRight)
}

object KmvSketch {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "kmv_distinct" -> {
      case Seq(c) => KmvDistinct(c, 256)
      case Seq(c, Literal(k: Int, IntegerType)) => KmvDistinct(c, k)
      case Seq(c, Literal(k: Long, LongType))   => KmvDistinct(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"kmv_distinct(value[, k-literal]) — got ${es.length} arguments")
    },
    "kmv_state" -> {
      case Seq(c, Literal(k: Int, IntegerType)) => KmvState(c, k)
      case Seq(c, Literal(k: Long, LongType))   => KmvState(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"kmv_state(value, k-literal) — got ${es.length} arguments")
    },
    "kmv_merge_estimate" -> {
      case Seq(c, Literal(k: Int, IntegerType)) => KmvMergeEstimate(c, k)
      case Seq(c, Literal(k: Long, LongType))   => KmvMergeEstimate(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"kmv_merge_estimate(state, k-literal) — got ${es.length} arguments")
    },
    "kmv_sample" -> {
      case Seq(c, Literal(k: Int, IntegerType)) => KmvSample(c, k)
      case Seq(c, Literal(k: Long, LongType))   => KmvSample(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"kmv_sample(value, k-literal) — got ${es.length} arguments")
    },
    "kmv_pair_stats" -> {
      case Seq(a, b, Literal(k: Int, IntegerType)) => KmvPairStats(a, b, k)
      case Seq(a, b, Literal(k: Long, LongType))   => KmvPairStats(a, b, k.toInt)
      case es => throw new IllegalArgumentException(
        s"kmv_pair_stats(stateA, stateB, k-literal) — got ${es.length} arguments")
    },
    "min_k_strings" -> {
      case Seq(c, Literal(k: Int, IntegerType)) => MinKStrings(c, k)
      case Seq(c, Literal(k: Long, LongType))   => MinKStrings(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"min_k_strings(value, k-literal) — got ${es.length} arguments")
    },
    "min_k_longs" -> {
      case Seq(c, Literal(k: Int, IntegerType)) => MinKLongs(c, k)
      case Seq(c, Literal(k: Long, LongType))   => MinKLongs(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"min_k_longs(value, k-literal) — got ${es.length} arguments")
    },
    "min_k_longs_merge" -> {
      case Seq(c, Literal(k: Int, IntegerType)) => MinKLongsMerge(c, k)
      case Seq(c, Literal(k: Long, LongType))   => MinKLongsMerge(c, k.toInt)
      case es => throw new IllegalArgumentException(
        s"min_k_longs_merge(array, k-literal) — got ${es.length} arguments")
    })

  /** Column form of [[MinKStrings]] — the bounded-state replacement for
    * `slice(array_sort(collect_set(c)), 1, k)`. */
  def minKStrings(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftSql.column(
      MinKStrings(org.apache.spark.sql.graft.GraftSql.expression(c), k)
        .toAggregateExpression())

  /** Column form of [[MinKLongs]]. */
  def minKLongs(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftSql.column(
      MinKLongs(org.apache.spark.sql.graft.GraftSql.expression(c), k)
        .toAggregateExpression())

  /** Column form of [[MinKLongsMerge]] — min-k over `array<bigint>`
    * inputs without the explode. */
  def minKLongsMerge(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftSql.column(
      MinKLongsMerge(org.apache.spark.sql.graft.GraftSql.expression(c), k)
        .toAggregateExpression())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
