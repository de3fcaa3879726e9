package graft.zeek.v2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.zeek._

/** Per-file row reader: open (+ decompress), parse + validate header,
  * then a single-pass tokenize / filter / emit loop (reference:
  * ZeekScanExecute, src/zeek_scanner.cpp:670-900).
  *
  * Hot-path design: reused token-offset arrays, byte-slice parsers, pushed
  * filters evaluated on their columns BEFORE the remaining columns are
  * parsed (src/zeek_scanner.cpp:718-771), COUNT(*) path skips
  * tokenization entirely (src/zeek_scanner.cpp:707-711), and an
  * UnsafeRowWriter direct-write path when no filter/array column is
  * involved. The columnar sibling is [[ZeekColumnarPartitionReader]].
  */
final class ZeekPartitionReader(
    spec: ZeekFileSpec,
    boundHeader: ZeekHeader,
    dataSchema: StructType,
    opts: ZeekOptions,
    required: StructType,
    pushed: Array[Filter],
    conf: Configuration,
    limit: Int = -1) extends PartitionReader[InternalRow] {

  private var emitted = 0L

  private val scanner = new ZeekLineScanner(spec, opts, conf)
  private var proj: ZeekProjection = _
  private var initialized = false
  private var finished = false
  private var currentRow: InternalRow = _

  private val nReq = required.length
  private val countOnly = nReq == 0
  // filter plan:
  private var filterCols: Array[Int] = _          // required indices parsed before predicate eval
  private var postCols: Array[Int] = _            // remaining required indices
  private var predicate: ZeekFilterEval.RowPred = _

  private val emptyRow = new GenericInternalRow(Array.empty[Any])

  // UnsafeRow fast path when no array column is projected: one reused
  // value buffer + writer, zero per-row allocation (the writer's buffer
  // is copied by downstream operators that retain rows, so reuse is the
  // standard source pattern)
  private val useUnsafe: Boolean =
    required.fields.forall(f => !f.dataType.isInstanceOf[ArrayType])
  private val unsafeWriter =
    if (useUnsafe && nReq > 0)
      new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(nReq)
    else null
  private val reusedValues = if (useUnsafe) new Array[Any](nReq) else null
  private val prim = new ZeekTypes.PrimParsers

  private def init(): Unit = {
    if (!scanner.init()) { finished = true; return }
    proj = new ZeekProjection(spec, boundHeader, dataSchema, opts, required,
      scanner.fileHeader)

    // filter plan: evaluate pushed filters after parsing only their columns
    val reqIndex = required.fieldNames.zipWithIndex.toMap
    val dts = required.fields.map(f => f.name -> f.dataType).toMap
    val supported = pushed.filter(f => ZeekFilterEval.referencedIfSupported(f).isDefined)
    if (supported.nonEmpty) {
      val preds = supported.map(ZeekFilterEval.compile(_, reqIndex, dts))
      predicate = row => preds.forall(p => p(row))
      val names = supported.flatMap(f => ZeekFilterEval.referencedIfSupported(f).get).distinct
      filterCols = names.flatMap(reqIndex.get).toArray
      postCols = (0 until nReq).filterNot(filterCols.contains).toArray
    } else {
      predicate = null
      filterCols = Array.empty
      postCols = (0 until nReq).toArray
    }
  }

  override def next(): Boolean = {
    if (finished) return false
    if (limit >= 0 && emitted >= limit) { // pushed LocalLimit: stop reading early
      finished = true
      close()
      return false
    }
    if (!initialized) {
      initialized = true
      try init()
      catch {
        case e: Exception if opts.ignoreFileErrors =>
          finished = true
          close()
          return false
        case e: ZeekFormatException => throw e
        case e: Exception =>
          throw new ZeekFormatException(s"Failed to read Zeek log '${spec.path}': ${e.getMessage}")
      }
      if (finished) return false // init decided this split has no data
    }
    while (scanner.nextDataLine()) {
      if (countOnly) { currentRow = emptyRow; emitted += 1; return true }
      if (emitRow(scanner.buf, scanner.lineStart, scanner.lineEnd)) {
        emitted += 1
        return true
      }
    }
    finished = true
    close()
    false
  }

  /** Tokenize + filter + build the output row. Returns false if the row
    * was dropped by a pushed filter. */
  private def emitRow(buf: Array[Byte], ls: Int, le: Int): Boolean = {
    val nTok = proj.tokenize(buf, ls, le)
    // no pushed predicate + all-scalar projection: parse numerics straight
    // into the UnsafeRowWriter — no boxed Array[Any] staging at all (the
    // full-width parse hot path)
    if (useUnsafe && predicate == null) { writeDirect(buf, nTok); return true }
    val values = if (useUnsafe) {
      java.util.Arrays.fill(reusedValues.asInstanceOf[Array[AnyRef]], 0, nReq, null)
      reusedValues
    } else new Array[Any](nReq)
    var k = 0
    while (k < filterCols.length) {
      val c = filterCols(k)
      values(c) = proj.parseCol(c, buf, nTok)
      k += 1
    }
    if (predicate != null && !predicate(values)) return false
    k = 0
    while (k < postCols.length) {
      val c = postCols(k)
      values(c) = proj.parseCol(c, buf, nTok)
      k += 1
    }
    if (useUnsafe) {
      val w = unsafeWriter
      w.reset()
      w.zeroOutNullBytes()
      var i = 0
      while (i < nReq) {
        values(i) match {
          case null                      => w.setNullAt(i)
          case u: UTF8String             => w.write(i, u)
          case l: java.lang.Long         => w.write(i, l.longValue)
          case n: java.lang.Integer      => w.write(i, n.intValue)
          case d: java.lang.Double       => w.write(i, d.doubleValue)
          case b: java.lang.Boolean      => w.write(i, b.booleanValue)
          case other                     => throw new IllegalStateException(s"unexpected value $other")
        }
        i += 1
      }
      currentRow = w.getRow
    } else {
      currentRow = new GenericInternalRow(values)
    }
    true
  }

  /** Direct UnsafeRow build: per-column primitive parse + write, matching
    * [[ZeekProjection.parseCol]] semantics exactly (marker check first,
    * then the typed parser; TryCast-NULL on malformed input). */
  private def writeDirect(buf: Array[Byte], nTok: Int): Unit = {
    val w = unsafeWriter
    w.reset()
    w.zeroOutNullBytes()
    val srcIdx = proj.srcIdx
    val tokStart = proj.tokStart
    val tokEnd = proj.tokEnd
    val typeCodes = proj.typeCodes
    var c = 0
    while (c < nReq) {
      val si = srcIdx(c)
      if (si == -2) w.write(c, proj.filenameValue)
      else if (si < 0 || si >= nTok) w.setNullAt(c)
      else {
        val s = tokStart(si)
        val e = tokEnd(si)
        if (ZeekTypes.sliceEquals(buf, s, e, proj.unsetBytes) ||
            ZeekTypes.sliceEquals(buf, s, e, proj.emptyBytes)) w.setNullAt(c)
        else typeCodes(c) match {
          // raw byte-slice write: StringType's row layout is the UTF-8
          // bytes, so no UTF8String wrapper allocation per cell
          case ZeekTypes.TcString => w.write(c, buf, s, e - s)
          case ZeekTypes.TcCount =>
            val v = prim.longIn(buf, s, e, 0L, Long.MaxValue)
            if (prim.lastNull) w.setNullAt(c) else w.write(c, v)
          case ZeekTypes.TcInt =>
            val v = prim.longIn(buf, s, e, Long.MinValue, Long.MaxValue)
            if (prim.lastNull) w.setNullAt(c) else w.write(c, v)
          case ZeekTypes.TcPort =>
            val v = prim.longIn(buf, s, e, 0L, 65535L)
            if (prim.lastNull) w.setNullAt(c) else w.write(c, v.toInt)
          case ZeekTypes.TcTime =>
            val v = prim.timeMicros(buf, s, e)
            if (prim.lastNull) w.setNullAt(c) else w.write(c, v)
          case ZeekTypes.TcBool => w.write(c, prim.bool(buf, s, e))
          case ZeekTypes.TcDouble =>
            val v = prim.dbl(buf, s, e)
            if (prim.lastNull) w.setNullAt(c) else w.write(c, v)
        }
      }
      c += 1
    }
    currentRow = w.getRow
  }

  override def get(): InternalRow = currentRow

  override def close(): Unit = scanner.close()
}
