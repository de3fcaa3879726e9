package graft.ann

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.{AnnKernel, AnnKernel2}

/** Per-row kernels for the PQ / IVF-PQ / SQ8 index family, run through
  * [[graft.functions.AnnKernelExpr]] — native expressions, NOT ScalaUDFs.
  *
  * These retire the per-row `udf {}` closures that previously computed
  * encode / distance-table / cell-assignment over broadcast codebooks
  * (round-14 verdict item 3). The closures' arithmetic is preserved
  * BIT-FOR-BIT — each kernel's scaladoc names the closure it replaces
  * and `PqKernelSpec` keeps the originals alive as test oracles. What
  * changed is the execution shape: the closure path paid
  * CatalystTypeConverters boxing (ArrayData → Seq[Float] → result →
  * ArrayData) plus closure dispatch per row and fenced whole-stage
  * codegen; a kernel reads the UnsafeArrayData primitives directly and
  * is invoked as one virtual call inlined in the generated code.
  *
  * Codebooks are stored FLATTENED (row-major) in each kernel instance:
  * `books[(s*ksub + c)*subDim + d]`, `cents[c*dims + d]` — one
  * contiguous primitive array per kernel, cache-friendly and cheap to
  * serialize with the plan (these are sample-trained, ≤ a few hundred
  * KB; the old path broadcast the same data).
  *
  * One DELIBERATE deviation from the closures, shared with
  * [[Ann.ivfTopK]]'s round-14 cellOf note: a vector whose length does
  * not match the trained dimensionality returns NULL (callers filter →
  * the row is dropped), where the closures crashed the task with an
  * out-of-bounds read. Unreachable on verified fixed-dims corpora;
  * dropping is the defensible semantics for malformed input at 100 TB
  * (one bad row must not kill a 10⁶-row task).
  */
object AnnKernels {

  private def intArray(a: Array[Int]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(a)
  private def longArray(a: Array[Long]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(a)

  /** Replaces [[Ann.sq8TopK]]'s `enc` and [[Ann.ivfPqTopKQuantized]]'s
    * `quantUdf`: element e → clamp(floor(e·scale), lo, hi) as BIGINT.
    * `dims = 0` quantizes every element (sq8: no length contract);
    * `dims > 0` emits exactly the first `dims` elements and returns
    * NULL for shorter vectors (the quantized twins' explicit
    * `v.length < dims` guard). */
  final class QuantizeKernel(scale: Double, lo: Long, hi: Long, dims: Int)
      extends AnnKernel {
    override def name: String = "sq_quantize"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def apply(v: ArrayData): Any = {
      val n = if (dims > 0) dims else v.numElements()
      if (v.numElements() < n) return null
      val out = new Array[Long](n)
      var d = 0
      while (d < n) {
        val q = math.floor(v.getFloat(d).toDouble * scale).toLong
        out(d) = math.max(lo, math.min(hi, q))
        d += 1
      }
      longArray(out)
    }
  }

  /** Replaces [[Ann.pqTopK]]'s `encode` (quantized = false; trained
    * FLOAT codebooks, subDist's double-widened subtract / double
    * accumulate, strict `<` so ties keep the lowest code) and
    * [[Ann.pqTopKQuantized]]'s `encode` (quantized = true; fixed BIGINT
    * codebooks over floor(v·1024), all-integer distances). */
  final class PqEncodeKernel(booksF: Array[Float], booksL: Array[Long],
      m: Int, ksub: Int, subDim: Int) extends AnnKernel {
    override def name: String = if (booksL != null) "pq_encode_q" else "pq_encode"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def apply(v: ArrayData): Any = {
      if (v.numElements() < m * subDim) return null
      // quantized path: floor ONCE per element (the closures' qv was
      // recomputed per (code, dim); hoisting it is value-identical and
      // removes ksub× redundant floors from the corpus map pass)
      val q: Array[Long] =
        if (booksL == null) null
        else Array.tabulate(m * subDim)(gd => math.floor(v.getFloat(gd).toDouble * 1024.0).toLong)
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = 0
        var c = 0
        if (booksL != null) {
          var bestD = Long.MaxValue
          while (c < ksub) {
            var d2 = 0L
            var d = 0
            val base = (s * ksub + c) * subDim
            while (d < subDim) {
              val diff = q(s * subDim + d) - booksL(base + d)
              d2 += diff * diff
              d += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
        } else {
          var bestD = Double.MaxValue
          while (c < ksub) {
            var d2 = 0.0
            var d = 0
            val base = (s * ksub + c) * subDim
            while (d < subDim) {
              val diff = v.getFloat(s * subDim + d).toDouble - booksF(base + d)
              d2 += diff * diff
              d += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
        }
        out(s) = best
        s += 1
      }
      intArray(out)
    }
  }

  /** Replaces [[Ann.pqTopK]]'s `table` / [[Ann.pqTopKQuantized]]'s
    * `table`: the query's m×ksub distance table (double for trained
    * float books, BIGINT for the fixed quantized books). */
  final class PqTableKernel(booksF: Array[Float], booksL: Array[Long],
      m: Int, ksub: Int, subDim: Int) extends AnnKernel {
    override def name: String = if (booksL != null) "pq_table_q" else "pq_table"
    override def dataType: DataType = ArrayType(
      ArrayType(if (booksL != null) LongType else DoubleType, containsNull = false),
      containsNull = false)
    override def apply(v: ArrayData): Any = {
      if (v.numElements() < m * subDim) return null
      // see PqEncodeKernel: hoisted one-floor-per-element quantization
      val q: Array[Long] =
        if (booksL == null) null
        else Array.tabulate(m * subDim)(gd => math.floor(v.getFloat(gd).toDouble * 1024.0).toLong)
      val rows = new Array[Any](m)
      var s = 0
      while (s < m) {
        if (booksL != null) {
          val row = new Array[Long](ksub)
          var c = 0
          while (c < ksub) {
            var d2 = 0L
            var d = 0
            val base = (s * ksub + c) * subDim
            while (d < subDim) {
              val diff = q(s * subDim + d) - booksL(base + d)
              d2 += diff * diff
              d += 1
            }
            row(c) = d2
            c += 1
          }
          rows(s) = longArray(row)
        } else {
          val row = new Array[Double](ksub)
          var c = 0
          while (c < ksub) {
            var d2 = 0.0
            var d = 0
            val base = (s * ksub + c) * subDim
            while (d < subDim) {
              val diff = v.getFloat(s * subDim + d).toDouble - booksF(base + d)
              d2 += diff * diff
              d += 1
            }
            row(c) = d2
            c += 1
          }
          rows(s) = UnsafeArrayData.fromPrimitiveArray(row)
        }
        s += 1
      }
      new GenericArrayData(rows)
    }
  }

  /** Replaces the cell-assignment half of [[Ann.ivfPqTopK]]'s `encode`
    * (quantized = false: `nearestCentroid`'s FLOAT subtract / FLOAT
    * multiply / double accumulate over min(v.length, dims), strict `<`)
    * and of [[Ann.ivfPqTopKQuantized]]'s (quantized = true: `cellOf`'s
    * all-BIGINT distance over floor(v·1024), NULL for short vectors). */
  final class IvfCellKernel(centsF: Array[Float], centsL: Array[Long],
      nLists: Int, dims: Int) extends AnnKernel {
    override def name: String = if (centsL != null) "ivf_cell_q" else "ivf_cell"
    override def dataType: DataType = IntegerType
    override def apply(v: ArrayData): Any = {
      if (centsL != null) {
        if (v.numElements() < dims) return null
        // quantize ONCE per row (the retired closure's q = quant(v)),
        // not once per centroid — this is the one-pass-over-every-
        // vector corpus stage, and nLists× redundant floors would
        // roughly double its inner-loop cost
        val q = new Array[Long](dims)
        var d0 = 0
        while (d0 < dims) {
          q(d0) = math.floor(v.getFloat(d0).toDouble * 1024.0).toLong
          d0 += 1
        }
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < nLists) {
          var d2 = 0L
          var d = 0
          while (d < dims) {
            val x = q(d) - centsL(c * dims + d)
            d2 += x * x
            d += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        Integer.valueOf(best)
      } else {
        val n = math.min(v.numElements(), dims)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < nLists) {
          var d2 = 0.0
          var d = 0
          while (d < n) {
            val diff = v.getFloat(d) - centsF(c * dims + d)
            d2 += (diff * diff).toDouble
            d += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        Integer.valueOf(best)
      }
    }
  }

  /** Replaces the residual-encode half of [[Ann.ivfPqTopK]]'s `encode`
    * (float: residual = FLOAT subtract v−cent, then the trained-book
    * double-widened subDist argmin) and of
    * [[Ann.ivfPqTopKQuantized]]'s (integer residual and books). Binary:
    * (vector, cell from [[IvfCellKernel]]). NULL unless the vector has
    * exactly the trained width on the float path (the closure crashed
    * on either direction of mismatch) / at least `dims` on the
    * quantized path (its explicit guard). */
  final class IvfPqCodesKernel(centsF: Array[Float], centsL: Array[Long],
      booksF: Array[Float], booksL: Array[Long],
      m: Int, ksub: Int, subDim: Int, dims: Int) extends AnnKernel2 {
    override def name: String = if (booksL != null) "ivfpq_codes_q" else "ivfpq_codes"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def apply(v: ArrayData, cell: Int): Any = {
      if (booksL != null) {
        if (v.numElements() < dims) return null
        // integer residual, reused across subspaces
        val rv = new Array[Long](dims)
        var d = 0
        while (d < dims) {
          rv(d) = math.floor(v.getFloat(d).toDouble * 1024.0).toLong - centsL(cell * dims + d)
          d += 1
        }
        val out = new Array[Int](m)
        var s = 0
        while (s < m) {
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < ksub) {
            var d2 = 0L
            var dd = 0
            val base = (s * ksub + c) * subDim
            while (dd < subDim) {
              val diff = rv(s * subDim + dd) - booksL(base + dd)
              d2 += diff * diff
              dd += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          out(s) = best
          s += 1
        }
        intArray(out)
      } else {
        if (v.numElements() != dims) return null
        // FLOAT residual (the closure materialized Array[Float]) — the
        // later double-widened subtract must start from the float value
        val rv = new Array[Float](dims)
        var d = 0
        while (d < dims) {
          rv(d) = v.getFloat(d) - centsF(cell * dims + d)
          d += 1
        }
        val out = new Array[Int](m)
        var s = 0
        while (s < m) {
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d2 = 0.0
            var dd = 0
            val base = (s * ksub + c) * subDim
            while (dd < subDim) {
              val diff = rv(s * subDim + dd).toDouble - booksF(base + dd)
              d2 += diff * diff
              dd += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          out(s) = best
          s += 1
        }
        intArray(out)
      }
    }
  }

  /** Replaces the per-cell residual table inside [[Ann.ivfPqTopK]]'s
    * `probeTabs` (float) / [[Ann.ivfPqTopKQuantized]]'s (integer).
    * Binary: (vector, cell). The closures built ALL probed cells' tables
    * in one row value; decomposed, the query side explodes its probe
    * list first and this kernel builds one cell's table — same tables,
    * same rows, simpler value shape. */
  final class IvfPqTableKernel(centsF: Array[Float], centsL: Array[Long],
      booksF: Array[Float], booksL: Array[Long],
      m: Int, ksub: Int, subDim: Int, dims: Int) extends AnnKernel2 {
    override def name: String = if (booksL != null) "ivfpq_table_q" else "ivfpq_table"
    override def dataType: DataType = ArrayType(
      ArrayType(if (booksL != null) LongType else DoubleType, containsNull = false),
      containsNull = false)
    override def apply(v: ArrayData, cell: Int): Any = {
      if (booksL != null) {
        if (v.numElements() < dims) return null
        val rv = new Array[Long](dims)
        var d = 0
        while (d < dims) {
          rv(d) = math.floor(v.getFloat(d).toDouble * 1024.0).toLong - centsL(cell * dims + d)
          d += 1
        }
        val rows = new Array[Any](m)
        var s = 0
        while (s < m) {
          val row = new Array[Long](ksub)
          var c = 0
          while (c < ksub) {
            var d2 = 0L
            var dd = 0
            val base = (s * ksub + c) * subDim
            while (dd < subDim) {
              val diff = rv(s * subDim + dd) - booksL(base + dd)
              d2 += diff * diff
              dd += 1
            }
            row(c) = d2
            c += 1
          }
          rows(s) = longArray(row)
          s += 1
        }
        new GenericArrayData(rows)
      } else {
        if (v.numElements() != dims) return null
        val rv = new Array[Float](dims)
        var d = 0
        while (d < dims) {
          rv(d) = v.getFloat(d) - centsF(cell * dims + d)
          d += 1
        }
        val rows = new Array[Any](m)
        var s = 0
        while (s < m) {
          val row = new Array[Double](ksub)
          var c = 0
          while (c < ksub) {
            var d2 = 0.0
            var dd = 0
            val base = (s * ksub + c) * subDim
            while (dd < subDim) {
              val diff = rv(s * subDim + dd).toDouble - booksF(base + dd)
              d2 += diff * diff
              dd += 1
            }
            row(c) = d2
            c += 1
          }
          rows(s) = UnsafeArrayData.fromPrimitiveArray(row)
          s += 1
        }
        new GenericArrayData(rows)
      }
    }
  }

  /** Replaces the probe-selection half of [[Ann.ivfPqTopK]]'s
    * `probeTabs`: the `nProbe` nearest cells, ascending by
    * (distance, cell) — `probeList`'s stable `sortBy(_._2)` under
    * java.lang.Double.compare semantics (ties keep the lower cell, NaN
    * sorts last), with `nearestCentroid`'s float-subtract arithmetic
    * over min(v.length, dims). */
  final class IvfProbeKernel(centsF: Array[Float], nLists: Int, dims: Int,
      nProbe: Int) extends AnnKernel {
    // keeps the selection loop total: nLists == 0 would leave best == -1
    // and index out of bounds below (unreachable via lloyd, which trains
    // >= 1 centroid from any non-empty sample, but the kernel itself
    // must not rely on its caller's training path)
    require(nLists > 0, "ivf_probe: nLists must be positive")
    override def name: String = "ivf_probe"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def apply(v: ArrayData): Any = {
      val n = math.min(v.numElements(), dims)
      val d2s = new Array[Double](nLists)
      var c = 0
      while (c < nLists) {
        var d2 = 0.0
        var d = 0
        while (d < n) {
          val diff = v.getFloat(d) - centsF(c * dims + d)
          d2 += (diff * diff).toDouble
          d += 1
        }
        d2s(c) = d2
        c += 1
      }
      val take = math.min(nProbe, nLists)
      val used = new Array[Boolean](nLists)
      val out = new Array[Int](take)
      var i = 0
      while (i < take) {
        var best = -1
        var j = 0
        while (j < nLists) {
          if (!used(j) &&
              (best < 0 || java.lang.Double.compare(d2s(j), d2s(best)) < 0)) {
            best = j
          }
          j += 1
        }
        used(best) = true
        out(i) = best
        i += 1
      }
      intArray(out)
    }
  }
}
