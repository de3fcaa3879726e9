package graft.dedup

import org.apache.spark.unsafe.types.UTF8String

/** Allocation-lean MinHash / SimHash signature kernel, called from
  * generated code by [[graft.functions.MinhashSig]] /
  * [[graft.functions.Simhash64]].
  *
  * BIT-COMPATIBLE with the UDF path it replaces
  * ([[Dedup.shingleHashes]] over `text.split("\\s+")` +
  * [[Dedup.hashString]]): word hashes iterate UTF-16 code units decoded
  * straight from the UTF-8 bytes (no String materialization, no regex,
  * no per-word String allocation), reproducing `31*h + charAt(i)`
  * exactly — including surrogate pairs — and the field list reproduces
  * Java `split`'s limit-0 semantics (one leading empty field when the
  * text starts with whitespace, trailing empty fields dropped, a single
  * empty field for empty/all-whitespace text). Identical inputs produce
  * identical signatures, so banding recall — and therefore the verified
  * near-dup pair sets — is unchanged (property-pinned in
  * `SignatureKernelSpec`).
  */
object SignatureKernel {

  private final val Prime = 1125899906842597L
  private final val Golden = 0x9e3779b97f4a7c15L

  /** [[Dedup.hashString]] over the UTF-16 units of the UTF-8 slice
    * [st, en). Invalid bytes hash exactly as `new String(bytes, UTF_8)`
    * decodes them: a multi-byte sequence truncated at the slice end is
    * one U+FFFD (Java reports the whole incomplete tail as a single
    * malformed unit), and an invalid LEAD byte — a stray continuation
    * 0x80–0xBF, the overlong leads 0xC0/0xC1, or 0xF5–0xFF — is one
    * U+FFFD advancing one byte (Java reports malformed length 1 per
    * such byte). Both rules also keep every `getByte` inside [st, en),
    * so malformed input can never drive an unsafe read past `numBytes`.
    * Interior continuation-byte well-formedness (bytes 2..k of a valid
    * lead being 0x80–0xBF and in the lead's legal sub-range) is still
    * assumed, as it is everywhere UTF8String columns originate from
    * real sources. */
  private def hashWord(s: UTF8String, st: Int, en: Int): Long = {
    var h = Prime
    var i = st
    while (i < en) {
      val b0 = s.getByte(i) & 0xff
      val need =
        if (b0 < 0x80) 1
        else if (b0 < 0xc2) -1 // stray continuation or overlong C0/C1 lead
        else if (b0 < 0xe0) 2
        else if (b0 < 0xf0) 3
        else if (b0 < 0xf5) 4
        else -1 // F5-FF are never valid UTF-8 leads
      if (need == -1) {
        h = 31 * h + 0xfffd
        i += 1
      } else if (i + need > en) {
        h = 31 * h + 0xfffd
        i = en
      } else if (need == 1) {
        h = 31 * h + b0; i += 1
      } else if (need == 2) {
        h = 31 * h + (((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f)); i += 2
      } else if (need == 3) {
        h = 31 * h + (((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f)); i += 3
      } else {
        val cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f)
        val u = cp - 0x10000
        h = 31 * h + (0xd800 + (u >> 10))
        h = 31 * h + (0xdc00 + (u & 0x3ff))
        i += 4
      }
    }
    Dedup.mix64(h)
  }

  /** Byte ranges [st, en) of `split("\\s+")`'s field list, as flat
    * (start, end) pairs. Java `split` with the default limit 0: an empty
    * input yields `[""]` (no match → the whole string), an
    * all-whitespace input yields `[]` (both boundary empties are
    * trailing and get dropped), a leading whitespace run contributes one
    * empty leading field (range (0, 0)), a trailing run contributes
    * nothing. Shared tokenizer behind [[wordHashes]] (hash path) and
    * [[shingleStrings]] (string path) so the two can never diverge. */
  private def tokenRanges(s: UTF8String): Array[Int] = {
    val n = s.numBytes()
    if (n == 0) return Array(0, 0) // empty input → [""]
    var tr = new Array[Int](32)
    var cnt = 0
    var tokStart = -1
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      val ws = c == ' ' || (c >= 0x09 && c <= 0x0d)
      if (ws) {
        if (tokStart >= 0) {
          if (2 * cnt == tr.length) tr = java.util.Arrays.copyOf(tr, tr.length * 2)
          tr(2 * cnt) = tokStart; tr(2 * cnt + 1) = i; cnt += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) {
      if (2 * cnt == tr.length) tr = java.util.Arrays.copyOf(tr, tr.length + 2)
      tr(2 * cnt) = tokStart; tr(2 * cnt + 1) = n; cnt += 1
    }
    if (cnt == 0) new Array[Int](0) // all-whitespace
    else {
      val b0 = s.getByte(0)
      val leadingWs = b0 == ' ' || (b0 >= 0x09 && b0 <= 0x0d)
      if (leadingWs) {
        val out = new Array[Int](2 * cnt + 2) // one empty leading field
        System.arraycopy(tr, 0, out, 2, 2 * cnt)
        out
      } else java.util.Arrays.copyOf(tr, 2 * cnt)
    }
  }

  /** Word hashes of `split("\\s+")`'s field list (see [[tokenRanges]]). */
  private def wordHashes(s: UTF8String): Array[Long] = {
    val tr = tokenRanges(s)
    val k = tr.length / 2
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = hashWord(s, tr(2 * i), tr(2 * i + 1)); i += 1 }
    out
  }

  /** Distinct word n-gram shingle STRINGS — [[Dedup.shingles]]' exact
    * output (values AND first-seen order) without the String round-trip:
    * one `getBytes` per document, then byte-slice concatenation per
    * shingle. This is the kernel behind [[graft.functions.Shingles]],
    * which replaces the per-row Scala UDF on the full-corpus explode
    * paths (decontamination, inverted-index joins) — the paths where a
    * UDF's UTF8String→String→regex-split→mkString round-trip per row is
    * pure overhead at corpus scale. */
  def shingleStrings(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes // at most one copy per document
    val tr = tokenRanges(s)
    val k = tr.length / 2
    // join tokens [i0, i0+cnt) with single 0x20 separators — exactly
    // Array.mkString(" ") over the split fields
    def joined(i0: Int, cnt: Int): UTF8String = {
      var len = if (cnt > 0) cnt - 1 else 0
      var j = 0
      while (j < cnt) { len += tr(2 * (i0 + j) + 1) - tr(2 * (i0 + j)); j += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < cnt) {
        val st = tr(2 * (i0 + j))
        val w = tr(2 * (i0 + j) + 1) - st
        System.arraycopy(bytes, st, out, pos, w)
        pos += w
        if (j < cnt - 1) { out(pos) = ' '; pos += 1 }
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    if (k < n) Array(joined(0, k))
    else {
      val m = k - n + 1
      val seen = new java.util.HashSet[UTF8String](m * 2)
      val buf = new Array[UTF8String](m)
      var w = 0
      var i = 0
      while (i < m) {
        val sh = joined(i, n)
        if (seen.add(sh)) { buf(w) = sh; w += 1 }
        i += 1
      }
      if (w == m) buf else java.util.Arrays.copyOf(buf, w)
    }
  }

  /** [[shingleStrings]] boxed as Catalyst ArrayData — the form generated
    * code assigns directly. */
  def shinglesData(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      shingleStrings(s, n).asInstanceOf[Array[Any]])

  /** Sorted distinct n-gram shingle hashes — [[Dedup.shingleHashes]]'
    * exact output without the String round-trips. */
  def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val wh = wordHashes(s)
    val m = math.max(wh.length - n + 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Prime
      var k = 0
      while (k < n && i + k < wh.length) { h = h * Golden + wh(i + k); k += 1 }
      out(i) = Dedup.mix64(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** MinHash signature — [[Dedup.minhashSignature]]'s loop verbatim. */
  def minhashSig(s: UTF8String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val hs = shingleHashes(s, shingleSize)
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = Dedup.mix64(2 * i + 1) | 1L
      val b = Dedup.mix64(1000003L * i)
      var best = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = a * hs(j) + b
        if (v < best) best = v
        j += 1
      }
      sig(i) = best
      i += 1
    }
    sig
  }

  /** 64-bit SimHash — [[Dedup.simhash64]]'s vote loop verbatim. */
  def simhash64(s: UTF8String): Long = {
    val hs = shingleHashes(s, 2)
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}
