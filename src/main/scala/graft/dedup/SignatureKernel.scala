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
    * [st, en). A multi-byte sequence truncated at the slice end (invalid
    * UTF-8 — possible via binary→string casts) hashes as U+FFFD, the
    * replacement char `new String(bytes, UTF_8)` decodes it to; the
    * bound also keeps every `getByte` inside [st, en), so a malformed
    * lead byte can never drive an unsafe read past `numBytes`. Interior
    * well-formedness (continuation bytes in 0x80–0xBF) is assumed, as it
    * is everywhere UTF8String columns originate from real sources. */
  private def hashWord(s: UTF8String, st: Int, en: Int): Long = {
    var h = Prime
    var i = st
    while (i < en) {
      val b0 = s.getByte(i) & 0xff
      val need = if (b0 < 0x80) 1 else if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
      if (i + need > en) {
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

  /** Word hashes of `split("\\s+")`'s field list. Java `split` with the
    * default limit 0: an empty input yields `[""]` (no match → the whole
    * string), an all-whitespace input yields `[]` (both boundary empties
    * are trailing and get dropped), a leading whitespace run contributes
    * one empty leading field, a trailing run contributes nothing. */
  private def wordHashes(s: UTF8String): Array[Long] = {
    val n = s.numBytes()
    val emptyHash = Dedup.mix64(Prime)
    if (n == 0) return Array(emptyHash)
    var wh = new Array[Long](16)
    var cnt = 0
    var tokStart = -1
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      val ws = c == ' ' || (c >= 0x09 && c <= 0x0d)
      if (ws) {
        if (tokStart >= 0) {
          if (cnt == wh.length) wh = java.util.Arrays.copyOf(wh, cnt * 2)
          wh(cnt) = hashWord(s, tokStart, i); cnt += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) {
      if (cnt == wh.length) wh = java.util.Arrays.copyOf(wh, cnt + 1)
      wh(cnt) = hashWord(s, tokStart, n); cnt += 1
    }
    if (cnt == 0) new Array[Long](0) // all-whitespace
    else {
      val b0 = s.getByte(0)
      val leadingWs = b0 == ' ' || (b0 >= 0x09 && b0 <= 0x0d)
      if (leadingWs) {
        val out = new Array[Long](cnt + 1)
        out(0) = emptyHash
        System.arraycopy(wh, 0, out, 1, cnt)
        out
      } else java.util.Arrays.copyOf(wh, cnt)
    }
  }

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
