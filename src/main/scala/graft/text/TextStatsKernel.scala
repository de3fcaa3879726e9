package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-statistics kernel, called from generated code by
  * [[graft.functions.TextStats]]. One scan over the UTF-8 bytes computes
  * what the composable form needed four passes and two word-array
  * allocations for (`split` twice, `regexp_count`, `length`).
  *
  * Semantics are pinned to the split-based originals (property-tested in
  * `TextStatsSpec`):
  *
  *   - `n_tokens`  = `size(split(text, "\\s+"))` — i.e. the number of
  *     `\s+` separator runs plus one. Java's `\s` (no UNICODE flag) is
  *     exactly `[ \t\n\x0B\f\r]`, all ASCII, so a byte-level scan is
  *     correct on any UTF-8 input (continuation/lead bytes are >= 0x80
  *     and never match). Leading/trailing whitespace contributes the
  *     same empty boundary fields `split` keeps under its default
  *     limit of -1.
  *   - `stop_cnt`  = number of fields that equal a stopword (byte
  *     equality; empty boundary fields match nothing).
  *   - `punct_cnt` = `regexp_count(text, "[.,;:!?]")`.
  */
object TextStatsKernel {

  private def isStop(s: UTF8String, st: Int, en: Int, stops: Array[Array[Byte]]): Boolean = {
    val len = en - st
    var k = 0
    while (k < stops.length) {
      val w = stops(k)
      if (w.length == len) {
        var j = 0
        while (j < len && s.getByte(st + j) == w(j)) j += 1
        if (j == len) return true
      }
      k += 1
    }
    false
  }

  /** Returns struct(n_tokens int, stop_cnt int, punct_cnt int). */
  def stats(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val n = s.numBytes()
    var wsRuns = 0
    var stopCnt = 0
    var punctCnt = 0
    var inWs = false
    var tokStart = 0
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      // \s without UNICODE_CHARACTER_CLASS: space or 0x09..0x0D
      val ws = c == ' ' || (c >= 0x09 && c <= 0x0d)
      if (ws) {
        if (!inWs) {
          wsRuns += 1
          if (i > tokStart && isStop(s, tokStart, i, stops)) stopCnt += 1
          inWs = true
        }
      } else {
        if (inWs) { tokStart = i; inWs = false }
        if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punctCnt += 1
      }
      i += 1
    }
    if (!inWs && n > tokStart && isStop(s, tokStart, n, stops)) stopCnt += 1
    new GenericInternalRow(Array[Any](wsRuns + 1, stopCnt, punctCnt))
  }

  private val Und = UTF8String.fromString("und")

  /** Canonical form for content fingerprinting: every `\s+` run becomes
    * one space (byte-level — Java `\s` is all-ASCII, so multi-byte
    * codepoints pass through untouched), then Spark's own
    * `UTF8String.toLowerCase` (the exact function behind `lower()`, so
    * case semantics are identical to the `lower(regexp_replace(...))`
    * composition this replaces — minus the regex engine and one copy). */
  def canonicalText(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var inWs = false
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      val ws = c == ' ' || (c >= 0x09 && c <= 0x0d)
      if (ws) {
        if (!inWs) { out(o) = ' '; o += 1; inWs = true }
      } else {
        out(o) = c; o += 1; inWs = false
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o).toLowerCase
  }

  /** Per-token marker-group hits, ASCII-case-folded. Matches the
    * `lower(text)` + split + per-group set-membership formulation for
    * ASCII marker words: lowercasing can only map a non-ASCII codepoint
    * into ASCII for two pathological chars (Kelvin sign → k, Angstrom →
    * å), which no marker list contains as a byte suffix at the same
    * byte length — and DuckDB's `lower`, the oracle side, does not map
    * them either. */
  private def addHits(s: UTF8String, st: Int, en: Int,
      groups: Array[Array[Array[Byte]]], counts: Array[Int]): Unit = {
    val len = en - st
    var g = 0
    while (g < groups.length) {
      val ms = groups(g)
      var k = 0
      var hit = false
      while (!hit && k < ms.length) {
        val w = ms(k)
        if (w.length == len) {
          var j = 0
          var ok = true
          while (ok && j < len) {
            var b = s.getByte(st + j)
            if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
            if (b != w(j)) ok = false else j += 1
          }
          if (ok) hit = true
        }
        k += 1
      }
      if (hit) counts(g) += 1
      g += 1
    }
  }

  /** One-pass language profile: per-group marker-hit counts plus the
    * argmax guess (first group in declaration order wins ties; all-zero
    * scores → "und"). Returns struct(_1..(_N) int, _(N+1) string) —
    * the same shape as the tuple-returning UDF it replaces. */
  def langProfile(s: UTF8String, groups: Array[Array[Array[Byte]]],
      names: Array[UTF8String]): InternalRow = {
    val counts = new Array[Int](groups.length)
    val n = s.numBytes()
    var inWs = false
    var tokStart = 0
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      val ws = c == ' ' || (c >= 0x09 && c <= 0x0d)
      if (ws) {
        if (!inWs) {
          if (i > tokStart) addHits(s, tokStart, i, groups, counts)
          inWs = true
        }
      } else if (inWs) { tokStart = i; inWs = false }
      i += 1
    }
    if (!inWs && n > tokStart) addHits(s, tokStart, n, groups, counts)
    var mx = 0
    var g = 0
    while (g < counts.length) { if (counts(g) > mx) mx = counts(g); g += 1 }
    val guess =
      if (mx <= 0) Und
      else { var j = 0; while (counts(j) != mx) j += 1; names(j) }
    val out = new Array[Any](counts.length + 1)
    g = 0
    while (g < counts.length) { out(g) = counts(g); g += 1 }
    out(counts.length) = guess
    new GenericInternalRow(out)
  }
}
