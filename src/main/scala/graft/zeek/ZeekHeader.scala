package graft.zeek

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets

/** Error raised for malformed Zeek logs / schema mismatches. Message
  * fragments intentionally mirror the reference extension's errors
  * (reference: test/sql/zeek.test:226-242 greps on substrings). */
class ZeekFormatException(msg: String) extends RuntimeException(msg)

/** Parsed Zeek log header: lexical syntax + column names/types.
  *
  * Zeek TSV logs are self-describing: `#`-prefixed directive lines carry
  * the separator characters, NULL markers, and the `#fields`/`#types`
  * schema (reference: src/zeek_reader.cpp:50-118, README.md:139-154).
  */
final case class ZeekHeader(
    separator: Char,
    setSeparator: String,
    emptyField: String,
    unsetField: String,
    path: Option[String],
    open: Option[String],
    fields: IndexedSeq[String],
    types: IndexedSeq[String]) {

  /** Strict-mode schema identity: field names in order, types in order,
    * and the four lexical-syntax settings; `#path`/`#open` deliberately
    * ignored (reference: src/zeek_reader.cpp:165-205). Returns a
    * human-readable description of the first difference, or None. */
  def diff(other: ZeekHeader): Option[String] = {
    if (fields.length != other.fields.length)
      Some(s"different field count (${fields.length} vs ${other.fields.length})")
    else if (separator != other.separator) Some("different separator")
    else if (setSeparator != other.setSeparator) Some("different set_separator")
    else if (emptyField != other.emptyField) Some("different empty_field")
    else if (unsetField != other.unsetField) Some("different unset_field")
    else {
      var i = 0
      while (i < fields.length) {
        if (fields(i) != other.fields(i))
          return Some(s"field $i differs ('${fields(i)}' vs '${other.fields(i)}')")
        if (types(i) != other.types(i))
          return Some(s"type for field '${fields(i)}' differs ('${types(i)}' vs '${other.types(i)}')")
        i += 1
      }
      None
    }
  }
}

object ZeekHeader {
  val Default: ZeekHeader = ZeekHeader('\t', ",", "(empty)", "-", None, None,
    Vector.empty, Vector.empty)

  /** Decode a separator directive value: `\xNN` hex escapes plus `\t`,
    * `\n`, `\\`; the first decoded character is used (reference:
    * src/zeek_reader.cpp:7-31). */
  def unescapeSeparator(s: String): Char = {
    if (s.isEmpty) return '\t'
    if (s.charAt(0) != '\\' || s.length == 1) return s.charAt(0)
    s.charAt(1) match {
      case 'x' | 'X' if s.length >= 4 =>
        try Integer.parseInt(s.substring(2, 4), 16).toChar
        catch { case _: NumberFormatException => s.charAt(0) }
      case 't'  => '\t'
      case 'n'  => '\n'
      case '\\' => '\\'
      case c    => c
    }
  }

  /** Result of consuming the header region of a stream: the header plus
    * the first data line (already read while probing for the end of the
    * directives), if any. */
  final case class ParseResult(header: ZeekHeader, pendingLine: Option[String])

  /** Incremental header parser: feed lines with `offer` until it returns
    * false (first data line — NOT consumed into the header); then call
    * `build()`. Unknown directives are ignored
    * (reference: src/zeek_reader.cpp:50-118). */
  final class Builder {
    private var h = Default

    /** Returns true while the line belongs to the header region. */
    def offer(line0: String): Boolean = {
      val line = if (line0.nonEmpty && line0.last == '\r') line0.dropRight(1) else line0
      if (line.isEmpty) return true // blank lines before data: skip
      if (line.charAt(0) != '#') return false
      if (line.startsWith("#separator")) {
        // the separator directive is itself delimited by a single space,
        // since the real separator is not yet known (drop exactly one so a
        // literal-space separator survives)
        val v = line.substring("#separator".length).stripPrefix(" ")
        h = h.copy(separator = unescapeSeparator(v))
      } else {
        val parts = splitOn(line, h.separator)
        val directive = parts.head
        def value: String = if (parts.length > 1) parts(1) else ""
        directive match {
          case "#set_separator" => h = h.copy(setSeparator = value)
          case "#empty_field"   => h = h.copy(emptyField = value)
          case "#unset_field"   => h = h.copy(unsetField = value)
          case "#path"          => h = h.copy(path = Some(value))
          case "#open"          => h = h.copy(open = Some(value))
          case "#fields"        => h = h.copy(fields = parts.tail.toVector)
          case "#types"         => h = h.copy(types = parts.tail.toVector)
          case _                => // #close, unknown: ignore
        }
      }
      true
    }

    /** Throws ZeekFormatException if `#fields`/`#types` are missing or
      * their counts mismatch — which also covers non-Zeek input (e.g. a
      * fake gzip payload or an empty file). */
    def build(): ZeekHeader = {
      if (h.fields.isEmpty)
        throw new ZeekFormatException("not a valid Zeek log file: missing #fields directive")
      if (h.types.isEmpty)
        throw new ZeekFormatException("not a valid Zeek log file: missing #types directive")
      if (h.fields.length != h.types.length)
        throw new ZeekFormatException(
          s"invalid Zeek header: #fields has ${h.fields.length} entries but #types has ${h.types.length}")
      h
    }
  }

  /** Parse header + pending first data line from an iterator of lines. */
  def parse(lines: Iterator[String]): ParseResult = {
    val b = new Builder
    var pending: Option[String] = None
    while (pending.isEmpty && lines.hasNext) {
      val l = lines.next()
      if (!b.offer(l)) pending = Some(if (l.nonEmpty && l.last == '\r') l.dropRight(1) else l)
    }
    ParseResult(b.build(), pending)
  }

  /** Parse just the header from an InputStream (used at schema-inference
    * time, where the data rows are not needed). */
  def parseHeaderOnly(in: InputStream): ZeekHeader = {
    val br = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8), 64 * 1024)
    val it = new Iterator[String] {
      private var nextLine: String = br.readLine()
      def hasNext: Boolean = nextLine != null
      def next(): String = { val l = nextLine; nextLine = br.readLine(); l }
    }
    parse(it).header
  }

  private def splitOn(s: String, sep: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }
}
