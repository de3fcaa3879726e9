package graft.inet

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** IP-address function library.
  *
  * Spark has no INET type; Zeek `addr`/`subnet` columns are strings
  * (SURVEY.md §1.4 decision). This library supplies the semantics the
  * reference gets from DuckDB's `inet` extension (reference README.md:
  * 86-99): address normalization so textual variants compare equal,
  * CIDR containment (`<<=`), and family predicates — v4 and v6.
  *
  * Parsing is hand-rolled (no DNS lookups — java.net.InetAddress.getByName
  * resolves hostnames, which a query engine must never do).
  */
object InetFunctions {

  /** Parse an IPv4 or IPv6 literal into 4 or 16 bytes; None if invalid. */
  def parse(s: String): Option[Array[Byte]] =
    if (s == null || s.isEmpty) None
    else if (s.indexOf(':') >= 0) parseV6(s)
    else parseV4(s)

  def parseV4(s: String): Option[Array[Byte]] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      val v = p.toInt
      if (v > 255) return None
      // reject leading zeros like "01" (ambiguous octal in many parsers)
      if (p.length > 1 && p.charAt(0) == '0') return None
      out(i) = v.toByte
      i += 1
    }
    Some(out)
  }

  def parseV6(s: String): Option[Array[Byte]] = {
    // split on "::" (at most one allowed)
    val dcIdx = s.indexOf("::")
    if (dcIdx >= 0 && s.indexOf("::", dcIdx + 1) >= 0) return None
    val (headStr, tailStr) =
      if (dcIdx >= 0) (s.substring(0, dcIdx), s.substring(dcIdx + 2)) else (s, "")

    def groups(part: String): Option[Vector[Int]] = {
      if (part.isEmpty) return Some(Vector.empty)
      val toks = part.split(":", -1)
      if (toks.exists(_.isEmpty)) return None
      var acc = Vector.empty[Int]
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.contains('.')) {
          // embedded IPv4, must be last
          if (i != toks.length - 1) return None
          parseV4(t) match {
            case Some(b4) =>
              acc = acc :+ (((b4(0) & 0xff) << 8) | (b4(1) & 0xff)) :+ (((b4(2) & 0xff) << 8) | (b4(3) & 0xff))
            case None => return None
          }
        } else {
          if (t.length > 4 || !t.forall(c => Character.digit(c, 16) >= 0)) return None
          acc = acc :+ Integer.parseInt(t, 16)
        }
        i += 1
      }
      Some(acc)
    }

    for {
      h <- groups(headStr)
      t <- groups(tailStr)
      if (dcIdx >= 0 && h.length + t.length <= 7) || (dcIdx < 0 && h.length + t.length == 8 && t.isEmpty)
    } yield {
      val full = h ++ Vector.fill(8 - h.length - t.length)(0) ++ t
      val out = new Array[Byte](16)
      var i = 0
      while (i < 8) {
        out(2 * i) = (full(i) >> 8).toByte
        out(2 * i + 1) = full(i).toByte
        i += 1
      }
      out
    }
  }

  /** Canonical text form: v4 dotted-quad; v6 per RFC 5952 (lowercase hex,
    * longest zero run ≥2 compressed, leftmost wins). */
  def normalize(s: String): String = parse(s).map(render).orNull

  def render(b: Array[Byte]): String = {
    if (b.length == 4) {
      s"${b(0) & 0xff}.${b(1) & 0xff}.${b(2) & 0xff}.${b(3) & 0xff}"
    } else {
      val g = new Array[Int](8)
      var i = 0
      while (i < 8) { g(i) = ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff); i += 1 }
      // find longest zero run of length >= 2
      var bestStart = -1; var bestLen = 0; var curStart = -1; var curLen = 0
      i = 0
      while (i < 8) {
        if (g(i) == 0) {
          if (curStart < 0) { curStart = i; curLen = 1 } else curLen += 1
          if (curLen > bestLen && curLen >= 2) { bestStart = curStart; bestLen = curLen }
        } else { curStart = -1; curLen = 0 }
        i += 1
      }
      val sb = new StringBuilder
      i = 0
      while (i < 8) {
        if (i == bestStart) {
          sb.append("::")
          i += bestLen
        } else {
          if (sb.nonEmpty && sb.last != ':') sb.append(':')
          sb.append(Integer.toHexString(g(i)))
          i += 1
        }
      }
      if (sb.isEmpty) "::" else sb.toString
    }
  }

  /** CIDR containment: does `addr` fall within `cidr` (e.g.
    * "10.0.0.0/8", "2001:db8::/32")? Mixed families → false. A bare
    * address as `cidr` means a full-length prefix. */
  def contains(cidr: String, addr: String): java.lang.Boolean = {
    if (cidr == null || addr == null) return null
    val slash = cidr.lastIndexOf('/')
    val (net, lenStr) =
      if (slash >= 0) (cidr.substring(0, slash), cidr.substring(slash + 1)) else (cidr, "")
    (parse(net), parse(addr)) match {
      case (Some(nb), Some(ab)) if nb.length == ab.length =>
        val maxBits = nb.length * 8
        val bits =
          if (slash < 0) maxBits
          else if (lenStr.forall(_.isDigit) && lenStr.nonEmpty) lenStr.toInt
          else return null
        if (bits < 0 || bits > maxBits) return null
        java.lang.Boolean.valueOf(prefixMatches(nb, ab, bits))
      case (Some(_), Some(_)) => java.lang.Boolean.FALSE // v4 vs v6
      case _ => null
    }
  }

  private def prefixMatches(net: Array[Byte], addr: Array[Byte], bits: Int): Boolean = {
    var full = bits / 8
    var i = 0
    while (i < full) {
      if (net(i) != addr(i)) return false
      i += 1
    }
    val rem = bits % 8
    if (rem == 0) true
    else {
      val mask = (0xff << (8 - rem)) & 0xff
      ((net(full) & mask)) == ((addr(full) & mask))
    }
  }

  def isIpv4(s: String): java.lang.Boolean =
    if (s == null) null else java.lang.Boolean.valueOf(parseV4(s).isDefined)

  def isIpv6(s: String): java.lang.Boolean =
    if (s == null) null else java.lang.Boolean.valueOf(parseV6(s).isDefined)

  /** Parse an address or CIDR literal into (address bytes, prefix bits).
    * A bare address means a full-length prefix (32 / 128), matching
    * Postgres/DuckDB `masklen` defaults. */
  private def splitCidr(s: String): Option[(Array[Byte], Int)] = {
    if (s == null) return None
    val slash = s.lastIndexOf('/')
    val (net, lenStr) =
      if (slash >= 0) (s.substring(0, slash), s.substring(slash + 1)) else (s, "")
    parse(net).flatMap { b =>
      val maxBits = b.length * 8
      if (slash < 0) Some((b, maxBits))
      else if (lenStr.nonEmpty && lenStr.length <= 3 && lenStr.forall(_.isDigit)) {
        val bits = lenStr.toInt
        if (bits <= maxBits) Some((b, bits)) else None
      } else None
    }
  }

  /** The address part of an address or CIDR, canonical text, no mask —
    * DuckDB/Postgres `host('192.168.1.5/24')` = `'192.168.1.5'`. */
  def host(s: String): String =
    splitCidr(s).map { case (b, _) => render(b) }.orNull

  /** Address family: 4 or 6 (textual family — "::ffff:1.2.3.4" is 6). */
  def family(s: String): java.lang.Integer =
    splitCidr(s).map { case (b, _) =>
      Integer.valueOf(if (b.length == 4) 4 else 6)
    }.orNull

  /** Prefix length of a CIDR; full length (32 / 128) for a bare address. */
  def masklen(s: String): java.lang.Integer =
    splitCidr(s).map { case (_, bits) => Integer.valueOf(bits) }.orNull

  /** Canonical text with an explicit prefix unless it is full-length —
    * Postgres/DuckDB `inet` output form ("1.2.3.4/24" but "1.2.3.4",
    * never "1.2.3.4/32"). */
  private def renderCidr(b: Array[Byte], bits: Int): String =
    if (bits == b.length * 8) render(b) else render(b) + "/" + bits

  /** The network mask of the prefix as an address — Postgres
    * `netmask('192.168.1.5/24')` = `'255.255.255.0'` (a full-length
    * inet: no suffix on the result). v6 analogously
    * (`'…/64'` → `'ffff:ffff:ffff:ffff::'`). */
  def netmask(s: String): String =
    splitCidr(s).map { case (b, bits) =>
      val m = new Array[Byte](b.length)
      var i = 0
      var rem = bits
      while (i < m.length) {
        m(i) = (if (rem >= 8) 0xff
                else if (rem <= 0) 0x00
                else (0xff << (8 - rem)) & 0xff).toByte
        rem -= 8; i += 1
      }
      render(m)
    }.orNull

  /** Host bits set to 1, prefix kept — Postgres
    * `broadcast('192.168.1.5/24')` = `'192.168.1.255/24'`; a bare
    * address (full-length prefix) is its own broadcast. */
  def broadcastAddr(s: String): String =
    splitCidr(s).map { case (b, bits) =>
      val out = b.clone()
      var i = 0
      var rem = bits
      while (i < out.length) {
        if (rem <= 0) out(i) = 0xff.toByte
        else if (rem < 8) out(i) = (out(i) | (0xff >>> rem)).toByte
        rem -= 8; i += 1
      }
      renderCidr(out, bits)
    }.orNull

  /** Replace the prefix length, address bits unchanged — Postgres inet
    * `set_masklen('192.168.1.5/24', 16)` = `'192.168.1.5/16'`. NULL on
    * an out-of-range length for the address family. */
  def setMasklen(s: String, bits: Int): String =
    splitCidr(s) match {
      case Some((b, _)) if bits >= 0 && bits <= b.length * 8 => renderCidr(b, bits)
      case _ => null
    }

  /** Equality under normalization (the reference's `addr = '...'::inet`). */
  def inetEqual(a: String, b: String): java.lang.Boolean = {
    if (a == null || b == null) return null
    (parse(a), parse(b)) match {
      case (Some(x), Some(y)) => java.lang.Boolean.valueOf(java.util.Arrays.equals(x, y))
      case _ => null
    }
  }

  // ---- Spark registration ---------------------------------------------

  // Column API backed by the SAME codegen-native StaticInvoke
  // expressions as the SQL registrations (one path, not two — the
  // ScalaUDF wrappers this replaced predated InetExpressions; retiring
  // them also lets [[graft.plans.InetContainsPrefixRule]] match ONE
  // expression shape). No SparkSession needed: the expression is built
  // directly, no function-registry round-trip.
  private def inv(build: Seq[Expression] => Expression, cs: Column*): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      build(cs.map(org.apache.spark.sql.graft.GraftSql.expression)))

  def inet_normalize(c: Column): Column = inv(InetExpressions.normalize, c)
  def inet_contains(cidr: Column, addr: Column): Column =
    inv(InetExpressions.contains, cidr, addr)
  def is_ipv4(c: Column): Column = inv(InetExpressions.isIpv4, c)
  def is_ipv6(c: Column): Column = inv(InetExpressions.isIpv6, c)
  def inet_equal(a: Column, b: Column): Column = inv(InetExpressions.inetEqual, a, b)

  /** Column form of the codegen-native `inet_sort_key` (see
    * [[InetExpressions.sortKey]]): registers the SQL function on the
    * column's session and calls it, so the plan carries the
    * StaticInvoke expression, not a ScalaUDF. */
  def inet_sort_key(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_sort_key", c)
  }
  def inet_host(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_host", c)
  }
  def inet_family(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_family", c)
  }
  def inet_masklen(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_masklen", c)
  }
  def inet_netmask(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_netmask", c)
  }
  def inet_broadcast(spark: SparkSession, c: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_broadcast", c)
  }
  def inet_set_masklen(spark: SparkSession, c: Column, bits: Column): Column = {
    registerAll(spark)
    org.apache.spark.sql.functions.call_function("inet_set_masklen", c, bits)
  }

  /** Register SQL-callable versions: inet_normalize, inet_contains,
    * is_ipv4, is_ipv6, inet_equal — backed by codegen-native
    * [[InetExpressions]] (StaticInvoke), not ScalaUDF wrappers. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    InetExpressions.all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
