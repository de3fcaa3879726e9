package graft.inet

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String-typed entry points for the inet library, invoked from
  * generated code. Catalyst's `StaticInvoke` calls these directly inside
  * whole-stage codegen — no ScalaUDF wrapper, no closure serialization,
  * no extra row-encoder boxing. Null inputs never reach these methods
  * (`propagateNull = true`); a null RETURN means "invalid input" and is
  * declared via `returnNullable = true`. */
object InetRuntime {
  def normalize(s: UTF8String): UTF8String = {
    val r = InetFunctions.normalize(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def contains(cidr: UTF8String, addr: UTF8String): java.lang.Boolean =
    InetFunctions.contains(cidr.toString, addr.toString)
  def isIpv4(s: UTF8String): java.lang.Boolean = InetFunctions.isIpv4(s.toString)
  def isIpv6(s: UTF8String): java.lang.Boolean = InetFunctions.isIpv6(s.toString)
  def inetEqual(a: UTF8String, b: UTF8String): java.lang.Boolean =
    InetFunctions.inetEqual(a.toString, b.toString)

  /** 17-byte family-tagged sort key: `ORDER BY inet_sort_key(addr)`
    * gives the reference's INET-typed order (DuckDB's `inet` extension
    * follows Postgres semantics: compare FAMILY first — every IPv4
    * before every IPv6 — then the address numerically, so "10.0.0.9"
    * sorts before "10.0.0.10" and both before "::1"; our StringType
    * addresses order lexically without this). Layout: 1 family byte
    * (0x00 = v4, 0x01 = v6, textual family — "::ffff:1.2.3.4" is v6)
    * followed by the 16 address bytes (v4 placed in the `::ffff:` block
    * for a uniform within-family compare). Spark's BinaryType comparator
    * IS unsigned lexicographic, so the key needs no companion ordering.
    * Invalid addresses → NULL (sorts first under NULLS FIRST). */
  def sortKey(s: UTF8String): Array[Byte] = {
    val str = s.toString
    InetFunctions.parse(str) match {
      case Some(b) if b.length == 16 =>
        val out = new Array[Byte](17)
        out(0) = 0x01.toByte
        System.arraycopy(b, 0, out, 1, 16)
        out
      case Some(b) => // 4 bytes
        val out = new Array[Byte](17)
        out(11) = 0xff.toByte; out(12) = 0xff.toByte
        System.arraycopy(b, 0, out, 13, 4)
        out
      case _ => null
    }
  }

  def host(s: UTF8String): UTF8String = {
    val r = InetFunctions.host(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def family(s: UTF8String): java.lang.Integer = InetFunctions.family(s.toString)
  def masklen(s: UTF8String): java.lang.Integer = InetFunctions.masklen(s.toString)
  def netmask(s: UTF8String): UTF8String = {
    val r = InetFunctions.netmask(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def broadcastAddr(s: UTF8String): UTF8String = {
    val r = InetFunctions.broadcastAddr(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def setMasklen(s: UTF8String, bits: Int): UTF8String = {
    val r = InetFunctions.setMasklen(s.toString, bits)
    if (r == null) null else UTF8String.fromString(r)
  }
  def addrBucket(s: UTF8String, bits: Int): java.lang.Integer =
    InetOps.addrBucket(s.toString, bits) match {
      case Some(b) => java.lang.Integer.valueOf(b)
      case None    => null
    }
  def cidrBuckets(s: UTF8String, bits: Int): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(InetOps.cidrBuckets(s.toString, bits).toArray)
}

/** Expression builders for the inet function family (codegen-native via
  * [[StaticInvoke]]). Registered per-session by
  * [[InetFunctions.registerAll]] and cluster-wide by
  * [[graft.GraftExtensions]]. */
object InetExpressions {

  private def invoke(method: String, dt: org.apache.spark.sql.types.DataType,
      args: Seq[Expression]): Expression =
    StaticInvoke(InetRuntime.getClass, dt, method, args,
      inputTypes = args.map(_ => StringType),
      propagateNull = true, returnNullable = true)

  def normalize(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_normalize requires 1 argument, got ${es.length}")
    invoke("normalize", StringType, es)
  }
  def contains(es: Seq[Expression]): Expression = {
    require(es.length == 2, s"inet_contains requires 2 arguments, got ${es.length}")
    invoke("contains", BooleanType, es)
  }
  def isIpv4(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"is_ipv4 requires 1 argument, got ${es.length}")
    invoke("isIpv4", BooleanType, es)
  }
  def isIpv6(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"is_ipv6 requires 1 argument, got ${es.length}")
    invoke("isIpv6", BooleanType, es)
  }
  def inetEqual(es: Seq[Expression]): Expression = {
    require(es.length == 2, s"inet_equal requires 2 arguments, got ${es.length}")
    invoke("inetEqual", BooleanType, es)
  }
  def sortKey(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_sort_key requires 1 argument, got ${es.length}")
    invoke("sortKey", BinaryType, es)
  }
  def host(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_host requires 1 argument, got ${es.length}")
    invoke("host", StringType, es)
  }
  def family(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_family requires 1 argument, got ${es.length}")
    invoke("family", IntegerType, es)
  }
  def masklen(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_masklen requires 1 argument, got ${es.length}")
    invoke("masklen", IntegerType, es)
  }
  def netmask(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_netmask requires 1 argument, got ${es.length}")
    invoke("netmask", StringType, es)
  }
  def broadcastAddr(es: Seq[Expression]): Expression = {
    require(es.length == 1, s"inet_broadcast requires 1 argument, got ${es.length}")
    invoke("broadcastAddr", StringType, es)
  }
  def setMasklen(es: Seq[Expression]): Expression = {
    require(es.length == 2, s"inet_set_masklen requires 2 arguments, got ${es.length}")
    StaticInvoke(InetRuntime.getClass, StringType, "setMasklen", es,
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true)
  }

  /** Bucket key of one address for [[InetOps]]' bucketed CIDR equi-joins
    * — codegen-native like the rest of the family (these two replaced the
    * ScalaUDFs that were the inet module's last interpreted hops). Not in
    * [[all]]: the bucket layout is the join's private contract, not a
    * user-facing SQL function. */
  def addrBucket(addr: Expression, bits: Int): Expression =
    StaticInvoke(InetRuntime.getClass, IntegerType, "addrBucket",
      Seq(addr, Literal(bits)), inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true)

  /** Every bucket a CIDR spans (empty for unparseable; NULL propagates) —
    * see [[addrBucket]]. */
  def cidrBuckets(cidr: Expression, bits: Int): Expression =
    StaticInvoke(InetRuntime.getClass, ArrayType(IntegerType, containsNull = false),
      "cidrBuckets", Seq(cidr, Literal(bits)),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true, returnNullable = true)

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "inet_normalize" -> normalize _,
    "inet_contains" -> contains _,
    "is_ipv4" -> isIpv4 _,
    "is_ipv6" -> isIpv6 _,
    "inet_equal" -> inetEqual _,
    "inet_sort_key" -> sortKey _,
    "inet_host" -> host _,
    "inet_family" -> family _,
    "inet_masklen" -> masklen _,
    "inet_netmask" -> netmask _,
    "inet_broadcast" -> broadcastAddr _,
    "inet_set_masklen" -> setMasklen _)
}
