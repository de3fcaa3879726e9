package graft.inet

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{BinaryType, BooleanType, StringType}
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

  /** 16-byte v6-mapped sort key: `ORDER BY inet_sort_key(addr)` gives
    * NUMERIC address order — the reference's INET-typed sort (DuckDB
    * `inet` columns order "10.0.0.9" before "10.0.0.10"; our StringType
    * addresses order lexically without this). IPv4 maps into the
    * `::ffff:a.b.c.d` block so one unsigned byte-wise compare covers
    * both families; Spark's BinaryType comparator IS unsigned
    * lexicographic, so the key needs no companion ordering. Invalid
    * addresses → NULL (sorts first under NULLS FIRST, like any NULL). */
  def sortKey(s: UTF8String): Array[Byte] =
    InetFunctions.parse(s.toString) match {
      case Some(b) if b.length == 16 => b
      case Some(b) if b.length == 4 =>
        val out = new Array[Byte](16)
        out(10) = 0xff.toByte; out(11) = 0xff.toByte
        System.arraycopy(b, 0, out, 12, 4)
        out
      case _ => null
    }
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

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "inet_normalize" -> normalize _,
    "inet_contains" -> contains _,
    "is_ipv4" -> isIpv4 _,
    "is_ipv6" -> isIpv6 _,
    "inet_equal" -> inetEqual _,
    "inet_sort_key" -> sortKey _)
}
