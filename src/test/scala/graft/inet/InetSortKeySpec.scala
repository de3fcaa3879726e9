package graft.inet

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** `inet_sort_key`: ORDER BY on the 17-byte family-tagged key must equal
  * the reference's INET-typed sort — zeek_reader.cpp:144-154 makes addr
  * a DuckDB INET column, whose ordering follows Postgres: FAMILY first
  * (all IPv4 before all IPv6), then numeric address order within each
  * family ("10.0.0.9" before "10.0.0.10"; plain StringType sorts the
  * other way round). */
class InetSortKeySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def keyOf(s: String): Array[Byte] =
    InetRuntime.sortKey(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("v4 keys sort numerically, not lexically") {
    val addrs = Seq("10.0.0.9", "10.0.0.10", "10.0.0.100", "10.0.0.2",
      "9.255.255.255", "10.1.0.0", "192.168.1.1", "2.3.4.5")
    import spark.implicits._
    val got = addrs.toDF("addr")
      .orderBy(InetFunctions.inet_sort_key(spark, col("addr")))
      .collect().map(_.getString(0)).toSeq
    val want = addrs.sortBy(a => a.split("\\.").map(_.toInt).toSeq)(
      Ordering.Implicits.seqOrdering[Seq, Int])
    assert(got == want, s"got $got")
    // the lexical trap really is a trap: plain string order differs
    assert(addrs.sorted != want)
  }

  test("v4 key is family byte 0x00 + the v6-mapped form") {
    val k = keyOf("255.254.253.252")
    assert(k.length == 17)
    assert(k(0) == 0x00.toByte)
    assert(k.slice(1, 11).forall(_ == 0) && (k(11) & 0xff) == 0xff && (k(12) & 0xff) == 0xff)
    assert((k(13) & 0xff, k(14) & 0xff, k(15) & 0xff, k(16) & 0xff) == ((255, 254, 253, 252)))
    // textual family decides: "::ffff:1.2.3.4" is an IPv6 LITERAL, so it
    // carries family 0x01 and sorts with v6 (Postgres semantics) — the
    // address bytes beyond the tag are identical
    assert(keyOf("::ffff:1.2.3.4")(0) == 0x01.toByte)
    assert(java.util.Arrays.equals(keyOf("1.2.3.4").drop(1), keyOf("::ffff:1.2.3.4").drop(1)))
  }

  test("v6 keys are family byte 0x01 + the raw 16 bytes; invalid is NULL") {
    assert(java.util.Arrays.equals(keyOf("::1"),
      0x01.toByte +: (Array.fill[Byte](15)(0) :+ 1.toByte)))
    assert(keyOf("not an ip") == null)
    assert(keyOf("10.0.0.300") == null)
    // SQL registration: NULL propagates, invalid returns NULL
    InetFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT inet_sort_key('2001:db8::1') AS a, inet_sort_key('junk') AS b, " +
        "inet_sort_key(CAST(NULL AS STRING)) AS c").collect().head
    assert(r.getAs[Array[Byte]]("a")(0) == 0x01.toByte)
    assert(r.getAs[Array[Byte]]("a")(1) == 0x20.toByte)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("mixed-family ORDER BY is family-first (all v4 before all v6)") {
    import spark.implicits._
    val addrs = Seq("2001:db8::1", "10.0.0.10", "::1", "192.168.0.9",
      "::ffff:1.2.3.4", "8.8.8.8", "fe80::1")
    val got = addrs.toDF("addr")
      .orderBy(InetFunctions.inet_sort_key(spark, col("addr")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("8.8.8.8", "10.0.0.10", "192.168.0.9",
      "::1", "::ffff:1.2.3.4", "2001:db8::1", "fe80::1"), s"got $got")
  }

  test("inet_host / inet_family / inet_masklen (DuckDB inet extension)") {
    InetFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT inet_host('192.168.1.5/24') AS h4, inet_masklen('192.168.1.5/24') AS m4, " +
        " inet_family('192.168.1.5/24') AS f4, inet_host('10.0.0.1') AS hbare, " +
        " inet_masklen('10.0.0.1') AS mbare, inet_host('2001:DB8::0:1/32') AS h6, " +
        " inet_masklen('2001:db8::/32') AS m6, inet_family('::1') AS f6, " +
        " inet_host('junk') AS bad, inet_masklen('10.0.0.1/33') AS badlen").collect().head
    assert(r.getString(0) == "192.168.1.5" && r.getInt(1) == 24 && r.getInt(2) == 4)
    assert(r.getString(3) == "10.0.0.1" && r.getInt(4) == 32)
    assert(r.getString(5) == "2001:db8::1" && r.getInt(6) == 32 && r.getInt(7) == 6)
    assert(r.isNullAt(8) && r.isNullAt(9))
  }

  test("inet_netmask / inet_broadcast / inet_set_masklen (Postgres inet semantics)") {
    InetFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT inet_netmask('192.168.1.5/24') AS nm4, inet_broadcast('192.168.1.5/24') AS bc4, " +
        " inet_set_masklen('192.168.1.5/24', 16) AS sm4, inet_netmask('10.0.0.1') AS nmbare, " +
        " inet_broadcast('10.1.2.3') AS bcbare, inet_netmask('2001:db8::7/64') AS nm6, " +
        " inet_broadcast('2001:db8::7/64') AS bc6, inet_set_masklen('1.2.3.4/24', 32) AS smfull, " +
        " inet_netmask('10.0.0.0/19') AS nm19, inet_broadcast('10.32.5.9/19') AS bc19, " +
        " inet_set_masklen('10.0.0.1', 33) AS smbad, inet_netmask('junk') AS bad").collect().head
    assert(r.getString(0) == "255.255.255.0" && r.getString(1) == "192.168.1.255/24")
    assert(r.getString(2) == "192.168.1.5/16")
    assert(r.getString(3) == "255.255.255.255" && r.getString(4) == "10.1.2.3")
    assert(r.getString(5) == "ffff:ffff:ffff:ffff::")
    assert(r.getString(6) == "2001:db8::ffff:ffff:ffff:ffff/64")
    assert(r.getString(7) == "1.2.3.4") // full length renders without suffix
    assert(r.getString(8) == "255.255.224.0" && r.getString(9) == "10.32.31.255/19")
    assert(r.isNullAt(10) && r.isNullAt(11))
    // Column API routes through the same StaticInvoke expressions
    import spark.implicits._
    val c = Seq("172.16.9.200/12").toDF("a").select(
      InetFunctions.inet_netmask(spark, col("a")),
      InetFunctions.inet_broadcast(spark, col("a")),
      InetFunctions.inet_set_masklen(spark, col("a"), lit(24))).collect().head
    assert(c.getString(0) == "255.240.0.0" && c.getString(1) == "172.31.255.255/12" &&
      c.getString(2) == "172.16.9.200/24")
  }

  test("ORDER BY inet_sort_key(id_orig_h) over a zeek table is numeric") {
    val dir = graft.zeek.ZeekFixtures.tempDir()
    val rows = Seq("10.0.0.10", "10.0.0.9", "10.0.0.100", "192.168.0.2",
      "8.8.8.8", "2001:db8::2", "::1")
    val content = new StringBuilder
    content.append(graft.zeek.ZeekFixtures.header("conn",
      Seq("ts", "id.orig_h"), Seq("time", "addr")))
    rows.zipWithIndex.foreach { case (ip, i) => content.append(s"$i.0\t$ip\n") }
    val p = graft.zeek.ZeekFixtures.write(dir, "conn.log", content.toString)
    val df = spark.read.format("zeek").load(p)
    val got = df.orderBy(InetFunctions.inet_sort_key(spark, col("id_orig_h")))
      .select("id_orig_h").collect().map(_.getString(0)).toSeq
    // family first (all v4 before all v6), numeric within family
    assert(got == Seq("8.8.8.8", "10.0.0.9", "10.0.0.10", "10.0.0.100",
      "192.168.0.2", "::1", "2001:db8::2"), s"got $got")
  }
}
