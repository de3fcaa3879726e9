package graft.inet

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** `inet_sort_key`: ORDER BY on the 16-byte v6-mapped key must equal
  * NUMERIC address order — the reference's INET-typed sort
  * (zeek_reader.cpp:144-154 makes addr a DuckDB INET column, whose sort
  * puts "10.0.0.9" before "10.0.0.10"; plain StringType sorts the other
  * way round). */
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

  test("v4 key is the v6-mapped form (::ffff:a.b.c.d)") {
    assert(java.util.Arrays.equals(keyOf("1.2.3.4"), keyOf("::ffff:1.2.3.4")))
    val k = keyOf("255.254.253.252")
    assert(k.length == 16)
    assert(k.take(10).forall(_ == 0) && (k(10) & 0xff) == 0xff && (k(11) & 0xff) == 0xff)
    assert((k(12) & 0xff, k(13) & 0xff, k(14) & 0xff, k(15) & 0xff) == ((255, 254, 253, 252)))
  }

  test("v6 keys are the raw 16 bytes; invalid addresses are NULL") {
    assert(java.util.Arrays.equals(keyOf("::1"),
      Array.fill[Byte](15)(0) :+ 1.toByte))
    assert(keyOf("not an ip") == null)
    assert(keyOf("10.0.0.300") == null)
    // SQL registration: NULL propagates, invalid returns NULL
    InetFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT inet_sort_key('2001:db8::1') AS a, inet_sort_key('junk') AS b, " +
        "inet_sort_key(CAST(NULL AS STRING)) AS c").collect().head
    assert(r.getAs[Array[Byte]]("a")(0) == 0x20.toByte)
    assert(r.isNullAt(1) && r.isNullAt(2))
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
    // numeric v4 order first (v6-mapped block is above ::1, below 2001:),
    // i.e. ::1 < v4 block < 2001:db8::2
    assert(got == Seq("::1", "8.8.8.8", "10.0.0.9", "10.0.0.10", "10.0.0.100",
      "192.168.0.2", "2001:db8::2"), s"got $got")
  }
}
