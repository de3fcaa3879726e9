package graft.inet

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.zeek.{SharedSpark, ZeekFixtures}

class InetFunctionsSpec extends AnyFunSuite {
  import InetFunctions._

  test("ipv4 parse/normalize") {
    assert(normalize("192.168.1.1") == "192.168.1.1")
    assert(normalize("0.0.0.0") == "0.0.0.0")
    assert(normalize("255.255.255.255") == "255.255.255.255")
    assert(normalize("256.1.1.1") == null)
    assert(normalize("1.2.3") == null)
    assert(normalize("01.2.3.4") == null) // ambiguous leading zero
    assert(normalize("") == null)
  }

  test("ipv6 parse/normalize (RFC 5952)") {
    assert(normalize("2001:0db8:0000:0000:0000:0000:0000:0001") == "2001:db8::1")
    assert(normalize("::") == "::")
    assert(normalize("::1") == "::1")
    assert(normalize("1::") == "1::")
    assert(normalize("2001:DB8::8:800:200C:417A") == "2001:db8::8:800:200c:417a")
    assert(normalize("::ffff:192.0.2.1") == "::ffff:c000:201")
    assert(normalize("1:2:3:4:5:6:7:8") == "1:2:3:4:5:6:7:8")
    assert(normalize("1:0:0:2:0:0:0:3") == "1:0:0:2::3") // longest run wins
    assert(normalize("1::2::3") == null)
    assert(normalize("1:2:3:4:5:6:7") == null)
    assert(normalize(":::") == null)
  }

  test("cidr containment v4") {
    assert(contains("10.0.0.0/8", "10.200.3.4") == true)
    assert(contains("10.0.0.0/8", "11.0.0.1") == false)
    assert(contains("192.168.10.0/24", "192.168.10.5") == true)
    assert(contains("192.168.10.0/24", "192.168.11.5") == false)
    assert(contains("192.168.10.4/31", "192.168.10.5") == true)
    assert(contains("192.168.10.4/31", "192.168.10.6") == false)
    assert(contains("0.0.0.0/0", "8.8.8.8") == true)
    assert(contains("10.1.2.3", "10.1.2.3") == true)   // bare addr = full prefix
    assert(contains("10.1.2.3", "10.1.2.4") == false)
    assert(contains("10.0.0.0/33", "10.0.0.1") == null) // invalid prefix len
  }

  test("cidr containment v6 + mixed families") {
    assert(contains("2001:db8::/32", "2001:db8:1:2::3") == true)
    assert(contains("2001:db8::/32", "2001:db9::1") == false)
    assert(contains("::/0", "fe80::1") == true)
    assert(contains("10.0.0.0/8", "2001:db8::1") == false) // mixed → false
  }

  test("family predicates + normalized equality") {
    assert(isIpv4("1.2.3.4") == true && isIpv4("::1") == false)
    assert(isIpv6("::1") == true && isIpv6("1.2.3.4") == false)
    assert(inetEqual("2001:0DB8::1", "2001:db8:0:0:0:0:0:1") == true)
    assert(inetEqual("1.2.3.4", "1.2.3.5") == false)
    assert(inetEqual("notanip", "1.2.3.4") == null)
  }

  test("SQL + DataFrame usage over a zeek table") {
    val spark = SharedSpark.spark
    val dir = ZeekFixtures.tempDir()
    val p = ZeekFixtures.write(dir, "conn.log", ZeekFixtures.connContent)
    val df = spark.read.format("zeek").load(p)
    InetFunctions.registerAll(spark)
    df.createOrReplaceTempView("conn_inet")
    // CIDR containment filter (reference README.md:91-93 `<<=`)
    val local = spark.sql(
      "SELECT uid FROM conn_inet WHERE inet_contains('192.168.0.0/16', id_orig_h) ORDER BY uid").collect()
    assert(local.map(_.getString(0)).toSeq == Seq("CAcq1P2phfnCTjZAHl", "CmFsdZ2rTGf6Ouv2R6"))
    // normalized equality across textual variants (zeek_inet.test semantics)
    val v6 = df.filter(InetFunctions.inet_equal(col("id_resp_h"), lit("2001:4860:4860:0:0:0:0:8888"))).count()
    assert(v6 == 1)
    assert(df.filter(InetFunctions.is_ipv6(col("id_resp_h"))).count() == 1)
  }

  test("SQL inet functions are codegen-native (StaticInvoke, no ScalaUDF)") {
    val spark = SharedSpark.spark
    InetFunctions.registerAll(spark)
    // non-foldable input (range), so the expression survives into the
    // physical plan instead of constant-folding to a LocalTableScan
    val df = spark.range(3).selectExpr(
      "concat('10.1.2.', CAST(id AS STRING)) AS a")
      .selectExpr("inet_contains('10.0.0.0/8', a) AS hit", "inet_normalize(a) AS n")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(1500))
    assert(plan.contains("*(1)"), "expected whole-stage codegen span:\n" + plan.take(1500))
    val r = df.collect()
    assert(r.forall(_.getBoolean(0)) && r.map(_.getString(1)).sorted.head == "10.1.2.0")
    // null propagation preserved (UDF semantics)
    assert(spark.sql("SELECT inet_contains(NULL, '1.2.3.4')").collect().head.isNullAt(0))
    assert(spark.sql("SELECT inet_normalize('not-an-ip')").collect().head.isNullAt(0))
  }
}
