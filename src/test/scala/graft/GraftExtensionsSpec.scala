package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** Cluster-deployment path: `spark.sql.extensions=graft.GraftExtensions`
  * must make every expression-backed function available without any
  * per-session registerAll call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension injection exposes vector + inet functions session-wide") {
    SharedSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions is the same injection path `spark.sql.extensions`
    // triggers; the static conf itself can't be set on an already-running
    // SparkContext, which this test shares
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  inet_contains('10.0.0.0/8', '10.1.2.3') AS hit,
          |  inet_normalize('2001:0db8:0000:0000:0000:0000:0000:0001') AS n6,
          |  is_ipv4('1.2.3.4') AS v4""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
      assert(r.getBoolean(2))
      assert(r.getString(3) == "2001:db8::1")
      assert(r.getBoolean(4))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SharedSpark.spark)
      SparkSession.setActiveSession(SharedSpark.spark)
    }
  }
}
