package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** [[Joins.broadcastIfSmall]]: the stats-gated broadcast hint must open
  * below the session threshold, close above it (the 100× OOM guard),
  * and accept scan-level proxies for join outputs whose own estimate is
  * the useless children-size product. */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.toString.contains("ResolvedHint")

  private def withThreshold[A](bytes: Long)(f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try f finally spark.conf.set(key, old)
  }

  test("hint opens under the threshold, closes above it") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    withThreshold(10L << 20) { assert(hinted(Joins.broadcastIfSmall(orders))) }
    // the same frame with a 1-byte threshold: gate closed, frame unchanged
    withThreshold(1L) { assert(!hinted(Joins.broadcastIfSmall(orders))) }
    // threshold <= 0 disables entirely (Spark's own convention)
    withThreshold(-1L) { assert(!hinted(Joins.broadcastIfSmall(orders))) }
  }

  test("join outputs need scan proxies: the raw join estimate is a size product") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
    withThreshold(10L << 20) {
      // without proxies the optimizer's estimate is size(o)×size(c) bytes
      // — over any sane threshold even at sf0.001
      assert(!hinted(Joins.broadcastIfSmall(joined)))
      // with the FK join's inputs as proxies the sum-bound opens the gate
      assert(hinted(Joins.broadcastIfSmall(joined, o, c)))
    }
  }

  test("gated q05 plan broadcasts every SF-linear side at bench SF") {
    val q = graft.SparkEntry.queries("q05_local_supplier")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "expected map-only join chain:\n" + p.take(2000))
  }
}
