package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** cms_estimate: the probe must reproduce CountMinSketchAgg's own adds
  * (long path for integrals, UTF-8 bytes for strings) and respect the
  * CMS error contract: exact <= estimate <= exact + eps * N. */
class SketchExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("integral keys: estimates bounded below by exact, above by eps*N") {
    import spark.implicits._
    SketchExpressions.registerAll(spark)
    // deliberately overloaded sketch: 10k distinct keys vs width ~366
    // (eps=0.01) forces collisions, exercising the upper bound
    val df = spark.range(100000).select((col("id") % 10000).as("k")).cache()
    val sk = df.agg(expr("count_min_sketch(k, 0.01d, 0.9d, 42)").as("sk"))
    val n = 100000L
    val rows = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("k"), col("exact"), expr("cms_estimate(sk, k)").as("est"))
      .collect()
    assert(rows.length == 10000)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS under-estimated key ${r.getLong(0)}")
      assert(est <= exact + (0.01 * n).toLong + 1, s"error bound blown for ${r.getLong(0)}")
    }
    // at least one collision must have occurred at this load factor
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)))
    df.unpersist()
  }

  test("string keys probe through UTF-8 bytes, matching the aggregate's adds") {
    import spark.implicits._
    SketchExpressions.registerAll(spark)
    val df = Seq("alpha", "alpha", "beta", "gamma", "alpha").toDF("s")
    val sk = df.agg(expr("count_min_sketch(s, 0.001d, 0.99d, 7)").as("sk"))
    val out = df.distinct().crossJoin(broadcast(sk))
      .select(col("s"), expr("cms_estimate(sk, s)").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("alpha") == 3L && out("beta") == 1L && out("gamma") == 1L)
  }

  test("null sketch or null key yields null") {
    SketchExpressions.registerAll(spark)
    val r = spark.sql(
      "SELECT cms_estimate(CAST(NULL AS BINARY), 1L) AS a, " +
        "cms_estimate((SELECT count_min_sketch(id, 0.01d, 0.9d, 1) FROM range(10)), CAST(NULL AS BIGINT)) AS b")
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
