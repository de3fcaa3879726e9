package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** LongDot: the fused codegen integer dot product must be bit-identical
  * to the aggregate(zip_with(...)) fold it replaced on the quantized
  * ANN hot paths. */
class LongDotSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("long_dot equals the higher-order fold on random long arrays") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextLong() % 100000L),
        Array.fill(64)(rnd.nextLong() % 100000L))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("fused", call_function("long_dot", col("a"), col("b")))
      .withColumn("fold",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
    assert(df.filter(col("fused") =!= col("fold")).count() == 0)
    // driver-side recompute too (covers the interpreted eval path)
    val got = df.select(col("id"), col("fused")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, a, b) =>
      val expect = a.zip(b).map { case (x, y) => x * y }.sum
      assert(got(id) == expect, s"row $id")
    }
  }

  test("long_dot: dimension mismatch is NULL; self-dot is the squared norm") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
      .select(call_function("long_dot", col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0))
    val n2 = Seq(Tuple1(Array(3L, 4L))).toDF("a")
      .select(call_function("long_dot", col("a"), col("a")).as("n2"))
      .collect().head.getLong(0)
    assert(n2 == 25L)
  }

  test("long_l2sq equals the higher-order fold and handles negatives") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextLong() % 100000L),
        Array.fill(64)(rnd.nextLong() % 100000L))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("fused", call_function("long_l2sq", col("a"), col("b")))
      .withColumn("fold",
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
    assert(df.filter(col("fused") =!= col("fold")).count() == 0)
    val one = Seq((Array(1L, -4L), Array(4L, 2L))).toDF("a", "b")
      .select(call_function("long_l2sq", col("a"), col("b"))).collect().head.getLong(0)
    assert(one == 9L + 36L)
  }

  test("long_dot: wrong element type is an analysis error, not garbage") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    val bad = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(call_function("long_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>") ||
      e.getMessage.toLowerCase.contains("long_dot"), e.getMessage)
  }
}
