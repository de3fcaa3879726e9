package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** The KMV distinct sketch's distributed-aggregate contract: the result
  * must be INVARIANT to partitioning (partial/merge order), exact below
  * saturation, and accurate above it. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def estimate(df: org.apache.spark.sql.DataFrame, k: Int): Double = {
    KmvSketch.registerAll(spark)
    df.agg(call_function("kmv_distinct", col("v"), lit(k)).as("e"))
      .collect()(0).getDouble(0)
  }

  test("exact below saturation, partition-invariant always") {
    import spark.implicits._
    val small = (1 to 40).map(i => s"val$i").toDF("v")
    assert(estimate(small, 64) == 40.0) // |set| < k → the sketch IS the count
    val big = (1 to 5000).map(i => s"value-$i").toDF("v")
    val e1 = estimate(big.repartition(1), 128)
    val e7 = estimate(big.repartition(7), 128)
    val e32 = estimate(big.repartition(32), 128)
    assert(e1 == e7 && e7 == e32, s"partitioning changed the sketch: $e1 $e7 $e32")
  }

  test("estimation accuracy ~ 1/sqrt(k) on 5000 distinct values") {
    import spark.implicits._
    val big = (1 to 5000).map(i => s"value-$i").toDF("v")
    val est = estimate(big, 128)
    assert(math.abs(est - 5000) / 5000.0 < 0.3, s"estimate $est too far from 5000")
    // duplicates must not inflate the estimate (hash-set semantics)
    val dup = big.union(big).union(big)
    assert(estimate(dup, 128) == est)
  }

  test("kmv_sample: partition-invariant, duplicate-insensitive, draw-ordered") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    val df = (1 to 1000).map(i => s"doc-$i").toDF("v")
    def sample(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.agg(call_function("kmv_sample", col("v"), lit(10)).as("s"))
        .collect()(0).getSeq[String](0)
    val s1 = sample(df.repartition(1))
    val s9 = sample(df.repartition(9))
    assert(s1 == s9, s"partitioning changed the sample: $s1 vs $s9")
    assert(s1.size == 10 && s1.distinct.size == 10)
    assert(sample(df.union(df)) == s1) // duplicates cannot re-draw
  }

  test("null inputs are ignored, not hashed") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    assert(estimate(df, 8) == 2.0)
  }
}
