package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("bucketed range join equals the nested-loop result, including boundaries") {
    import spark.implicits._
    // intervals spanning multiple buckets, negatives, zero-length, overlaps
    val intervals = Seq(
      (1L, -10.0, 10.0), (2L, 0.0, 0.0), (3L, 5.0, 125.0),
      (4L, -100.0, -50.0), (5L, 99.9, 100.1)).toDF("iid", "lo", "hi")
    val points = spark.range(-120, 130).select((col("id") * 1.0).as("price"))
    val bucketed = RangeJoin.pointInInterval(points, intervals, "price", "lo", "hi", 7.0)
      .select("iid", "price").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("price") >= col("lo") && col("price") <= col("hi"))
      .select("iid", "price").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(bucketed == naive, s"missing=${naive.diff(bucketed).take(5)} extra=${bucketed.diff(naive).take(5)}")
    // boundary points included on both ends
    assert(bucketed.contains((1L, -10.0)) && bucketed.contains((1L, 10.0)))
    assert(bucketed.contains((2L, 0.0)))
  }

  test("the plan is an equi-join, not a nested loop") {
    import spark.implicits._
    val intervals = spark.range(100).select(col("id").as("iid"),
      (col("id") * 10.0).as("lo"), (col("id") * 10.0 + 15.0).as("hi"))
    val points = spark.range(1000).select((col("id") * 1.0).as("price"))
    val joined = RangeJoin.pointInInterval(points, intervals, "price", "lo", "hi", 10.0)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degenerated to a nested loop:\n" + p.take(2000))
  }
}
