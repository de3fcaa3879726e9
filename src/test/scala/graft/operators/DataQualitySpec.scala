package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark
import DataQuality._

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("profile runs all checks in one aggregate pass over one scan") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (2L, Some("c")), (3L, None))
      .toDF("id", "tag")
    val out = profile(df, Seq(
      Check("rows", count(lit(1))),
      Check("tag_null_frac", nullFraction("tag")),
      Check("id_distinct_ratio", distinctRatio("id"))))
    val got = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("rows" -> 4.0, "tag_null_frac" -> 0.5,
      "id_distinct_ratio" -> 0.75))
    // one scan: a single leaf in the executed plan
    assert(out.queryExecution.executedPlan.collectLeaves().length == 1)
  }

  test("orphanFraction counts unmatched AND null foreign keys") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val frac = orphanFraction(child, "fk", parent, "pk")
      .collect()(0).getDouble(0)
    assert(frac == 0.5) // 99 unmatched + null = 2 of 4
  }
}
