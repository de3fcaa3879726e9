package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.zeek.SharedSpark

class LineageSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("cut preserves values, schema, and determinism") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .groupBy("k").agg(sum("id").as("s"))
    val cut = Lineage.cut(df)
    assert(cut.schema == df.schema)
    assert(cut.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
  }

  test("cut truncates lineage: the checkpointed plan is a scan, not the producer") {
    val df = Seq(1L, 2L, 3L).toDF("id").groupBy("id").count()
    val cut = Lineage.cut(df)
    val p = cut.queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"), "producer survived the cut:\n" + p)
  }

  test("recordPlans captures the materialized producer plan for pinning") {
    Lineage.recordPlans = true
    Lineage.clearRecordedPlans()
    try {
      Lineage.cut(Seq(1L, 2L).toDF("id").groupBy("id").count())
      val rec = Lineage.recordedPlans
      assert(rec.size == 1)
      assert(rec.head.contains("HashAggregate"), rec.head)
    } finally {
      Lineage.recordPlans = false
      Lineage.clearRecordedPlans()
    }
  }

  test("releaseAll drops checkpoint blocks; a prior cut stays usable until released") {
    val cut = Lineage.cut(Seq(1L, 2L).toDF("id"))
    assert(cut.count() == 2)
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before > 0, "expected at least the cut's persisted RDD")
    Lineage.releaseAll(spark)
    // unpersist is async (blocking = false); poll briefly
    val deadline = System.nanoTime() + 5000000000L
    while (spark.sparkContext.getPersistentRDDs.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
