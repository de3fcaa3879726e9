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

  test("reliable cut: equal results, lineage truncated, auto-selected by checkpoint dir") {
    val dir = new java.io.File("target/lineage-spec-ckpt")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .groupBy("k").agg(sum("id").as("s"))
    val local = Lineage.cut(df, reliable = false)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "spec assumes no checkpoint dir configured up front")
    try {
      spark.sparkContext.setCheckpointDir(dir.getPath)
      // explicit reliable mode
      val rel = Lineage.cut(df, reliable = true)
      assert(rel.schema == df.schema)
      assert(rel.orderBy("k").collect().toSeq == local.orderBy("k").collect().toSeq)
      val p = rel.queryExecution.executedPlan.toString
      assert(!p.contains("HashAggregate"), "producer survived the reliable cut:\n" + p)
      // checkpoint files actually landed in reliable storage
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(dir).nonEmpty, "reliable checkpoint wrote no files")
      // the no-arg overload auto-selects reliable while a dir is
      // configured: a fresh rdd-N checkpoint dir appears under `dir`
      val before = files(dir).map(_.getPath).toSet
      val auto = Lineage.cut(df)
      assert((files(dir).map(_.getPath).toSet -- before).nonEmpty,
        "no-arg cut did not auto-select reliable mode with a checkpoint dir set")
      assert(auto.orderBy("k").collect().toSeq == local.orderBy("k").collect().toSeq)
    } finally {
      // SparkContext has no unsetCheckpointDir; clear the private conf so
      // later suites (and this one's local-mode assumption) see none
      val f = spark.sparkContext.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(): Unit
      }
      rm(dir)
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
