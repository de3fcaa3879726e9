package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.zeek.SharedSpark

/** Co-located joins via bucketing: both sides bucketed on the join key →
  * sort-merge join with NO shuffle exchange. The 100 TB pattern for
  * repeatedly-joined fact tables. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitioned write + partition-pruned read") {
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    Tables.orders(spark, sf)
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("yr") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan.take(1500))
    val expected = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() == expected)
  }

  test("bucketed tables sort-merge join without exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf).write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan.take(2000))
      // and it is correct
      val n = j.count()
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
