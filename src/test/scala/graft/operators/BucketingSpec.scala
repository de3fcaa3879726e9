package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.zeek.SharedSpark

/** Pins the bucketed-layout contract: a same-count bucketed fact⋈fact
  * equi-join plans with ZERO Exchange on the bucket key — the 100-TB
  * lever the round-10 q05 experiment measured (the eliminated exchange
  * is the full fact re-partition on a real cluster). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val sf = sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"

  private def joined(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
    // hint("merge") forces SMJ so the plan shape is exchange-or-not, not
    // broadcast-vs-not (the tiny spec tables would otherwise broadcast)
    l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("qty"))
      .orderBy(col("o_orderstatus"))

  test("bucketed fact join: zero order-key exchanges, same results; declareBucketed re-attaches") {
    assume(new java.io.File(sf).isDirectory, s"$sf not present")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val or = spark.read.parquet(s"$sf/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS bkt_spec_l")
    spark.sql("DROP TABLE IF EXISTS bkt_spec_o")
    try {
      Bucketing.writeBucketed(li, "bkt_spec_l", "l_orderkey", 8)
      Bucketing.writeBucketed(or, "bkt_spec_o", "o_orderkey", 8)

      val unbucketed = joined(li, or)
      val bucketed = joined(spark.table("bkt_spec_l"), spark.table("bkt_spec_o"))
      assert(bucketed.collect().toSeq == unbucketed.collect().toSeq,
        "bucketed layout changed join results")

      // AdaptiveSparkPlan.toString prints the Final AND the Initial plan;
      // count exchanges in the final (executed) section only
      def orderKeyExchanges(p: String): Int =
        "Exchange hashpartitioning\\((l|o)_orderkey".r
          .findAllIn(p.split("== Initial Plan ==")(0)).size
      val bp = bucketed.queryExecution.executedPlan.toString
      assert(orderKeyExchanges(bp) == 0,
        "bucketed join still exchanges on the order key:\n" + bp)
      // the unbucketed twin DOES exchange both sides — proves the assert
      // above is measuring the layout, not a plan that never shuffles
      val up = unbucketed.queryExecution.executedPlan.toString
      assert(orderKeyExchanges(up) == 2,
        "control: unbucketed SMJ should exchange both sides:\n" + up)

      // declareBucketed: metadata-only re-attach over files that already
      // have the layout (a fresh session seeing another writer's output).
      // Declare a second name over bkt_spec_l's own directory and verify
      // the bucket spec is live: joining it against the bucketed orders
      // table must again plan zero order-key exchanges.
      val loc = spark.sql("DESCRIBE TABLE EXTENDED bkt_spec_l")
        .filter(col("col_name") === "Location").head().getString(1)
        .stripPrefix("file:")
      Bucketing.declareBucketed(spark, "bkt_spec_l2", loc, "l_orderkey", 8)
      val redeclared = joined(spark.table("bkt_spec_l2"), spark.table("bkt_spec_o"))
      assert(redeclared.collect().toSeq == unbucketed.collect().toSeq)
      assert(orderKeyExchanges(redeclared.queryExecution.executedPlan.toString) == 0,
        "declareBucketed did not re-attach a live bucket spec")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_spec_l")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_l2")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_o")
    }
  }

  test("declareBucketed: existing table with a mismatched bucket spec throws, matching spec no-ops") {
    assume(new java.io.File(sf).isDirectory, s"$sf not present")
    spark.sql("DROP TABLE IF EXISTS bkt_spec_guard")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      Bucketing.writeBucketed(li, "bkt_spec_guard", "l_orderkey", 8)
      val loc = spark.sql("DESCRIBE TABLE EXTENDED bkt_spec_guard")
        .filter(col("col_name") === "Location").head().getString(1)
        .stripPrefix("file:")
      // matching declaration over the existing table: benign no-op
      Bucketing.declareBucketed(spark, "bkt_spec_guard", loc, "l_orderkey", 8)
      // wrong bucket COUNT: the silent-mis-join hazard — must throw
      val eCount = intercept[IllegalStateException] {
        Bucketing.declareBucketed(spark, "bkt_spec_guard", loc, "l_orderkey", 16)
      }
      assert(eCount.getMessage.contains("bkt_spec_guard"))
      // wrong bucket KEY: must throw too
      intercept[IllegalStateException] {
        Bucketing.declareBucketed(spark, "bkt_spec_guard", loc, "l_partkey", 8)
      }
      // UNBUCKETED table of the same name: must throw, not silently
      // forfeit the exchange elimination
      spark.sql("DROP TABLE bkt_spec_guard")
      li.limit(1).write.mode("overwrite").saveAsTable("bkt_spec_guard")
      val eFlat = intercept[IllegalStateException] {
        Bucketing.declareBucketed(spark, "bkt_spec_guard", loc, "l_orderkey", 8)
      }
      assert(eFlat.getMessage.contains("<none>"))
    } finally spark.sql("DROP TABLE IF EXISTS bkt_spec_guard")
  }

  test("bucketed side alone: its exchange disappears, probe side still shuffles") {
    assume(new java.io.File(sf).isDirectory, s"$sf not present")
    spark.sql("DROP TABLE IF EXISTS bkt_spec_l3")
    try {
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sf/lineitem.parquet"), "bkt_spec_l3", "l_orderkey", 8)
      val p = joined(spark.table("bkt_spec_l3"),
        spark.read.parquet(s"$sf/orders.parquet"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed lineitem side still exchanges:\n" + p)
      assert(p.contains("Exchange hashpartitioning(o_orderkey"),
        "unbucketed orders side must shuffle to the bucket layout:\n" + p)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_spec_l3")
  }
}
