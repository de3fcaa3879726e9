package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** GlobalRank.withGlobalIndex: a contiguous 0-based total-order ordinal
  * with NO single-partition stage — the scale-safe replacement for an
  * unpartitioned row_number window. */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("ordinals are contiguous, 0-based, and ordered by the sort key") {
    import spark.implicits._
    val df = spark.range(10000).select(
      (col("id") * 48271 % 65537).as("key"), col("id").as("payload"))
    val out = GlobalRank.withGlobalIndex(df, "idx", col("key"), col("payload"))
      .orderBy("idx").collect()
    assert(out.length == 10000)
    assert(out.map(_.getLong(2)).toSeq == (0L until 10000L))
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("equal keys get a contiguous ordinal block: min/count per key are exact") {
    import spark.implicits._
    val df = spark.range(999).select((col("id") % 7).as("k"))
    val idx = GlobalRank.withGlobalIndex(df, "idx", col("k"))
    val g = idx.groupBy("k").agg(min("idx").as("lo"), max("idx").as("hi"),
      count(lit(1)).as("n")).orderBy("k").collect()
    // each key's block is [lo, lo+n-1] and blocks tile [0, 999)
    var next = 0L
    g.foreach { r =>
      assert(r.getLong(1) == next, s"key ${r.getLong(0)} block start")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3) - 1, "block contiguity")
      next = r.getLong(2) + 1
    }
    assert(next == 999L)
  }

  test("no single-partition exchange: the sorted stage keeps full parallelism") {
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val df = spark.range(50000).select(col("id").as("k"))
    val sorted = df.repartitionByRange(parts, col("k"))
    assert(sorted.rdd.getNumPartitions == parts)
  }

  test("prefix sum equals a sequential scanLeft on unique keys, incl. negatives") {
    import spark.implicits._
    val rows = (0L until 5000L).map(i => (i * 48271 % 65537, (i % 13) - 6))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
    val df = rows.toDF("k", "v")
    val out = GlobalRank.withGlobalPrefixSum(df, "v", "run", col("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    val expect = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }.drop(1)
    assert(out.toSeq == expect, "prefix sums diverge from the sequential fold")
  }
}
