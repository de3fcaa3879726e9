package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** brute-force reference: keep rows no other row dominates */
  private def bruteSkyline(rows: Seq[(Long, Double, Long)]): Seq[(Long, Double, Long)] =
    rows.filter { p =>
      !rows.exists(q => q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    }.sortBy(_._1)

  test("hand case: minimize price, maximize size") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10.0, 5L),  // skyline
      (2L, 10.0, 5L),  // exact tie of 1 → also survives
      (3L, 12.0, 5L),  // dominated by 1 (worse price, equal size)
      (4L, 8.0, 3L),   // skyline (cheaper)
      (5L, 15.0, 9L),  // skyline (biggest)
      (6L, 15.0, 8L))  // dominated by 5
    val got = Skyline.skyline(rows.toDF("id", "price", "size"),
        Seq(("price", false), ("size", true)))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10.0, 5L), (2L, 10.0, 5L), (4L, 8.0, 3L), (5L, 15.0, 9L)))
  }

  test("rows with a NULL dimension are excluded") {
    import spark.implicits._
    val rows = Seq((1L, Some(1.0), Some(1L)), (2L, None, Some(9L)), (3L, Some(0.5), None))
    val got = Skyline.skyline(rows.toDF("id", "price", "size"),
        Seq(("price", false), ("size", true)))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L))
  }

  test("random inputs across many partitions equal the brute-force skyline") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    for (trial <- 0 until 3) {
      val rows = Seq.tabulate(400) { i =>
        (i.toLong, rnd.nextInt(100) / 4.0, rnd.nextInt(60).toLong)
      }
      val got = Skyline.skyline(rows.toDF("id", "price", "size").repartition(13),
          Seq(("price", false), ("size", true)))
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got == bruteSkyline(rows), s"trial $trial")
    }
  }

  test("three dimensions, all maximize") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(10).toLong, rnd.nextInt(10).toLong)
    }
    val got = Skyline.skyline(rows.toDF("id", "x", "y", "z").repartition(7),
        Seq(("x", true), ("y", true), ("z", true)))
      .orderBy(col("id")).collect().map(_.getLong(0)).toSeq
    val expected = rows.filter { p =>
      !rows.exists(q => q._2 >= p._2 && q._3 >= p._3 && q._4 >= p._4 &&
        (q._2 > p._2 || q._3 > p._3 || q._4 > p._4))
    }.map(_._1).sorted
    assert(got == expected)
  }

  test("refinement join broadcasts the candidate set") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 1L), (2L, 2.0, 2L)).toDF("id", "price", "size")
    val plan = Skyline.skyline(df, Seq(("price", false), ("size", true)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }
}
