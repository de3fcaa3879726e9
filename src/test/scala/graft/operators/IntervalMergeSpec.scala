package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class IntervalMergeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def run(rows: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    IntervalMerge.merge(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .orderBy(col("k"), col("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("overlap, containment, touching, and gaps merge as islands") {
    val got = run(Seq(
      ("a", 0L, 10L), ("a", 5L, 12L),   // overlap        → [0,12)
      ("a", 12L, 15L),                  // touching joins → [0,15)
      ("a", 20L, 40L), ("a", 25L, 30L), // containment    → [20,40)
      ("a", 50L, 55L),                  // isolated
      ("b", 0L, 1L)))                   // second key independent
    assert(got == Seq(
      ("a", 0L, 15L, 3L), ("a", 20L, 40L, 2L), ("a", 50L, 55L, 1L),
      ("b", 0L, 1L, 1L)))
  }

  test("duplicate and zero-length intervals are absorbed; null bounds dropped") {
    import spark.implicits._
    val rows = Seq(("a", Some(1L), Some(5L)), ("a", Some(1L), Some(5L)),
      ("a", Some(3L), Some(3L)), ("a", None, Some(9L)), ("a", Some(9L), None))
    val got = IntervalMerge.merge(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 1L, 5L, 3L)))
  }

  test("random intervals match a sequential sweep-line reference") {
    val rnd = new scala.util.Random(67)
    for (trial <- 0 until 3) {
      val rows = Seq.tabulate(120) { _ =>
        val s = rnd.nextInt(200).toLong
        (s"k${rnd.nextInt(4)}", s, s + 1 + rnd.nextInt(20))
      }
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sorted
        val islands = sorted.tail.foldLeft(List((sorted.head._1, sorted.head._2, 1L))) {
          case ((s0, e0, n) :: rest, (s, e)) =>
            if (s > e0) (s, e, 1L) :: (s0, e0, n) :: rest
            else (s0, math.max(e0, e), n + 1) :: rest
          case (Nil, _) => Nil // unreachable
        }
        islands.reverse.map { case (s, e, n) => (k, s, e, n) }
      }.sorted
      assert(run(rows) == expected, s"trial $trial")
    }
  }

  test("plans as exactly one exchange: the island group-by reuses the window shuffle") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("b", 3L, 4L)).toDF("k", "s", "e")
    val plan = IntervalMerge.merge(df, Seq("k"), "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
