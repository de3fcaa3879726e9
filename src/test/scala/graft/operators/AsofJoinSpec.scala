package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.zeek.SharedSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("backward as-of join: latest prior right row per key, inclusive ties") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 250L),
      (4L, "u2", 50L), (5L, "u2", 400L), (6L, "u3", 10L))
      .toDF("event_id", "user", "t")
    val right = Seq(
      ("u1", 100L, "a"), ("u1", 240L, "b"),
      ("u2", 60L, "c"))
      .toDF("user", "t", "payload")

    val out = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq

    assert(out == Seq(
      (1L, Some("a")),  // tie at t=100 matches (inclusive >=)
      (2L, Some("a")),  // 240 is after 200
      (3L, Some("b")),
      (4L, None),       // no prior right row
      (5L, Some("c")),
      (6L, None)))      // key with no right rows at all
  }

  test("forward as-of join: earliest later right row per key, inclusive ties") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 250L),
      (4L, "u2", 50L), (5L, "u2", 400L), (6L, "u3", 10L))
      .toDF("event_id", "user", "t")
    val right = Seq(
      ("u1", 100L, "a"), ("u1", 240L, "b"),
      ("u2", 60L, "c"))
      .toDF("user", "t", "payload")

    val out = AsofJoin.asofForward(left, right, Seq("user"), "t", "t")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq

    assert(out == Seq(
      (1L, Some("a")),  // tie at t=100 matches (inclusive <=)
      (2L, Some("b")),  // next right row after 200 is 240
      (3L, None),       // nothing at-or-after 250
      (4L, Some("c")),
      (5L, None),
      (6L, None)))      // key with no right rows at all
  }

  test("single shuffle: plan contains exactly one exchange") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L)).toDF("event_id", "user", "t")
    val right = Seq(("u1", 90L, "x")).toDF("user", "t", "payload")
    val p = AsofJoin.asofBackward(left, right, Seq("user"), "t", "t")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected no more than one shuffle (+1 union prep), got $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "as-of must not plan a join at all:\n" + p)
  }
}
