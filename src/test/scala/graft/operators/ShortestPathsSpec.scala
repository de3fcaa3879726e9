package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class ShortestPathsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def bfs(edges: Seq[(Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    ShortestPaths.bfsDistances(edges.toDF("src", "dst"),
        sources.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("planted graph: branch, merge, cycle, unreachable") {
    // 1 → 2 → 3 → 4 and 1 → 5 → 4 (two routes to 4: min wins),
    // 4 → 1 closes a cycle (must not loop forever or lower settled
    // distances), 8 → 9 is a disconnected component (never reached)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 4L),
      (4L, 1L), (8L, 9L))
    assert(bfs(edges, Seq(1L), rounds = 5) ==
      Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("round bound truncates the walk") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(chain, Seq(1L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(bfs(chain, Seq(1L), rounds = 0) == Map(1L -> 0L))
  }

  test("multi-source: nearest seed wins, seeds stay at zero") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(bfs(chain, Seq(1L, 5L), rounds = 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 0L, 6L -> 1L))
  }

  test("checkpointed long walk matches the unchunked result") {
    // 12-hop chain forces several localCheckpoint cuts (every 3 rounds)
    val chain = (1L to 12L).map(i => (i, i + 1))
    val expect = (1L to 13L).map(i => i -> (i - 1)).toMap
    assert(bfs(chain, Seq(1L), rounds = 12) == expect)
    assert(bfs(chain, Seq(1L), rounds = 12) ==
      bfs(chain, Seq(1L), rounds = 13)) // no phantom rows past the end
  }

  private def wsp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    ShortestPaths.weightedDistances(edges.toDF("src", "dst", "w"),
        sources.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted: cheaper long route beats expensive direct edge") {
    // 1→4 direct costs 10; 1→2→3→4 costs 1+1+1=3 — min-plus must pick
    // the longer-but-cheaper route once enough rounds have run
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(wsp(edges, Seq(1L), rounds = 1) ==
      Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
    assert(wsp(edges, Seq(1L), rounds = 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("weighted: distances improve across rounds (delta frontier re-propagates)") {
    // improving 4 at round 3 must re-propagate to 5 at round 4
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L))
    assert(wsp(edges, Seq(1L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 10L, 5L -> 11L))
    assert(wsp(edges, Seq(1L), rounds = 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("weighted: cycles and zero weights settle, checkpointed walk matches") {
    val edges = Seq((1L, 2L, 0L), (2L, 3L, 2L), (3L, 1L, 1L), (3L, 4L, 0L))
    val want = Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L)
    assert(wsp(edges, Seq(1L), rounds = 8) == want) // > checkpointEvery rounds
    assert(wsp(edges, Seq(1L), rounds = 3) == want)
  }

  test("weighted ≡ bfs when all weights are 1") {
    val e2 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 4L), (4L, 1L))
    val ew = e2.map { case (a, b) => (a, b, 1L) }
    assert(wsp(ew, Seq(1L), rounds = 5) == bfs(e2, Seq(1L), rounds = 5))
  }

  test("duplicate edges and duplicate sources do not duplicate rows") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L))
    import spark.implicits._
    val out = ShortestPaths.bfsDistances(edges.toDF("src", "dst"),
      Seq(1L, 1L).toDF("node"), 3)
    assert(out.count() == out.select("node").distinct().count())
    assert(bfs(edges, Seq(1L, 1L), 3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
