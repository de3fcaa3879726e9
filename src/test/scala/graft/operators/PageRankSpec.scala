package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("integer pagerank matches a hand-rolled reference on a known graph") {
    import spark.implicits._
    // a -> b, a -> c, b -> c, c -> a (the classic 3-node example)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val got = PageRank.integerPageRank(edges, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // reference implementation in plain Scala, same integer semantics
    val nodes = Seq("a", "b", "c")
    val out = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    val in = Map("a" -> Seq("c"), "b" -> Seq("a"), "c" -> Seq("a", "b"))
    var p = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 10)
      p = nodes.map(n => n ->
        (150000L + 85L * in(n).map(u => p(u) / out(u)).sum / 100L)).toMap
    assert(got == p, s"got=$got expected=$p")
    // c receives from two nodes: it must outrank b (single in-edge)
    assert(got("c") > got("b"))
  }

  test("isolated-source mass: dangling receivers keep the hold mass only") {
    import spark.implicits._
    val edges = Seq(("x", "y")).toDF("src", "dst")
    val got = PageRank.integerPageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // y has no out-edges: contributes nothing; x receives nothing
    assert(got("x") == 150000L)
    // y's value derives from x's (held) mass: 150000 + 85% of x's previous
    assert(got("y") == 150000L + 85L * 150000L / 100L)
  }

  test("personalized pagerank matches a hand-rolled reference; mass localizes at seeds") {
    import spark.implicits._
    // path a -> b -> c -> d -> e plus a side hub f -> e; seed = {a}
    val edgeSeq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "e"))
    val edges = edgeSeq.toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = PageRank.personalizedPageRank(edges, seeds, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val nodes = Seq("a", "b", "c", "d", "e", "f")
    val out = edgeSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val in = edgeSeq.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    var p = nodes.map(n => n -> (if (n == "a") 1000000L else 0L)).toMap
    for (_ <- 1 to 4)
      p = nodes.map(n => n ->
        ((if (n == "a") 150000L else 0L) +
          85L * in.getOrElse(n, Nil).map(u => p(u) / out(u)).sum / 100L)).toMap
    assert(got == p, s"got=$got expected=$p")
    // locality: b (one hop from the seed) outranks d (three hops);
    // f never receives mass (no path from the seed)
    assert(got("b") > got("d"))
    assert(got("f") == 0L)
  }
}
