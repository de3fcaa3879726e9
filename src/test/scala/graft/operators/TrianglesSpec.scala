package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.perVertexTriangles(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** id-ordered naive enumeration — the spec the degree-ordered plan
    * must match. */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val tris = for {
      (a, b) <- und.toSeq
      (b2, c) <- und.toSeq if b2 == b && und.contains((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (v, occ) => v -> occ.size.toLong }
  }

  test("planted graph: K4 has 3 triangles per vertex, chain has none") {
    // K4 on 1..4 (4 triangles, each vertex in 3) + chain 10-11-12 + pendant 5
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = k4 ++ Seq((10L, 11L), (11L, 12L), (4L, 5L))
    val got = counts(edges)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degree-ordered plan matches naive enumeration on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(counts(edges) == naive(edges), s"trial $trial")
    }
  }

  test("duplicate and reversed edges do not inflate counts") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L))
    assert(counts(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
