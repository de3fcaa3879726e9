package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class ApportionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def quotas(ws: Seq[(String, Long)], n: Long): Map[String, Long] = {
    import spark.implicits._
    Apportion.largestRemainder(ws.toDF("g", "w"), "g", "w", n)
      .select("g", "quota").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Sequential textbook reference. */
  private def reference(ws: Seq[(String, Long)], n: Long): Map[String, Long] = {
    val tw = ws.map(_._2).sum
    val base = ws.map { case (g, w) => (g, n * w / tw, n * w % tw) }
    val left = (n - base.map(_._2).sum).toInt
    val bump = base.sortBy { case (g, _, rem) => (-rem, g) }.take(left).map(_._1).toSet
    base.map { case (g, b, _) => g -> (if (bump(g)) b + 1 else b) }.toMap
  }

  test("skewed weights: exact total, within one of proportionality") {
    val ws = Seq(("a", 1000L), ("b", 300L), ("c", 77L), ("d", 3L), ("e", 1L))
    for (n <- Seq(0L, 1L, 7L, 100L, 997L)) {
      val got = quotas(ws, n)
      assert(got.values.sum == n, s"n=$n: total ${got.values.sum}")
      assert(got == reference(ws, n), s"n=$n")
      val tw = ws.map(_._2).sum.toDouble
      ws.foreach { case (g, w) =>
        assert(math.abs(got(g) - n * w / tw) < 1.0, s"n=$n group $g") }
    }
  }

  test("remainder ties break by group name ascending") {
    // equal weights, n not divisible: the extra seats go to the
    // lexicographically-first groups
    val got = quotas(Seq(("x", 5L), ("y", 5L), ("z", 5L)), 7)
    assert(got == Map("x" -> 3L, "y" -> 2L, "z" -> 2L))
  }

  test("zero-weight groups get nothing; result is partition-invariant") {
    import spark.implicits._
    val ws = Seq(("a", 10L), ("zero", 0L), ("b", 30L))
    val got = quotas(ws, 13)
    assert(got("zero") == 0L && got.values.sum == 13L)
    val shuffled = Apportion.largestRemainder(
        ws.reverse.toDF("g", "w").repartition(5), "g", "w", 13)
      .select("g", "quota").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shuffled == got)
  }
}
