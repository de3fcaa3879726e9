package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Sequential reference BPE: the textbook algorithm over a word-count
    * map, same tie-break (count desc, then (a, b) ascending). */
  private def referenceTrain(wc: Map[String, Long], iterations: Int): Seq[(String, String)] = {
    var words: Map[IndexedSeq[String], Long] =
      wc.map { case (w, c) => (w.split("").toIndexedSeq: IndexedSeq[String]) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < iterations && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }._1
        merges += ((a, b))
        words = words.groupMapReduce { case (syms, _) =>
          BpeTrainer.mergeOnce(syms, a, b)
        }(_._2)(_ + _)
        i += 1
      }
    }
    merges.toSeq
  }

  private def toDf(wc: Map[String, Long]) = {
    import spark.implicits._
    wc.toSeq.toDF("word", "cnt")
  }

  test("learns the classic low/lower/newest merges in reference order") {
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = BpeTrainer.train(toDf(wc), 6)
    assert(got == referenceTrain(wc, 6))
    // the canonical first merges: 'es' (9), then 'est' (9), then 'lo' (7)
    assert(got.take(3) == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("distributed training equals the sequential reference on random corpora") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val alphabet = "abcd"
      val words = Seq.fill(30)((0 until (1 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val wc = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val got = BpeTrainer.train(toDf(wc), 8)
      assert(got == referenceTrain(wc, 8), s"trial $trial corpus $wc")
    }
  }

  test("training stops when no pairs remain") {
    val wc = Map("ab" -> 3L, "a" -> 2L)
    // after merging (a,b), all words are single symbols — rules run out
    assert(BpeTrainer.train(toDf(wc), 10) == Seq(("a", "b")))
  }

  test("encode applies merges in learned order; fertility drops as rules grow") {
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeTrainer.train(toDf(wc), 8)
    assert(BpeTrainer.encodeWord("newest", merges).length <
      "newest".length)
    // an unseen word still encodes (falls back to finer pieces)
    val pieces = BpeTrainer.encodeWord("lowest", merges)
    assert(pieces.mkString == "lowest")
    // column form agrees with the scalar form
    import spark.implicits._
    val got = BpeTrainer.encode(Seq("newest", "lowest").toDF("word"), "word", merges)
      .orderBy("word").collect().map(_.getSeq[String](1).mkString("+"))
    assert(got.toSeq == Seq(
      BpeTrainer.encodeWord("lowest", merges).mkString("+"),
      BpeTrainer.encodeWord("newest", merges).mkString("+")))
  }

  test("pair counting is a partial+final aggregate (map-side combinable)") {
    val words = toDf(Map("abab" -> 2L, "ba" -> 1L))
      .select(split(col("word"), "").as("syms"), col("cnt"))
    val counts = BpeTrainer.pairCounts(words)
    val got = counts.orderBy(desc("n"), asc("a"), asc("b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 4L), ("b", "a", 3L)))
    val plan = counts.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }
}
