package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** Incremental aggregate maintenance ≡ one-shot recompute, property-
  * tested over random batchings (seeded Gen directly — the scalatest-
  * scalacheck bridge isn't in the offline dependency set). */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("k")).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString,
        r.getDouble(3), r.getDouble(4))
    }.toSeq

  test("fold over batches equals one-shot aggregate of the union") {
    import spark.implicits._
    val gen = for {
      rows <- Gen.listOfN(40, Gen.zip(Gen.choose(1L, 6L), Gen.choose(-500, 500)))
      nBatches <- Gen.choose(1, 4)
    } yield (rows, nBatches)
    (1 to 15).foreach { i =>
      val (rows, nBatches) =
        gen.apply(Gen.Parameters.default, Seed(0xa66L + i)).get
      val data = rows.zipWithIndex.map { case ((k, v), idx) =>
        (k, v / 100.0, idx % nBatches)
      }
      val df = data.toDF("k", "v", "b")
      val batches = (0 until nBatches).map(j => df.filter(col("b") === j))
        .filter(!_.isEmpty)
      val folded = batches.tail.foldLeft(
        IncrementalAgg.init(batches.head, Seq("k"), "v")) {
        (st, b) => IncrementalAgg.merge(st, b, Seq("k"), "v")
      }
      val direct = IncrementalAgg.init(df, Seq("k"), "v")
      assert(canon(folded) == canon(direct), s"seed offset $i")
    }
  }

  test("untouched keys pass through a merge bit-identically") {
    import spark.implicits._
    val state = IncrementalAgg.init(
      Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v"), Seq("k"), "v")
    val merged = IncrementalAgg.merge(
      state, Seq((2L, 7.0)).toDF("k", "v"), Seq("k"), "v")
    val before = canon(state.filter(col("k") === 1L))
    val after = canon(merged.filter(col("k") === 1L))
    assert(after == before)
    val k2 = canon(merged.filter(col("k") === 2L)).head
    assert(k2 == ((2L, 2L, "12.00", 5.0, 7.0)))
  }

  test("derived view: avg from mergeable primitives") {
    import spark.implicits._
    val st = IncrementalAgg.init(
      Seq((1L, 1.0), (1L, 2.0)).toDF("k", "v"), Seq("k"), "v")
    val v = IncrementalAgg.view(st).select(col("avg_v")).collect().head.getDouble(0)
    assert(v == 1.5)
  }
}
