package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.zeek.SharedSpark

/** Pins [[SumSplit128]] + [[ExactSumRuntime.cents]] to the decimal
  * formulation they replace:
  * `ExactSum.sumExact(x, 2)` == `CAST(SUM(CAST(x AS DECIMAL(_, 2))) AS
  * DOUBLE)` bit-for-bit — including binary-representation ties like
  * 1.115 (≈1.114999…) — and the split state survives totals past
  * Long.MaxValue units. */
class ExactSumSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("exact_cents == unscaled CAST(double AS DECIMAL(_,2)) incl. binary ties") {
    import spark.implicits._
    val vals = Seq(0.0, 1.0, 1.115, 2.675, 0.005, 0.015, -1.115, -2.675,
      99999.995, 110000.0, 0.004999999, 1e-9, -1e-9, 123.456, -123.456) ++
      (1 to 500).map(i => new scala.util.Random(i).nextDouble() * 200000 - 100000)
    val rows = vals.toDF("x").select(
      ExactSum.cents(col("x"), 2).as("u"),
      (col("x").cast(DecimalType(18, 2)) * 100).cast("long").as("u0")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"cents mismatch: $r"))
  }

  test("cents fast path agrees with the BigDecimal path on 1M doubles + crafted ties") {
    def slow(x: Double, s: Int): java.lang.Long =
      try java.lang.Long.valueOf(java.math.BigDecimal.valueOf(x)
        .setScale(s, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact())
      catch { case _: ArithmeticException => null }
    val rnd = new scala.util.Random(123L)
    var i = 0
    while (i < 1000000) {
      val x = rnd.nextInt(5) match {
        case 0 => rnd.nextDouble() * 200000 - 100000
        case 1 => math.rint(rnd.nextDouble() * 2000000) / 100.0 // exact-cent-ish
        case 2 => (rnd.nextInt(200000) - 100000) / 1000.0 + 0.005 // .xx5 ties
        case 3 => rnd.nextDouble() * 1e12
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) // adversarial bits
      }
      if (!x.isNaN && !x.isInfinite) {
        (2 to 4).foreach { s =>
          assert(ExactSumRuntime.cents(x, s) == slow(x, s), s"cents($x, $s)")
        }
      }
      i += 1
    }
  }

  test("grouped sumExact == decimal sum, doubles bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val df = (1 to 20000).map(i =>
      (i % 7, rnd.nextDouble() * 100000, rnd.nextInt(10) / 100.0 * (if (i % 3 == 0) 1 else 1)))
      .toDF("g", "price", "disc")
      .repartition(8) // force partial + merge paths
    val dp = col("price").cast(DecimalType(9, 2))
    val dd = col("disc").cast(DecimalType(4, 2))
    val one = lit(1).cast(DecimalType(4, 2))
    val units = ExactSum.cents(col("price"), 2) *
      (lit(100L) - ExactSum.cents(col("disc"), 2))
    val rows = df.groupBy("g").agg(
      ExactSum.sumExact(col("price"), 2).as("fast2"),
      sum(dp).cast(DoubleType).as("ref2"),
      ExactSum.sumUnits(units, 4).as("fast4"),
      sum(dp * (one - dd)).cast(DoubleType).as("ref4")).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("fast2")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("ref2")), s"scale-2 mismatch: $r")
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("fast4")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("ref4")), s"scale-4 mismatch: $r")
    }
  }

  test("splitToDouble fast path agrees with BigDecimal across the 2^52 boundary") {
    def slow(hi: Long, lo: Long, s: Int): Double =
      new java.math.BigDecimal(java.math.BigInteger.valueOf(hi).shiftLeft(31)
        .add(java.math.BigInteger.valueOf(lo))).movePointLeft(s).doubleValue()
    val rnd = new scala.util.Random(55L)
    for (_ <- 1 to 200000) {
      val hi = rnd.nextInt(5) match {
        case 0 => rnd.nextLong() % 2097152L           // inside fast range
        case 1 => 2097152L + rnd.nextInt(1000) - 500  // straddle the gate
        case 2 => -2097152L + rnd.nextInt(1000) - 500
        case 3 => rnd.nextLong() % (1L << 50)         // far outside
        case _ => 0L
      }
      val lo = rnd.nextLong() & 0xffffffffL // [0, 2^32)
      (0 to 4).foreach { s =>
        val f = ExactSumRuntime.splitToDouble(hi, lo, s)
        assert(java.lang.Double.doubleToLongBits(f) ==
          java.lang.Double.doubleToLongBits(slow(hi, lo, s)), s"($hi, $lo, $s)")
      }
    }
  }

  test("state survives totals beyond Long.MaxValue units") {
    import spark.implicits._
    // 4000 rows x 9.2e15 cents = 3.68e19 > 2^63-1 (9.22e18): a plain
    // SUM(BIGINT) wraps negative; the split state must not
    val big = 9.2e15
    val df = (1 to 4000).map(_ => big).toDF("x").repartition(16)
    val got = df.agg(ExactSum.sumExact(col("x"), 2).as("s")).collect()(0).getDouble(0)
    val expect = java.math.BigDecimal.valueOf(big).setScale(2, java.math.RoundingMode.HALF_UP)
      .multiply(new java.math.BigDecimal(4000)).doubleValue()
    assert(got == expect, s"$got != $expect")
    // (the equivalent SUM(BIGINT) of these units overflows int64 —
    // wraps under non-ANSI, throws under ANSI — which is exactly why
    // the split state exists)
  }

  test("null inputs are skipped; all-null group yields NULL") {
    import spark.implicits._
    val df = Seq((1, Some(1.5)), (1, None), (2, None)).toDF("g", "x")
    val rows = df.groupBy("g").agg(ExactSum.sumExact(col("x"), 2).as("s"))
      .orderBy("g").collect()
    assert(rows(0).getAs[Double]("s") == 1.5)
    assert(rows(1).isNullAt(1))
  }

  test("non-finite input maps to NULL like the decimal cast") {
    import spark.implicits._
    val r = Seq(Double.NaN, Double.PositiveInfinity, 1.0).toDF("x")
      .select(ExactSum.cents(col("x"), 2).as("u")).collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0) && r(2).getLong(0) == 100L)
  }
}
