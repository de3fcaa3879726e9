package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class HilbertSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SharedSpark.spark
    graft.functions.HilbertIndex2.registerAll(s)
    s
  }

  /** independent textbook xy2d (Wikipedia formulation) for cross-checking */
  private def refXy2d(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = (1L << bits) / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = (1L << bits) - 1 - x; y = (1L << bits) - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("codegen path matches the textbook walk on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hValue2(col("x"), col("y"), 16).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, h) => assert(h == refXy2d(x, y, 16), s"($x,$y)") }
  }

  test("interpreted eval matches codegen (same expression, both paths)") {
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 200) {
      val (x, y) = (rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong)
      assert(graft.functions.HilbertIndex2.xy2d(x, y, 12) == refXy2d(x, y, 12))
    }
  }

  test("full 16x16 grid: bijective onto [0, 256) and every step is a grid neighbor") {
    import spark.implicits._
    val pts = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hValue2(col("x"), col("y"), 4).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 256L)) // bijection
    // THE Hilbert property (z-order lacks it): consecutive curve
    // positions are Manhattan-distance-1 neighbors — no diagonal jumps
    got.sliding(2).foreach { case Array((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump before d=$d2")
    }
  }

  test("256-cell top-bit buckets are EXACT 16x16 subsquares (tighter than Morton worst case)") {
    import spark.implicits._
    val pts = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val rects = pts.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hValue2(col("x"), col("y"), 6).as("h"))
      .groupBy(shiftright(col("h"), 8).as("bucket"))
      .agg((max(col("x")) - min(col("x"))).as("xr"), (max(col("y")) - min(col("y"))).as("yr"))
      .collect()
    assert(rects.length == 16)
    rects.foreach { r =>
      assert(r.getLong(1) == 15 && r.getLong(2) == 15,
        s"bucket ${r.get(0)}: xrange=${r.getLong(1)} yrange=${r.getLong(2)}")
    }
  }

  test("cluster(): hilbert-sorted parquet prunes row groups on BOTH columns") {
    import spark.implicits._
    val pts = (for { x <- 0L until 128L; y <- 0L until 128L } yield (x, y)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    Hilbert.cluster(pts, col("x"), col("y"), numPartitions = 16, bits = 8)
      .write.mode("overwrite").parquet(s"$dir/h")
    def rowsScanned(path: String, c: String): Long = {
      val df = spark.read.parquet(path).filter(col(c) === 7)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    assert(rowsScanned(s"$dir/h", "y") <= 128L * 128 / 2)
    assert(rowsScanned(s"$dir/h", "x") <= 128L * 128 / 2)
  }

  test("null coordinates yield null index") {
    import spark.implicits._
    val got = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(Hilbert.hValue2(col("x"), col("y"), 8).as("h")).collect()
    assert(got.head.isNullAt(0))
  }
}
