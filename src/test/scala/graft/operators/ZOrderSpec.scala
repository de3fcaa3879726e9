package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def refInterleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1) << (2 * i)) | (((ym >> i) & 1) << (2 * i + 1))
    }
  }

  test("zValue2 matches the reference interleave on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == refInterleave(x, y, 16), s"($x,$y)") }
  }

  test("sql form is bit-identical to the column form") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i * 7 % 256, i * 13 % 256))
    val df = rows.toDF("x", "y")
    val both = df.select(
      ZOrder.zValue2(col("x"), col("y"), 8).as("zc"),
      expr(ZOrder.zValue2Sql("x", "y", 8)).as("zs"))
    assert(both.filter(col("zc") =!= col("zs")).count() == 0)
  }

  test("cluster(): z-sorted parquet files prune on BOTH columns via footer stats") {
    import spark.implicits._
    val pts = (for { x <- 0L until 128L; y <- 0L until 128L } yield (x, y)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.cluster(pts, col("x"), col("y"), numPartitions = 16, bits = 8)
      .write.mode("overwrite").parquet(s"$dir/z")
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/x")
    // row-group stats pruning: a point predicate on y alone. The pushed
    // parquet filter skips row groups whose y min/max excludes 7 — every
    // x-sorted group spans the full y domain (nothing skips, the scan
    // emits all 16384 rows); z-sorted groups are rectangles, so only the
    // groups whose y-range covers 7 are read at all
    def rowsScanned(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("y") === 7)
      df.collect() // execute so metrics populate
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val zScan = rowsScanned(s"$dir/z")
    val xScan = rowsScanned(s"$dir/x")
    assert(xScan == 128L * 128, s"x-sorted layout cannot skip on y, scanned $xScan")
    assert(zScan <= 128L * 128 / 2, s"z-sorted layout should skip most row groups, scanned $zScan")
  }

  test("zValueN: two-column case is bit-identical to zValue2") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(400)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong)).toDF("x", "y")
    val both = df.select(
      ZOrder.zValue2(col("x"), col("y"), 12).as("z2"),
      ZOrder.zValueN(Seq(col("x"), col("y")), 12).as("zn"))
    assert(both.filter(col("z2") =!= col("zn")).count() == 0)
  }

  test("zValueN: three-column interleave matches the reference bit layout") {
    import spark.implicits._
    def ref(vs: Seq[Long], bits: Int): Long = {
      val k = vs.length
      val mask = (1L << bits) - 1
      (for { i <- 0 until bits; j <- 0 until k } yield
        ((vs(j) & mask) >> i & 1L) << (k * i + j)
      ).foldLeft(0L)(_ | _)
    }
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(300)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .collect()
    got.foreach { r =>
      val vs = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == ref(vs, 8), vs.toString)
    }
  }

  test("clusterN(): 3-D z-sorted parquet prunes on the THIRD column too") {
    import spark.implicits._
    val pts = (for { x <- 0L until 32L; y <- 0L until 32L; z <- 0L until 32L }
      yield (x, y, z)).toDF("x", "y", "z")
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    ZOrder.clusterN(pts, Seq(col("x"), col("y"), col("z")), numPartitions = 16, bits = 5)
      .write.mode("overwrite").parquet(s"$dir/z3")
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/x")
    def rowsScanned(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("z") === 3)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val zScan = rowsScanned(s"$dir/z3")
    val xScan = rowsScanned(s"$dir/x")
    assert(xScan == 32L * 32 * 32, s"x-sorted layout cannot skip on z, scanned $xScan")
    assert(zScan <= 32L * 32 * 32 / 2, s"3-D z layout should skip row groups on z, scanned $zScan")
  }

  test("zValueN rejects layouts that overflow a long") {
    intercept[IllegalArgumentException](ZOrder.zValueN(Seq(col("a")), 64))
    intercept[IllegalArgumentException](ZOrder.zValueN(Nil, 8))
    intercept[IllegalArgumentException](ZOrder.zValueN(Seq(col("a"), col("b"), col("c"), col("d")), 16))
  }

  test("top-bit buckets are bounded sub-rectangles (the file-skipping property)") {
    import spark.implicits._
    // dense 256x256 grid; top 6 of 16 z-bits => 64 buckets, each an
    // 8x4-cell... for an even bit count a bucket is a square; 6 bits =>
    // 2^5 x 2^3? — assert the provable bound: both ranges <= 32
    val pts = for { x <- 0L until 256L; y <- 0L until 256L } yield (x, y)
    val rects = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), 8).as("z"))
      .groupBy(shiftright(col("z"), 10).as("bucket"))
      .agg((max(col("x")) - min(col("x"))).as("xr"), (max(col("y")) - min(col("y"))).as("yr"))
      .collect()
    assert(rects.length == 64)
    rects.foreach { r =>
      assert(r.getLong(1) <= 31 && r.getLong(2) <= 31,
        s"bucket ${r.get(0)}: xrange=${r.getLong(1)} yrange=${r.getLong(2)}")
    }
    // a single-column sort into 64 equal slices leaves the OTHER column
    // unbounded (range 255) — the z-order rectangles above are what make
    // min/max footer pruning work on both predicates
  }

  test("q148: z-order skips on every predicate and strictly beats the scatter layout") {
    val rows = graft.queries.ExtendedQueries
      .queries("q148_zonemap_skip")(SharedSpark.spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    val (zo, sc) = rows.partition(_._1 == "zorder")
    assert(zo.length == 4 && sc.length == 4)
    rows.foreach { case (_, p, files, skipped, scanned) =>
      assert(skipped + scanned == files, s"counts must partition files at $p")
    }
    zo.foreach { case (_, p, files, skipped, _) =>
      assert(skipped > 0 && skipped >= files / 2, s"zorder must skip most files at $p")
    }
    // per predicate, z-order scans no more than scatter (tiny sf0.001
    // scatter files can skip a sparse range by luck); totals strictly win
    val scScan = sc.map(r => r._2 -> r._5).toMap
    zo.foreach { case (_, p, _, _, scanned) =>
      assert(scanned <= scScan(p), s"zorder scanned more than scatter at $p")
    }
    assert(zo.map(_._5).sum < sc.map(_._5).sum)
  }
}
