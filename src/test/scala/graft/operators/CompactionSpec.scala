package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("compaction collapses a many-file directory, preserving every row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val data = (0L until 5000L).map(i => (i, s"row$i"))
    data.toDF("id", "s").repartition(40).write.parquet(dir)

    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length == 40)

    val stats = Compaction.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(stats.filesBefore == 40 && stats.filesAfter == 1 && stats.partitions == 1)

    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length == 1)
    assert(after.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq == data)
  }

  test("sorted compaction keeps footer-stats pruning alive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 64 unsorted files; after sorted compaction into 8 ranged files, a
    // point predicate must touch a fraction of the rows
    (0L until 20000L).map(i => (i * 37 % 20000, i)).toDF("k", "v")
      .repartition(64).write.parquet(dir)

    val stats = Compaction.compactParquet(spark, dir,
      targetFileBytes = 1L << 15, sortCols = Seq(col("k")))
    assert(stats.filesAfter > 1, stats.toString)

    val scan = spark.read.parquet(dir).filter(col("k") === 7)
    scan.collect()
    val scanned = scan.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
    assert(scanned < 20000L / 2,
      s"range-sorted files should prune most row groups, scanned $scanned")
  }
}
