package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.zeek.SharedSpark

/** Pins [[Dedup.parallelizeForKernel]]'s two contractual behaviors
  * (guide §2.5 "input skew": spread an unsplittable scan before a
  * CPU-dense kernel, but NEVER add an exchange at production scale):
  *
  *   - below the gate (estimated scan splits < session cores) the
  *     kernel input is round-robin-spread to the session's full
  *     parallelism, preserving the row multiset — callers' band/block
  *     keys are pure row functions, so results are unchanged (proven
  *     310/310 byte-equal on the full contract at sf0.01);
  *   - at or above the gate it returns the SAME DataFrame reference —
  *     structurally zero added exchange in the 100-TB plan, not just
  *     an optimized-away one.
  */
class ParallelizeKernelSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tinyParquet(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pk_spec").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "docs").getAbsolutePath
    (1 to 100).map(i => (i.toLong, s"doc number $i body"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  test("sub-core-count scan spreads to defaultParallelism, rows preserved") {
    val df = tinyParquet().select(col("doc_id"), col("text"))
    val out = Dedup.parallelizeForKernel(df)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("identity (same reference) when estimated splits reach the core count") {
    val df = tinyParquet().select(col("doc_id"), col("text"))
    val k = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(k)
    // the gate reads the conf at CALL time, so shrinking the split size
    // makes the same tiny scan count as "already parallel enough"
    try {
      spark.conf.set(k, "16b")
      assert(Dedup.parallelizeForKernel(df) eq df)
    } finally spark.conf.set(k, old)
  }
}
