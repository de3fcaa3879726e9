package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance job every long-running
  * ingestion pipeline needs: streaming sinks and per-trigger batches
  * leave directories with thousands of KB-sized parquet files, and at
  * 100 TB the per-file open/footer overhead (and the driver's listing
  * memory) dominates scans long before the data does.
  *
  * [[compactParquet]] rewrites a directory into ~`targetFileBytes`
  * files: sized from the CURRENT on-disk bytes (no data pass to plan),
  * one round-robin repartition — or, when `sortCols` are given, a
  * range-partition + in-partition sort so min/max footer pruning
  * SURVIVES compaction (compacting a z-ordered or time-sorted layout
  * must not destroy its skipping property). The rewrite lands in a
  * temp directory and swaps in via two renames (old → .bak → delete),
  * so a crash mid-compaction never loses data — a reader may briefly
  * see the directory missing during the swap, the documented tradeoff
  * of format-less maintenance (a table-format transaction log is the
  * production upgrade; the rewrite plan is identical).
  */
object Compaction {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int,
    bytes: Long, partitions: Int)

  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[Column] = Nil): CompactionStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = fs.listStatus(path).filter { s =>
      !s.isDirectory && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")
    }
    val bytes = dataFiles.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.parquet(dir)
    val arranged =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)

    val tmp = new Path(path.getParent, s".${path.getName}.compact-tmp")
    val bak = new Path(path.getParent, s".${path.getName}.compact-bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    arranged.write.mode("overwrite").parquet(tmp.toString)

    if (!fs.rename(path, bak))
      throw new IllegalStateException(s"compaction: could not stage '$dir' aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // roll back: original data untouched
      throw new IllegalStateException(s"compaction: could not swap in rewrite of '$dir'")
    }
    fs.delete(bak, true)

    val after = fs.listStatus(path).count { s =>
      !s.isDirectory && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")
    }
    CompactionStats(dataFiles.length, after, bytes, n)
  }
}
