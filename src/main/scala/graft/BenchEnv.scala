package graft

import org.apache.spark.sql.SparkSession

/** Shared harness plumbing for the Verify/Bench mains. */
object BenchEnv {
  /** Directory (or jar) this build's classes load from — handed to
    * `spark.executor.extraClassPath` in local-cluster mode, where
    * executor JVMs are launched from SPARK_HOME and otherwise see only
    * the Spark jars. All processes share one machine, so a plain
    * filesystem path is enough (no jar shipping needed). */
  def classesDir: String = {
    val src = getClass.getProtectionDomain.getCodeSource
    require(src != null && src.getLocation != null,
      "cannot locate graft classes for executor classpath")
    new java.io.File(src.getLocation.toURI).getAbsolutePath
  }

  /** Total bytes of regular files under a data dir — the input-size
    * signal for the data-adaptive shuffle-partition formula. */
  def dataBytes(dir: String): Long =
    try {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    } catch { case _: Exception => 0L }

  /** Shuffle partitions sized to the DATA, the way a real deployment
    * sizes them to cluster+input: ~32 MB of source parquet per
    * partition, floored at 8 (tiny-SF tasks; measured ~25% total win at
    * 8 vs 32 at sf0.1) and capped at the core count (a fixed small
    * count silently caps every big shuffle: shuffle=8 at sf10 left 3/4
    * of the cores idle — 32 took the headline 219 s → 186 s).
    * SPARK_GRAFT_SHUFFLE overrides for experiments. */
  def shufflePartitions(cpus: Int, dir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.min(cpus, math.max(8L, dataBytes(dir) / (32L << 20)).toInt).toString)

  /** THE bench session config, env-parameterized — shared by
    * `graft.Bench` and the measurement tools (BenchProfile, PlanProbe)
    * so that profiled task metrics and captured plan artifacts come
    * from exactly the session the bench runs; the three previously
    * carried hand-copied builders that had already drifted (PlanProbe
    * ignored SPARK_GRAFT_MASTER and both tools lacked the
    * local-cluster executor classpath/memory branch).
    *
    * Conf rationale (measured, see Bench scaladoc + BASELINE.md):
    *   - files.minPartitionNum = cores: scan-parallelism FLOOR, inert
    *     at 100-TB scale and at tiny SFs, matters for sf1/sf10 scans;
    *   - AQE coalesce minPartitionSize 64k: the default 1 MB floor let
    *     parallelism-first coalescing fold CPU-dense small stages
    *     (signature banding, pair verify) to a single task;
    *   - cleanCheckpoints: GC-driven fallback for reliable-checkpoint
    *     file cleanup (deterministic path is Lineage.releaseAll). */
  def sessionBuilder(sfDir: String, cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions(cpus.toInt, sfDir))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_MINPART", cpus))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MINPART", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    if (master.startsWith("local-cluster"))
      b.config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "6g"))
    else b
  }
}
