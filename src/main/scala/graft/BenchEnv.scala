package graft

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
}
