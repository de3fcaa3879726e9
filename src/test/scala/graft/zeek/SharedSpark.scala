package graft.zeek

import org.apache.spark.sql.SparkSession

/** One shared session for every suite. SPARK_GRAFT_TEST_MASTER overrides
  * the master — the cluster-credibility runs point it at
  * `local-cluster[2,8,4096]` (with SPARK_HOME + SPARK_SCALA_VERSION set)
  * so the suites execute against real executor JVMs: closure
  * serialization, block-manager fetch, broadcast transport, and — for
  * the streaming suites — state-store providers living in executors
  * instead of the driver's heap. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val master = sys.env.getOrElse("SPARK_GRAFT_TEST_MASTER", "local[4]")
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // executor JVMs launch from SPARK_HOME with only the Spark jars:
      // hand them the build's main classes, the TEST classes (suites
      // define UDFs whose closures deserialize on executors), and the
      // test-library jars from this JVM's own classpath (a closure that
      // captures its suite needs scalatest on the executor side too)
      val testClasses = new java.io.File(
        getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
      val libJars = System.getProperty("java.class.path")
        .split(java.io.File.pathSeparator)
        .filter(p => p.endsWith(".jar") && !p.contains("/opt/spark/jars"))
      val cp = (Seq(testClasses, graft.BenchEnv.classesDir) ++ libJars)
        .mkString(java.io.File.pathSeparator)
      b.config("spark.executor.extraClassPath", cp)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "4g"))
    }
    b.getOrCreate()
  }
}
