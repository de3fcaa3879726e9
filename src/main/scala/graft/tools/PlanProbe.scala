package graft.tools

/** Plan-audit aid: print the executed physical plan of named contract
  * queries against a given SF dir, under the same session config the
  * bench uses. The fast feedback loop for "is this the plan you'd want
  * at 100×" — broadcast placement, exchange count, Expand presence,
  * pushed filters — without timing a run.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <query>...
  *
  * SPARK_GRAFT_PLAN_DIR=<dir>: additionally write each query's
  * `explain("formatted")` text to <dir>/<query>.txt — the audit
  * artifact format (plans/rN/<query>_{before,after}.txt). The session
  * mirrors Bench's data-adaptive shuffle sizing so the captured plans
  * are the ones the bench actually runs.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q01_pricing_summary")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.BenchEnv.sessionBuilder(dir, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    planDir.foreach(p => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p)))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      planDir match {
        case Some(p) =>
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(java.nio.file.Paths.get(p, s"$n.txt"), txt)
          println(s"wrote $p/$n.txt")
        case None =>
          println(s"=== $n ===")
          println(df.queryExecution.executedPlan.toString)
      }
    }
  }
}
