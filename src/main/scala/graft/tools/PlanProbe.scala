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
  *
  * SPARK_GRAFT_PLAN_CUTS=1: append the executed plan of every
  * [[graft.operators.Lineage]] cut the query materialized while being
  * built. Iterative queries do their real work INSIDE cuts (the final
  * plan sees only checkpoint scans), so per-round exchange/join claims
  * are only auditable with this on. Note the final plan is the cheap
  * lazy one here, but cut plans are EXECUTED plans — building the
  * query materializes each round.
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
    val withCuts = sys.env.get("SPARK_GRAFT_PLAN_CUTS").contains("1")
    if (withCuts) graft.operators.Lineage.recordPlans = true
    names.foreach { n =>
      graft.operators.Lineage.clearRecordedPlans()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      def cutsSuffix: String =
        if (!withCuts) ""
        else graft.operators.Lineage.recordedPlans.zipWithIndex
          .map { case (p, i) => s"\n\n=== cut $i (executed) ===\n$p" }.mkString
      planDir match {
        case Some(p) =>
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(java.nio.file.Paths.get(p, s"$n.txt"),
            txt + cutsSuffix)
          println(s"wrote $p/$n.txt")
        case None =>
          println(s"=== $n ===")
          println(df.queryExecution.executedPlan.toString + cutsSuffix)
      }
      graft.operators.GlobalRank.releasePins()
      graft.operators.Lineage.releaseAll(spark, alsoCheckpoints = true)
    }
  }
}
