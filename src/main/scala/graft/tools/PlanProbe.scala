package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit aid: print the executed physical plan of named contract
  * queries against a given SF dir, under the same session config the
  * bench uses. The fast feedback loop for "is this the plan you'd want
  * at 100×" — broadcast placement, exchange count, Expand presence,
  * pushed filters — without timing a run.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <query>...
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q01_pricing_summary")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n ===")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
    }
  }
}
