package graft

import org.apache.spark.sql.SparkSession

/** Scale audit over the whole driver contract: builds every
  * `SparkEntry.queries` physical plan (no execution) and reports, per
  * query, the number of shuffle exchanges, broadcast exchanges, and any
  * scale-hostile operator (CartesianProduct, unpartitioned Window,
  * single-partition global sort feeding a non-terminal op).
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir] [minShuffles]"` — prints a
  * TSV sorted by shuffle count, worst first. Iteration aid for keeping the
  * 100-TB plan shapes honest between rounds; PlanSpec pins the shapes this
  * audit has already driven to their minimum.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minShuffles = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // string-count over the plan tree text: AdaptiveSparkPlanExec exposes
    // no children to foreach/collect before execution, so node-type
    // traversal under AQE silently sees nothing
    def count(s: String, needle: String): Int = needle.r.findAllIn(s).size

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        val shuffles = count(s, "Exchange hashpartitioning") +
          count(s, "Exchange rangepartitioning") +
          count(s, "Exchange SinglePartition")
        val broadcasts = count(s, "BroadcastExchange")
        val hostile = Seq(
          if (s.contains("CartesianProduct")) Some("cartesian") else None,
          if (s.contains("windowspecdefinition()")) Some("global-window") else None
        ).flatten.mkString(",")
        Some((name, shuffles, broadcasts, hostile))
      } catch {
        case e: Throwable =>
          System.err.println(s"[audit] $name failed to plan: ${e.getMessage}")
          None
      } finally graft.operators.GlobalRank.releasePins()
    }

    println("query\tshuffles\tbroadcasts\thostile")
    rows.sortBy(-_._2).foreach { case (n, sh, bc, h) =>
      if (sh >= minShuffles) println(s"$n\t$sh\t$bc\t$h")
    }
    val total = rows.map(_._2).sum
    println(s"# ${rows.size} queries, $total total shuffle exchanges")
    spark.stop()
  }
}
