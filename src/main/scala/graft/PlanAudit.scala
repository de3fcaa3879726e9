package graft

import org.apache.spark.sql.SparkSession

/** Scale audit over the whole driver contract: builds every
  * `SparkEntry.queries` physical plan — no action is run on the result,
  * though CONSTRUCTION itself executes any eager lineage-cut segments
  * ([[graft.operators.Lineage.cut]] is an eager localCheckpoint, so
  * cut-containing queries like q137 run their producer jobs at build
  * time) — and reports, per query, the number of shuffle exchanges,
  * broadcast exchanges, and any scale-hostile operator
  * (CartesianProduct, unpartitioned Window, single-partition global
  * sort feeding a non-terminal op).
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir] [minShuffles]"` — prints a
  * TSV sorted by shuffle count, worst first. Iteration aid for keeping the
  * 100-TB plan shapes honest between rounds; PlanSpec pins the shapes this
  * audit has already driven to their minimum.
  *
  * `sbt "runMain graft.PlanAudit <sfDir> exec <name>[,<name>…]"` EXECUTES
  * the named queries and reports the post-execution adaptive plan's
  * counts — under AQE the static plan never shows `ReusedExchange`; only
  * the final plan reveals which repeated subtrees the runtime actually
  * deduplicated into reused shuffle stages.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val execNames: Seq[String] =
      if (args.length >= 3 && args(1) == "exec") args(2).split(",").toSeq else Nil
    val minShuffles =
      if (execNames.nonEmpty) 0
      else args.drop(1).headOption.map(_.toInt).getOrElse(0)
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

    if (execNames.nonEmpty) {
      for (name <- execNames) {
        // time from construction: eager lineage cuts (Lineage.cut) run
        // jobs while the query is BUILT, before any action on the result
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        // execute THIS df's QueryExecution without materializing rows on
        // the driver — df.count()/noop-write would build (and execute) a
        // DIFFERENT QueryExecution, leaving the inspected plan cold, and
        // collect() could exhaust driver memory on large results
        val n = df.queryExecution.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val s = df.queryExecution.executedPlan.toString
        val shuffles = count(s, "Exchange hashpartitioning") +
          count(s, "Exchange rangepartitioning") + count(s, "Exchange SinglePartition")
        println(f"$name\trows=$n\t$secs%.2f s\tshuffles=$shuffles\t" +
          s"reused=${count(s, "ReusedExchange")}\tscans=${count(s, "Scan parquet")}")
        graft.operators.GlobalRank.releasePins()
        graft.operators.Lineage.releaseAll(spark)
      }
      spark.stop()
      return
    }

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        val shuffles = count(s, "Exchange hashpartitioning") +
          count(s, "Exchange rangepartitioning") +
          count(s, "Exchange SinglePartition")
        val broadcasts = count(s, "BroadcastExchange")
        val reused = count(s, "ReusedExchange")
        val scans = count(s, "Scan parquet") + count(s, "LocalTableScan") +
          count(s, "Scan ExistingRDD")
        val hostile = Seq(
          if (s.contains("CartesianProduct")) Some("cartesian") else None,
          if (s.contains("windowspecdefinition()")) Some("global-window") else None
        ).flatten.mkString(",")
        Some((name, shuffles, broadcasts, reused, scans, hostile))
      } catch {
        case e: Throwable =>
          System.err.println(s"[audit] $name failed to plan: ${e.getMessage}")
          None
      } finally {
        graft.operators.GlobalRank.releasePins()
        graft.operators.Lineage.releaseAll(spark)
      }
    }

    println("query\tshuffles\tbroadcasts\treused\tscans\thostile")
    rows.sortBy(-_._2).foreach { case (n, sh, bc, re, sc, h) =>
      if (sh >= minShuffles) println(s"$n\t$sh\t$bc\t$re\t$sc\t$h")
    }
    val total = rows.map(_._2).sum
    println(s"# ${rows.size} queries, $total total shuffle exchanges")
    spark.stop()
  }
}
