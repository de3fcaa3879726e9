package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration aid: time ad-hoc SQL against an SF dir's tables.
  *
  *   sbt "runMain graft.tools.TimeSql <sfDir> <passes> <sql> [<sql>...]"
  *
  * Each SQL runs `passes` times against registered temp views of the
  * standard tables; prints per-statement min/median seconds. Results go
  * to the noop sink so final sorts/projects aren't optimized away. */
object TimeSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val sqls = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists)
        spark.read.parquet(p).createOrReplaceTempView(t)
    }
    sqls.zipWithIndex.foreach { case (q, qi) =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(q).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[$qi] min=${times.head}%.2f med=${times(times.length / 2)}%.2f  ${q.linesIterator.next().take(100)}")
    }
    spark.stop()
  }
}
