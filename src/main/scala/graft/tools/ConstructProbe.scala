package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement aid (optimization round): isolate the per-query
  * CONSTRUCTION floor — what `spark.read.parquet` pays per call for
  * file listing + footer schema inference, vs a user-supplied schema —
  * and the floor of a noop-write action itself. */
object ConstructProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-42s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    (1 to 3).foreach(_ => spark.read.parquet(s"$d/lineitem.parquet"))
    time("read.parquet lineitem x10 (infer)") {
      (1 to 10).foreach(_ => spark.read.parquet(s"$d/lineitem.parquet"))
    }
    val sch = spark.read.parquet(s"$d/lineitem.parquet").schema
    time("read.schema(s).parquet lineitem x10") {
      (1 to 10).foreach(_ => spark.read.schema(sch).parquet(s"$d/lineitem.parquet"))
    }
    (1 to 3).foreach(_ => spark.read.parquet(s"$d/nation.parquet"))
    time("read.parquet nation x10 (infer)") {
      (1 to 10).foreach(_ => spark.read.parquet(s"$d/nation.parquet"))
    }
    val sn = spark.read.parquet(s"$d/nation.parquet").schema
    time("read.schema(s).parquet nation x10") {
      (1 to 10).foreach(_ => spark.read.schema(sn).parquet(s"$d/nation.parquet"))
    }
    val one = spark.range(1)
    one.write.format("noop").mode("overwrite").save()
    time("noop write range(1) x10") {
      (1 to 10).foreach(_ => one.write.format("noop").mode("overwrite").save())
    }
    // a representative single-table contract query end to end, both ways
    time("q01 construct (Tables.lineitem) x10") {
      (1 to 10).foreach(_ => graft.SparkEntry.queries("q01_pricing_summary")(spark, d))
    }
    spark.stop()
  }
}
