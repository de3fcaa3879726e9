package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The q05 "remaining shuffle" experiment (round-10 ask): can the big
  * lineitem⋈orders join be fed less data at scale?
  *
  * Three mechanisms, measured separately at a given SF dir:
  *
  *  1. `scanprobe` — parquet row-group (zone-map) pruning with a
  *     PUSHABLE static predicate over a SORTED vs UNSORTED lineitem
  *     copy: proves the min/max machinery works when the predicate
  *     reaches the footer, and quantifies the decode savings.
  *  2. `bloom` — Spark's runtime Bloom filter on q05 itself, with the
  *     two gating thresholds opened
  *     (`spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`,
  *     default 10 MB — oc EXCEEDS it; and
  *     `…applicationSideScanSizeThreshold`, default 10 GB — local
  *     lineitem is UNDER it). Even when injected, might_contain is not
  *     a footer-pushable predicate: it reduces rows entering the
  *     shuffle, not bytes read from parquet.
  *  3. `bucketed` — the co-location answer: lineitem and orders
  *     bucketed on the order key bucket-SMJ with ZERO exchange on the
  *     fact side; `reorder` times the same join shape unbucketed so the
  *     delta isolates bucketing from join order.
  *
  * Usage:
  *   runMain graft.tools.Q05Prune prep <sfDir> <workDir>
  *   runMain graft.tools.Q05Prune run  <sfDir> <workDir> <variant>
  * with variant ∈ base | bloom | reorder | bucketed | scanprobe.
  * Every `run` uses Bench's exact session config (AQE on, data-sized
  * shuffle partitions) — the A/B rule — except scanprobe, which turns
  * AQE off so the leaf FileSourceScanExec metrics are reachable.
  */
object Q05Prune {

  private def session(sfDir: String, aqe: Boolean, extra: Map[String, String]): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = graft.BenchEnv.shufflePartitions(cpus.toInt, sfDir)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  /** q05's shipped shape (CoreQueries), so variants diff only in config. */
  private def q05(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q05_local_supplier")(s, d)

  /** The lineitem⋈orders-first shape: the fact join runs before any
    * dimension shuffle, so bucketing both facts on the order key makes
    * it exchange-free. Semantically identical to q05. */
  private def q05Reordered(s: SparkSession, l: DataFrame, o: DataFrame, d: String): DataFrame = {
    import graft.queries.Tables
    val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d).join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
    val c = Tables.customer(s, d).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    val sup = graft.operators.Joins.broadcastIfSmall(Tables.supplier(s, d))
    val revenueUnits =
      graft.functions.ExactSum.cents(col("l_extendedprice"), 2) *
        (lit(100L) - graft.functions.ExactSum.cents(col("l_discount"), 2))
    val lo = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey"), revenueUnits.as("units"))
    lo.join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === sup("s_suppkey") &&
        sup("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(graft.functions.ExactSum.sumUnits(col("units"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private def time3(run: () => Unit): Double = {
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val work = args(2)

    if (mode == "prep") {
      val spark = session(sfDir, aqe = true,
        Map("spark.sql.warehouse.dir" -> s"$work/warehouse"))
      spark.sparkContext.setLogLevel("WARN")
      // sorted lineitem copy (range-partitioned + sorted within → every
      // parquet row group covers a narrow l_orderkey band)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.repartitionByRange(32, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$work/lineitem_sorted.parquet")
      // bucketed facts (64 buckets on the order key, both sides)
      spark.sql("DROP TABLE IF EXISTS q05_l")
      spark.sql("DROP TABLE IF EXISTS q05_o")
      li.write.bucketBy(64, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("q05_l")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.bucketBy(64, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("q05_o")
      println("PREP done")
      spark.stop()
      return
    }

    val variant = args(3)
    val bloomOpen = Map(
      // open both gates that block injection locally (defaults: 10 MB /
      // 10 GB); values chosen so sf10's oc (~hundreds of MB) creates and
      // sf10's lineitem (~1.4 GB scan) applies
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "4g",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "16m") ++
      // bloom2: ALSO open the item-count gates (defaults 4M max / 1M
      // expected — sf10's orders side estimates ~15M rows)
      (if (variant == "bloom2") Map(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> "32000000",
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems" -> "16000000",
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> "268435456")
      else Map.empty)

    variant match {
      case "base" | "bloom" | "bloom2" =>
        val spark = session(sfDir, aqe = true,
          if (variant.startsWith("bloom")) bloomOpen else Map.empty)
        spark.sparkContext.setLogLevel("WARN")
        q05(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
        val secs = time3(() =>
          q05(spark, sfDir).write.format("noop").mode("overwrite").save())
        val plan = {
          val df = q05(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          df.queryExecution.executedPlan.toString
        }
        val injected = plan.contains("might_contain")
        println(f"RESULT variant=$variant min_sec=$secs%.2f bloom_injected=$injected")
        spark.stop()

      case "reorder" | "bucketed" =>
        val spark = session(sfDir, aqe = true,
          Map("spark.sql.warehouse.dir" -> s"$work/warehouse"))
        spark.sparkContext.setLogLevel("WARN")
        // prep's in-memory catalog dies with its JVM; re-declare the
        // bucketed layout over the files it wrote (bucket spec + sort
        // order are a TABLE property, not a file property)
        def ensureBucketed(name: String, key: String): Unit =
          graft.operators.Bucketing.declareBucketed(
            spark, name, s"$work/warehouse/$name", key, 64)
        def frames(): (DataFrame, DataFrame) =
          if (variant == "bucketed") {
            ensureBucketed("q05_l", "l_orderkey")
            ensureBucketed("q05_o", "o_orderkey")
            (spark.table("q05_l"), spark.table("q05_o"))
          } else (spark.read.parquet(s"$sfDir/lineitem.parquet"),
            spark.read.parquet(s"$sfDir/orders.parquet"))
        val (l, o) = frames()
        val df0 = q05Reordered(spark, l, o, sfDir)
        df0.write.format("noop").mode("overwrite").save() // warm
        val secs = time3(() =>
          q05Reordered(spark, frames()._1, frames()._2, sfDir)
            .write.format("noop").mode("overwrite").save())
        val plan = df0.queryExecution.executedPlan.toString
        val loExchanges = "Exchange hashpartitioning\\(l_orderkey".r
          .findAllIn(plan).size + "Exchange hashpartitioning\\(o_orderkey".r
          .findAllIn(plan).size
        println(f"RESULT variant=$variant min_sec=$secs%.2f orderkey_exchanges=$loExchanges")
        spark.stop()

      case "scanprobe" =>
        // AQE off: leaf scan metrics must be reachable on the executed plan
        val spark = session(sfDir, aqe = false, Map.empty)
        spark.sparkContext.setLogLevel("WARN")
        def probe(path: String, label: String): Unit = {
          def mk() = spark.read.parquet(path)
            .filter(col("l_orderkey").between(1000000L, 1100000L))
            .agg(sum(col("l_quantity")).as("q"))
          mk().collect() // warm
          val secs = time3(() => mk().collect(): Unit)
          val metricDf = mk() // fresh frame: metrics from exactly one run
          metricDf.collect()
          val scans = metricDf.queryExecution.executedPlan.collect {
            case f: FileSourceScanExec => f }
          val scanRows = scans.map(_.metrics("numOutputRows").value).sum
          val pushed = scans.headOption
            .map(_.metadata.getOrElse("PushedFilters", "")).getOrElse("")
          println(f"RESULT variant=scanprobe:$label min_sec=$secs%.3f scan_rows=$scanRows pushed=$pushed")
        }
        probe(s"$sfDir/lineitem.parquet", "unsorted")
        probe(s"$work/lineitem_sorted.parquet", "sorted")
        spark.stop()

      case other => sys.error(s"unknown variant $other")
    }
  }
}
