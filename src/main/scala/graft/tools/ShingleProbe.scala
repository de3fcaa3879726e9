package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.Tables

/** A/B probe for the native `shingles` expression vs the Scala-UDF
  * formulation it replaced, on the d15 decontamination shape (the one
  * path that explodes the FULL corpus through the shingler). Both
  * variants run in ONE session with Bench's config, alternating, 3
  * passes each — per the A/B discipline (a config mismatch between
  * sides burned a round-9 rework).
  *
  * Usage: runMain graft.tools.ShingleProbe <sfDir>
  */
object ShingleProbe {

  /** contaminationPairs body with the ORIGINAL per-row UDF shingler —
    * kept verbatim for the A/B; the shipped path is Dedup.shinglesCol. */
  private def contaminationPairsUdf(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, shingleSize: Int, minShared: Int): DataFrame = {
    val sh = udf((t: String) => if (t == null) null else Dedup.shingles(t, shingleSize))
    val c = corpus.select(col(idCol).as("corpus_id"), explode(sh(col(textCol))).as("s"))
    val e = evalSet.select(col(idCol).as("eval_id"), explode(sh(col(textCol))).as("s"))
    c.join(broadcast(e), "s")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = graft.BenchEnv.shufflePartitions(cpus.toInt, sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the exact d15 shape (PipelineQueries "d15_decontaminate"):
    // corpus = doc_id >= 20, eval set = doc_id < 20
    def docs() = Tables.documents(spark, sfDir)
    def native() = Dedup.contaminationPairs(
      docs().filter(col("doc_id") >= 20), docs().filter(col("doc_id") < 20),
      "doc_id", "text", 2, 3)
    def viaUdf() = contaminationPairsUdf(
      docs().filter(col("doc_id") >= 20), docs().filter(col("doc_id") < 20),
      "doc_id", "text", 2, 3)

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes (codegen + JIT) before timing
    time(native); time(viaUdf)
    val (n, u) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to 3).foreach { _ => n += time(native); u += time(viaUdf) }
    val (nm, um) = (n.result().min, u.result().min)
    println(f"SHINGLEPROBE sf=$sfDir native_min=$nm%.2f udf_min=$um%.2f speedup=${um / nm}%.2fx")
    // sanity: identical result sets
    val diff = native().exceptAll(viaUdf()).count() + viaUdf().exceptAll(native()).count()
    println(s"SHINGLEPROBE result_diff_rows=$diff")
    spark.stop()
  }
}
