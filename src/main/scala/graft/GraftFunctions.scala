package graft

import org.apache.spark.sql.SparkSession

/** One-call registration of every graft SQL function family:
  * inet (normalize / CIDR containment / family predicates),
  * vector expressions (cosine_sim / dot_product / l2_distance),
  * and typed UDAFs (sum_sq). For per-cluster deployment of the
  * expression-backed subset, see [[GraftExtensions]]. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    graft.inet.InetFunctions.registerAll(spark)
    graft.functions.VectorExpressions.registerAll(spark)
    graft.functions.Udafs.registerAll(spark)
    graft.functions.BloomFunctions.registerAll(spark)
    graft.functions.SketchExpressions.registerAll(spark)
    graft.functions.HilbertIndex2.registerAll(spark)
    graft.functions.StringSimilarity.registerAll(spark)
    graft.functions.TextNormalize.registerAll(spark)
  }
}
