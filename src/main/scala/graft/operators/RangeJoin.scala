package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join (point-in-interval).
  *
  * Spark plans a `point BETWEEN lo AND hi` join as a
  * BroadcastNestedLoopJoin — every point compared against every
  * interval. This operator makes it an equi-join: intervals explode onto
  * the fixed-width buckets they overlap, points hash to their single
  * bucket, the join keys on the bucket, and the exact BETWEEN remains as
  * a residual filter. Candidate pairs shrink from |points| × |intervals|
  * to |points| + |intervals| × (span/width), and the shuffle keys on the
  * bucket — the standard trick a 100 TB interval join needs.
  *
  * `bucketWidth` trades interval fan-out (≈ span/width buckets per
  * interval) against candidate precision (points per bucket); a width
  * near the median interval span is a good default.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * `[loCol, hiCol]` contains `pointCol`. All other columns of both
    * sides pass through. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("__bucket", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
