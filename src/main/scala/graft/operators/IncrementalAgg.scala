package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance (materialized-view maintenance).
  *
  * Keeps a per-key state table of MERGEABLE aggregates — count, decimal
  * sum, min, max — and folds new batches into it without touching the
  * history: each `merge` aggregates ONLY the incoming batch (one
  * batch-sized shuffle) and full-outer-joins the partials onto the state
  * by key. Untouched state rows pass through the join unchanged.
  *
  * Scale shape: the state table is large (one row per key) but the
  * per-batch cost is proportional to the BATCH, not the history — the
  * exact property a 100 TB rollup needs (recomputing the view from raw
  * would re-scan everything). With the state persisted bucketed+sorted on
  * the key (see BucketingSpec), the merge join is a zero-shuffle
  * sort-merge join and each maintenance tick shuffles only the new data.
  *
  * The decimal sum keeps the merge exact and order-independent (double
  * accumulation would drift across merge orders); `avg_v` is derived at
  * read time, never stored — derived aggregates must always be computed
  * from mergeable primitives, or maintenance breaks.
  */
object IncrementalAgg {

  private val sumType = DecimalType(18, 2)

  /** Aggregate one batch into state-table form. */
  def init(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast(sumType)).cast(sumType).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Fold a new batch into existing state. */
  def merge(state: DataFrame, batch: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val b = init(batch, keys, valueCol)
      .withColumnRenamed("cnt", "b_cnt").withColumnRenamed("sum_v", "b_sum_v")
      .withColumnRenamed("min_v", "b_min_v").withColumnRenamed("max_v", "b_max_v")
    state.join(b, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("b_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_v"), lit(0).cast(sumType)) +
          coalesce(col("b_sum_v"), lit(0).cast(sumType))).cast(sumType).as("sum_v"),
        least(col("min_v"), col("b_min_v")).as("min_v"),
        greatest(col("max_v"), col("b_max_v")).as("max_v")): _*)
  }

  /** Read-time view over the state: derived aggregates computed from the
    * mergeable primitives. */
  def view(state: DataFrame): DataFrame =
    state.withColumn("avg_v", col("sum_v").cast(DoubleType) / col("cnt"))
}
