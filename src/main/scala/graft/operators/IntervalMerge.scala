package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge overlapping-or-touching intervals per key (gaps-and-islands):
  * the coverage primitive behind session coalescing, on-call coverage,
  * IP-lease consolidation, and retention-window math.
  *
  * Classic cumulative-max formulation: within each key, order by
  * (start, end); an interval starts a new island iff its start lies
  * strictly beyond the running max end of everything before it (so
  * back-to-back intervals where `start == prev end` MERGE — intervals
  * are treated as `[start, end)`). Island id = running count of island
  * starts; one group-by per island yields the merged span.
  *
  * Scale shape: exactly ONE hash shuffle on the key — the window sorts
  * within partitions, and the island group-by clusters on
  * (key, island), a superset of the window's partitioning, so Spark
  * reuses the exchange. No joins, no driver state; 100 TB of intervals
  * stream through a single exchange.
  */
object IntervalMerge {

  /** Returns one row per merged interval: `partitionCols`, the merged
    * `startCol`/`endCol` bounds, and `n_merged` (source intervals it
    * absorbed). Rows with a NULL bound are dropped (an interval without
    * both bounds has no coverage semantics). */
  def merge(df: DataFrame, partitionCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val pcols = partitionCols.map(col)
    val ord = Window.partitionBy(pcols: _*).orderBy(col(startCol), col(endCol))
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__prev_max_end",
        max(col(endCol)).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new_island",
        when(col("__prev_max_end").isNull || col(startCol) > col("__prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((pcols :+ col("__island")): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
