package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hamilton largest-remainder apportionment: split an exact total of
  * `n` seats across groups proportionally to an integer weight column —
  * the exact-N materialization step of temperature-based source mixing
  * (d44), quota sampling, and shard sizing.
  *
  * All arithmetic is integer (base = n·w div W, seats by largest
  * n·w mod W with group-ascending tiebreak), so the result is a pure
  * function of the weights — bit-identical across engines, replayable
  * in ANSI SQL. Guarantees: Σquota = n exactly (when n ≥ 0 and W > 0)
  * and |quota − n·w/W| < 1 for every group (the Hamilton property).
  *
  * Scale: runs entirely on the groups-sized table — two tiny aggregates
  * and one window over #groups rows; callers broadcast the result
  * against the fact table. The group-count table is dimension-sized by
  * construction (sources, tenants, shards), so the unpartitioned
  * window is bounded. */
object Apportion {

  /** Adds a `quota` column to `groups` (key column `keyCol`, integer
    * weight column `wCol`) such that quotas sum to exactly `n`. */
  def largestRemainder(groups: DataFrame, keyCol: String, wCol: String,
      n: Long): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    val tot = groups.agg(sum(col(wCol)).as("__tw"))
    val quotas = groups.crossJoin(broadcast(tot))
      .withColumn("__base", expr(s"($n * $wCol) div __tw"))
      .withColumn("__rem", expr(s"($n * $wCol) % __tw"))
    val used = quotas.agg(sum(col("__base")).as("__used"))
    quotas.crossJoin(broadcast(used))
      .withColumn("__rrank",
        row_number().over(Window.orderBy(col("__rem").desc, col(keyCol))))
      .withColumn("quota",
        col("__base") + when(col("__rrank") <= lit(n) - col("__used"), 1L)
          .otherwise(0L))
      .drop("__tw", "__base", "__rem", "__used", "__rrank")
  }
}
