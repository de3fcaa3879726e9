package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-strategy helpers that stay safe at 100×.
  *
  * A bare `broadcast()` hint is never size-gated and AQE cannot
  * override it — on an SF-linear side it is a driver OOM waiting for
  * the data to grow (the round-7→8 q03/q05 lesson). Leaving the
  * decision entirely to AQE is safe but pays the shuffle-stage
  * scheduling cost even when the side is a few megabytes. The middle
  * path, mirroring what a CBO with fresh ANALYZE stats would decide:
  * consult the optimizer's own size estimate (file-size-based for
  * parquet scans — the same signal Spark's planner feeds
  * `spark.sql.autoBroadcastJoinThreshold`) and apply the hint ONLY
  * when the estimate fits the session threshold. The gate closes by
  * itself as the data grows — small SF gets the zero-shuffle broadcast
  * plan, big SF degrades to shuffle joins that cannot OOM. */
object Joins {

  /** Broadcast `df` iff its estimated size fits the session's
    * `autoBroadcastJoinThreshold` (≤ 0 disables, like Spark).
    *
    * `sizeProxies` substitutes the frames whose SCAN-LEVEL estimates
    * bound the hinted side, for plans whose own estimate is unusable:
    * without CBO the optimizer's join-output estimate is the PRODUCT
    * of the children's byte sizes (vastly over threshold even for tiny
    * joins — the reason Spark itself never auto-broadcasts above a
    * join). For an inner FK join `fact ⋈ dim` each fact row matches at
    * most one dim row, so `size(fact) + size(dim)` bounds the output
    * payload and both scans estimate honestly from file sizes — pass
    * the join's inputs as proxies. Estimates stay SF-linear either
    * way, so the gate still closes as data grows. */
  def broadcastIfSmall(df: DataFrame, sizeProxies: DataFrame*): DataFrame = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return df
    val probes = if (sizeProxies.isEmpty) Seq(df) else sizeProxies
    val estimate = probes.map(_.queryExecution.optimizedPlan.stats.sizeInBytes).sum
    if (estimate <= threshold) broadcast(df) else df
  }
}
