package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage control for reused subplans in iterative queries.
  *
  * A DataFrame referenced k times in a query plan is PLANNED k times, and
  * — because AQE's stage-reuse cache only deduplicates exchanges whose
  * canonical subtrees are identical all the way down to the scan — a
  * multi-round loop (BFS expansion, label propagation, beam search) whose
  * per-round state embeds the previous round re-executes the expensive
  * producer (an edge-list self-join, a kNN graph build) once per round:
  * q137's 3-round reach expansion planned ~100 parquet scans and measured
  * <20% exchange reuse at runtime before cutting.
  *
  * `cut` materializes the frame once (lineage truncated to an RDD scan)
  * so every later reference reads the materialized data. Two fabrics:
  * local (eager `localCheckpoint` — executor memory/disk blocks, which
  * survive task retries but NOT executor loss) and reliable (eager
  * `checkpoint()` to the configured checkpoint directory, surviving
  * executor loss). The no-arg `cut` auto-selects reliable whenever
  * `sparkContext.setCheckpointDir` has been called, so a 100-TB job
  * opts every iterative family into failure-tolerant materialization
  * with one session-setup line. The cut is semantically invisible:
  * values, schema, and determinism are unchanged in both modes.
  */
object Lineage {
  /** When true, [[cut]] records the executed plan of every frame it
    * materializes (see [[recordedPlans]]). Plan-pinning tests flip this
    * on so shapes that execute INSIDE a cut — invisible in the final
    * query plan, which sees only the checkpoint scan — stay assertable.
    * Off by default: production runs skip the string building. */
  @volatile var recordPlans: Boolean = false
  private val recorded = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Plans materialized by [[cut]] since [[clearRecordedPlans]] (empty
    * unless [[recordPlans]] is on). */
  def recordedPlans: Seq[String] = {
    val b = Seq.newBuilder[String]
    recorded.forEach(p => b += p)
    b.result()
  }
  def clearRecordedPlans(): Unit = recorded.clear()

  /** Materialize `df` and truncate its lineage; returns the checkpointed
    * frame. Call on any frame a loop or multi-branch query references
    * more than once when its producer is more than a scan.
    *
    * `reliable = false` → eager `localCheckpoint` (executor memory/disk
    * blocks; fast, but blocks die with their executor).
    * `reliable = true`  → eager `checkpoint()` to the session's
    * configured checkpoint directory (HDFS/object store on a real
    * cluster), which survives executor loss — the mode a 100-TB job
    * that cannot afford recomputation-on-loss selects by calling
    * `spark.sparkContext.setCheckpointDir(...)` up front. Values,
    * schema, and determinism are identical in both modes
    * (`LineageSpec` proves it); only the storage fabric differs. */
  def cut(df: DataFrame, reliable: Boolean): DataFrame = {
    if (recordPlans) recorded.add(df.queryExecution.executedPlan.toString)
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** [[cut]] with the mode auto-selected from session state: reliable
    * whenever a checkpoint directory is configured, local otherwise.
    * Every iterative family (PageRank, Triangles, beam search, the ANN
    * graph builds) cuts through here, so pointing
    * `sparkContext.setCheckpointDir` at reliable storage upgrades all
    * of them to failure-tolerant materialization with no code change. */
  def cut(df: DataFrame): DataFrame =
    cut(df, reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined)

  /** Deterministically drop every persisted RDD in the session — the
    * release point a long single-session sweep (Verify's 281 queries,
    * Bench's timed passes) calls BETWEEN queries so checkpoint blocks
    * from one query never pressure the block manager during the next.
    * Safe there because no query's frames survive its own run; do NOT
    * call mid-query (a cut frame's blocks are its only data — lineage
    * is truncated, so unpersisting it is unrecoverable). GC-driven
    * ContextCleaner remains the fallback for interactive use. */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
}
