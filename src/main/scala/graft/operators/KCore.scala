package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling: iteratively remove nodes whose degree
  * falls below `k` until the round budget is spent — the standard
  * density filter for community detection, spam/bot subgraph mining and
  * graph sparsification, completing the iterative-graph family next to
  * [[PageRank]], [[ShortestPaths]] and [[Triangles]].
  *
  * Degrees are INTEGERS and each round is a pure function of the edge
  * set, so the whole peel is bit-identical across engines; the driver's
  * DuckDB oracle replays the identical rounds as unrolled CTEs.
  *
  * Scale design (100 TB): each round is ONE degree aggregate (map-side
  * partial count on the node key) plus TWO semi-joins of the edge list
  * against the shrinking alive set — no window, no collect, driver
  * state is zero. The alive set only ever shrinks, so per-round work is
  * monotonically non-increasing; lineage is cut with `localCheckpoint`
  * every few rounds (the [[ShortestPaths]] recipe). A fixed round
  * budget bounds the job count; full convergence (rounds = graph depth)
  * is the caller's loop-until-fixpoint on top.
  */
object KCore {

  /** Peel a SYMMETRIC edge list (`s`, `t` columns; both directions
    * present) for `rounds` rounds at degree threshold `k`. Returns
    * (node, in_core, deg_final) for EVERY node of the input graph:
    * survivors carry their degree in the edge set that entered the last
    * round; peeled nodes carry in_core = 0 and deg_final = 0. */
  def peel(symEdges: DataFrame, k: Int, rounds: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // materialize the symmetrized base once: every round (and the node
    // roll-up) re-reads it, and the peel chain must not re-derive it.
    // NOT cutPartitionedBy: declaring hash(s) here was MEASURED WORSE
    // (q128 sf0.1 task time 56 s -> 103 s) — the declared layout removes
    // the exchanges that double as AQE re-optimization points in the
    // lazy 4-round semi-join chain, so the alive sides stay
    // SortMergeJoin instead of converting to runtime broadcasts. The
    // declared cut helps loops whose rounds each materialize (PageRank,
    // hyperball), not a lazily-chained peel.
    var sym = symEdges.select(col("s"), col("t")).localCheckpoint()
    // the node roll-up reads the CUT frame: deriving it from the raw
    // symEdges replayed the caller's whole edge derivation (q128's
    // co-purchase self-join appeared twice in the final plan — half its
    // 56 s sf0.1 task time was that replay)
    val nodes = sym.select(col("s").as("node")).distinct()
    var lastDeg: DataFrame = null
    for (r <- 1 to rounds) {
      val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("c"))
      lastDeg = deg
      val alive = deg.filter(col("c") >= k).select(col("s"))
      sym = sym.join(alive, Seq("s"), "left_semi")
        .join(alive.withColumnRenamed("s", "t"), Seq("t"), "left_semi")
        .select(col("s"), col("t"))
      if (r % checkpointEvery == 0 && r < rounds) sym = sym.localCheckpoint()
    }
    val surv = lastDeg.filter(col("c") >= k)
      .select(col("s").as("node"), col("c").as("deg_final"))
    nodes.join(surv, Seq("node"), "left")
      .select(col("node"),
        when(col("deg_final").isNotNull, 1).otherwise(0).as("in_core"),
        coalesce(col("deg_final"), lit(0L)).as("deg_final"))
  }
}
