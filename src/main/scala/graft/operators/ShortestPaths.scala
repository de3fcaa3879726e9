package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round multi-source BFS: unweighted shortest-path hop
  * distances from a seed set over an edge list — the reachability /
  * blast-radius operator class (supply-chain exposure, fraud-ring
  * radius, link distance for crawl scheduling) completing the
  * iterative-graph family next to [[PageRank]],
  * [[graft.dedup.DedupClusters]] and [[Triangles]].
  *
  * Distances are INTEGERS, so every round is a pure function of the
  * graph — bit-identical across engines and partial-aggregation orders;
  * the driver's DuckDB oracle replays the identical rounds as unrolled
  * CTEs and hash-matches.
  *
  * Scale design (100 TB): propagation is FRONTIER-based. With unit
  * weights a node's first discovery is final, so each round expands
  * only the nodes discovered in the previous round — one equi-join of
  * the frontier with the edge list (keyed on the node id, AQE-sized)
  * plus one anti-join against the settled set. Work per round is
  * O(frontier adjacency), not O(V); total work is O(E) across all
  * rounds, the textbook BFS bound. Lineage is cut with
  * `localCheckpoint` every few rounds (the [[graft.dedup.DedupClusters]]
  * recipe) so long walks don't accumulate a plan per round.
  */
object ShortestPaths {

  /** Hop distances from `sources` (a `node` column) over directed edges
    * (`src`, `dst` columns), bounded at `rounds` hops. Returns
    * (node, dist) for every node reached within the bound; unreached
    * nodes are absent (callers left-join if they need infinity rows).
    * For undirected graphs pass a symmetrized edge list. */
  def bfsDistances(edges: DataFrame, sources: DataFrame, rounds: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // cut: every round's expansion joins the same edge list, and the
    // caller's edge derivation can be expensive (q127 builds it from a
    // 4-column lead window over orders) — uncut it replayed per round.
    // DECLARED hash(src): each round's frontier join reads the edges
    // co-partitioned (the PageRank treatment; rounds materialize here)
    val e = Lineage.cutPartitionedBy(edges.select(col("src"), col("dst")), Seq("src"))
    var settled = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
    var frontier = settled.select("node")
    for (r <- 1 to rounds) {
      // neighbors of the current frontier not yet settled = distance r.
      // cut: `discovered` feeds BOTH next round's frontier and the
      // settled union — uncut, later rounds replayed it per reference
      val discovered = Lineage.cut(frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled.select("node"), Seq("node"), "left_anti"))
      frontier = discovered
      settled = settled.union(discovered.withColumn("dist", lit(r.toLong)))
      if (r % checkpointEvery == 0 && r < rounds) settled = settled.localCheckpoint()
    }
    settled
  }

  /** Bounded-round WEIGHTED shortest paths (min-plus Bellman-Ford) from
    * `sources` (a `node` column) over directed edges (`src`, `dst`, `w`
    * columns, non-negative integer weights), relaxed for `rounds`
    * rounds: after round r, `dist` is the exact minimum weight over all
    * paths of at most r edges — bit-identical in any engine because
    * every distance is integer arithmetic under min.
    *
    * Scale design: propagation is DELTA-based (the frontier analogue for
    * weighted graphs). Only nodes whose distance IMPROVED in the
    * previous round re-propagate — a node's earlier relaxations already
    * reached its neighbors, so re-sending unchanged distances is pure
    * waste; this is the standard delta-stepping-style pruning and yields
    * the same per-round distances as full Bellman-Ford (candidates
    * omitted are exactly those already applied, and min is monotone).
    * Each round is one frontier∖edge equi-join, one map-combined min
    * aggregation, and one broadcast-size-agnostic improvement join;
    * state is (node, dist) only; lineage cut every `checkpointEvery`
    * rounds. */
  def weightedDistances(edges: DataFrame, sources: DataFrame, rounds: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // cut: same per-round edge reuse as [[bfsDistances]], DECLARED
    // hash(src) (cutPartitionedBy) — every relax round joins the edge
    // list on src and each round materializes through its own cut, so
    // the PageRank treatment applies (unlike KCore's lazy chain)
    val e = Lineage.cutPartitionedBy(
      edges.select(col("src"), col("dst"), col("w")), Seq("src"))
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
    var frontier = dist
    for (r <- 1 to rounds) {
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"),
          (col("dist") + col("w").cast("long")).as("cd"))
        .groupBy("node").agg(min(col("cd")).as("cd"))
      // cut: `improved` feeds BOTH next round's expansion (frontier) and
      // the settled-distance union — lazily chained, each later round
      // replayed it once per reference, compounding between checkpoints
      val improved = Lineage.cut(cand
        .join(dist.withColumnRenamed("dist", "pd"), Seq("node"), "left")
        .filter(col("pd").isNull || col("cd") < col("pd"))
        .select(col("node"), col("cd").as("dist")))
      frontier = improved
      dist = dist.union(improved)
        .groupBy("node").agg(min(col("dist")).as("dist"))
      if (r % checkpointEvery == 0 && r < rounds) dist = dist.localCheckpoint()
    }
    dist
  }
}
