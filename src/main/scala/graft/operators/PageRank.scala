package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank: the iterative-graph operator class
  * (beyond [[graft.dedup.DedupClusters]]' connected components) for
  * entity-importance scoring — supplier/customer centrality, web-graph
  * quality priors for corpus curation, canonical-document selection.
  *
  * All arithmetic is INTEGER (ranks in millionths of a unit of mass;
  * damping 85/100 applied with integer division), so the result is a
  * pure function of the graph — bit-identical across engines and across
  * partial-aggregation orders. That is what lets the driver's DuckDB
  * oracle replay the same iterations and hash-match (float PageRank
  * would accumulate in partition order and differ in ulps).
  *
  * Scale design (100 TB): each iteration is one join of the rank vector
  * with the edge list (both keyed on the node id — co-partitioned after
  * the first shuffle, AQE reuses the exchange) plus one map-side-
  * combinable sum per destination. State per round is one row per node;
  * contributions never materialize per-edge beyond the shuffle stream.
  * The edge list, node/degree tables, and each round's rank vector are
  * materialized via [[Lineage.cut]] — without it every round replays all
  * earlier rounds per reference and the plan grows with `iters`.
  */
object PageRank {

  /** Ranks after `iters` rounds over a directed edge list (`src`, `dst`
    * string columns). Every node starts with `base` millionth-mass;
    * p'(v) = base*15/100 + 85 * Σ_{u→v} (p(u) div out(u)) div 100,
    * all in integer arithmetic. Returns (node, val). */
  def integerPageRank(edges0: DataFrame, iters: Int = 5,
      base: Long = 1000000L): DataFrame = {
    // cut: the caller's edge derivation and the node/degree tables are
    // referenced by every iteration — materialize each once; the per-round
    // cut on ranks stops the plan (and recomputation) growing with iters.
    // The edge cut is hash-partitioned on src and DECLARED so
    // ([[Lineage.cutPartitionedBy]], guide §2.4 shared exchange): every
    // round's contribution join then reads the edge list — the
    // iteration's largest input, which re-shuffled once per round
    // (5 × 15.8 MB of q75's 103 MB total shuffle at sf0.1) —
    // co-partitioned, and exchanges only the node-sized rank vector.
    val edges = Lineage.cutPartitionedBy(edges0, Seq("src"))
    // nodes and deg are static too and join every round on node — same
    // declared-layout treatment (one fixed repartition each buys
    // iters-1 avoided per-round exchanges)
    val nodes = Lineage.cutPartitionedBy(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct(), Seq("node"))
    val deg = Lineage.cutPartitionedBy(edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")), Seq("node"))
    var ranks = nodes.select(col("node"), lit(base).as("val"))
    val hold = base * 15L / 100L
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, "node")
        .select(col("node"), expr("val div deg").as("c"))
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = Lineage.cut(nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          (lit(hold) + expr("(85 * coalesce(s, 0L)) div 100")).as("val")))
    }
    ranks
  }

  /** PERSONALIZED PageRank: the teleport mass lands only on `seeds` (a
    * `node` column) instead of uniformly — "importance relative to this
    * query set", the recommendation/locality variant (suppliers for a
    * customer segment, pages for a topic seed list). Same integer
    * fixed-point arithmetic and per-round plan as
    * [[integerPageRank]]; the seed flag rides the node table, so rounds
    * cost exactly what the global variant costs. Seeds start with
    * `base` mass, everything else at zero. */
  def personalizedPageRank(edges0: DataFrame, seeds: DataFrame, iters: Int = 5,
      base: Long = 1000000L): DataFrame = {
    // cut: same round-reuse structure as [[integerPageRank]], including
    // the declared src-partitioned edge materialization (each round
    // re-shuffles only the rank vector, never the edge list)
    val edges = Lineage.cutPartitionedBy(edges0, Seq("src"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val deg = Lineage.cutPartitionedBy(edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")), Seq("node"))
    val marked = Lineage.cutPartitionedBy(nodes
      .join(seeds.select(col("node")).distinct().withColumn("sflag", lit(1)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("sflag"), lit(0)).as("is_seed")), Seq("node"))
    var ranks = marked.select(col("node"), (col("is_seed") * base).as("val"))
    val hold = base * 15L / 100L
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, "node")
        .select(col("node"), expr("val div deg").as("c"))
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = Lineage.cut(marked.join(contrib, marked("node") === contrib("dst"), "left")
        .select(marked("node"),
          (col("is_seed") * hold + expr("(85 * coalesce(s, 0L)) div 100")).as("val")))
    }
    ranks
  }
}
