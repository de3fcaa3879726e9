package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER assignment: connected components over the
  * near-dup pair graph, labeling every document with the smallest doc id
  * reachable through near-dup edges. The step a real dedup pipeline runs
  * after pair generation — "keep one document per cluster" needs the
  * transitive closure, not just pairs (A~B, B~C must collapse A,B,C
  * even when A~C was never emitted).
  *
  * Algorithm: iterative min-label propagation (the standard Pregel-style
  * formulation expressed as DataFrame joins). Each round every node
  * takes the min of its label and its neighbors' labels; rounds needed =
  * component diameter. Near-dup clusters are tiny and shallow in
  * practice, so this converges in a handful of rounds; each round is one
  * shuffle join keyed on node id. The driver loop only checks a
  * converged-count — all data stays distributed, and `localCheckpoint`
  * cuts the growing lineage so round N doesn't replay rounds 1..N-1.
  */
object DedupClusters {

  /** Label every node with the min id of its connected component.
    *
    * Only nodes that actually appear in an edge enter the propagation
    * loop — the near-dup graph is a vanishing fraction of the corpus, so
    * each round shuffles the (tiny) touched subgraph, not every
    * document; singletons get `cluster = id` in one final left join.
    * Convergence is an exact change-detection join over the touched
    * subgraph — type-agnostic, so non-numeric ids (UUIDs) work too.
    *
    * @param nodes one column `id` (every document, including singletons)
    * @param edges columns `a`, `b` (undirected pairs)
    * @return (id, cluster) where cluster = min reachable id
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(nodes, edges, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * ran (including the final no-change round that proves convergence) —
    * the observable for the pointer-jumping complexity guarantee: a
    * length-k chain must converge in O(log k) rounds, not k. */
  def connectedComponentsWithRounds(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): (DataFrame, Int) = {
    // symmetric neighbor list; self-loops are harmless but add work.
    // Materialized DECLARED hash(dst) (Lineage.cutPartitionedBy): every
    // propagation round joins it on dst, and each round materializes
    // through its own checkpoint, so the static edge side stays
    // co-partitioned instead of re-exchanging per round (the PageRank
    // treatment; plain checkpoints forget their layout under AQE)
    val sym = graft.operators.Lineage.cutPartitionedBy(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .union(edges.select(col("b").as("src"), col("a").as("dst")))
        .filter(col("src") =!= col("dst")), Seq("dst"))
    val touched = sym.select(col("src").as("id")).distinct()

    var labels = touched.withColumn("cluster", col("id")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min label among the node itself and its neighbors' current labels
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      val cand = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("prev"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      // pointer jump (path halving): also adopt the label OF the label —
      // collapses a length-k chain in O(log k) rounds instead of k
      // (labels always hold reachable node ids, so the min stays within
      // the component). The previous label rides along, so change
      // detection is a filter over the checkpointed result — exact, any
      // id type, no extra join.
      val next = cand.as("c")
        .join(labels.select(col("id").as("jid"), col("cluster").as("jcl")),
          col("c.cluster") === col("jid"), "left")
        .select(col("c.id").as("id"), col("c.prev").as("prev"),
          least(col("c.cluster"), coalesce(col("jcl"), col("c.cluster"))).as("cluster"))
        .localCheckpoint(true)
      converged = next.filter(col("cluster") =!= col("prev")).limit(1).count() == 0
      labels = next.select("id", "cluster")
      iter += 1
    }
    (nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster")), iter)
  }

  /** Full pipeline: MinHash near-dup pairs → connected components →
    * (doc_id, cluster, cluster_size). Deterministic given the corpus. */
  def nearDupClusters(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol, threshold)
      .select(col("a"), col("b"))
    val nodes = docs.select(col(idCol).as("id"))
    val labels = connectedComponents(nodes, pairs)
    val sizes = labels.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster")
      .select(col("id").as("doc_id"), col("cluster"), col("cluster_size"))
  }
}
