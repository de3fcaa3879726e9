package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting — the third iterative/structural
  * graph operator (after [[graft.dedup.DedupClusters]]' connected
  * components and [[PageRank]]): community density, spam-graph
  * detection, co-occurrence clustering over entity graphs extracted
  * from a corpus.
  *
  * Scale design (100 TB): the naive wedge join does Σ deg(v)² work,
  * which a single celebrity node turns into a quadratic blowup.
  * Orienting every edge from the (degree, id)-SMALLER endpoint to the
  * larger caps every out-degree at O(√m), so the wedge join does
  * O(m^1.5) work total regardless of skew — the classic MapReduce
  * triangle bound. Both joins are hash equi-joins keyed on a vertex
  * (wedge build) and on the (v, w) pair (wedge close); nothing is
  * broadcast-sized, nothing collects.
  */
object Triangles {

  /** Per-vertex triangle participation counts over an undirected edge
    * list (`a`, `b` columns, each edge listed once in either order,
    * self-loops ignored). Returns (v, tri_cnt) for every vertex in at
    * least one triangle; each triangle contributes 1 to each of its
    * three corners. */
  def perVertexTriangles(edges: DataFrame): DataFrame = {
    // cut: the canonicalized edge set feeds the degree aggregate AND the
    // orientation join, and the degree table is itself joined twice
    // (a-side, b-side) — uncut, the caller's edge derivation (q77's
    // co-purchase self-join + pair aggregate) replayed three times
    // (3 identical 11.3 MB stages of q77's 56 s sf0.1 profile)
    val und = Lineage.cut(edges.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct())
    val deg = Lineage.cut(und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg")))
    // orient by the total order (deg, id): src is the smaller endpoint,
    // so out-degrees are O(sqrt(m))-bounded and wedge work is O(m^1.5)
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    // cut: the oriented edge list is read three times (both wedge sides +
    // the closing-edge probe) — materialize it once so the dedup/degree
    // joins above don't replay per reference
    val oriented = Lineage.cut(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst")))
    // wedges u→v, u→w with π(v) < π(w); the closing edge is then
    // oriented v→w, so one equi-join on (v, w) finds it
    val dstBefore = col("x.ddst") < col("y.ddst") ||
      (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && dstBefore)
      .select(col("x.src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri_cnt"))
  }
}
