package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns, formulated so two
  * independent engines compute BIT-IDENTICAL results — the clustering
  * operator a training pipeline runs for corpus partitioning / coreset
  * selection, made oracle-checkable:
  *
  *   - vectors quantize once to `floor(v · 1024)` longs (×1024 is a
  *     power of two → exact for float inputs; same trick as the
  *     quantized-LSH/PQ twins),
  *   - distances are integer squared-L2 sums — no float accumulation
  *     order to disagree on,
  *   - centroid updates are floor-averages `floor(sum / n)` — one
  *     correctly-rounded IEEE division of exact integers, and the
  *     quotient of a BIGINT sum by a member count can never land within
  *     an ulp of a wrong integer (|p/q − m| ≥ 1/q for p/q ≠ m), so the
  *     floor is exact in every engine,
  *   - init = the k smallest ids, ties in assignment break to the
  *     smallest centroid id (`array_position` returns the FIRST min).
  *
  * Scale shape (100 TB): ASSIGNMENT IS MAP-ONLY — the k·d centroid
  * table rides into the plan as a literal (k·d ≤ a few thousand values;
  * the broadcast-free version of a broadcast join), scored per row by a
  * codegen'd `aggregate(zip_with(...))` with no shuffle at all. The
  * UPDATE is one shuffle whose map-side partial aggregation reduces
  * every partition to ≤ k·d (cid, pos) cells before the exchange. The
  * driver holds only the k·d centroid values per iteration — the same
  * bounded-collect contract as the IVF coarse quantizer
  * (reference model: FAISS IndexIVF training).
  */
object KMeans {

  /** Runs `iters` assign→update rounds from the k-smallest-id seeds and
    * returns the FINAL assignment under the last centroids:
    * (idCol, cluster, dist) with integer squared-L2 `dist`. */
  def lloydAssignments(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 3, scale: Int = 1024): DataFrame =
    lloydRun(emb, idCol, vecCol, k, iters, scale) { assigned =>
      assigned.select(col("id"), col("cid").as("cluster"),
        expr("array_min(dists)").as("dist"))
    }

  /** Like [[lloydAssignments]], but keeps the per-vector distances to
    * EVERY final centroid and returns the simplified-silhouette inputs:
    * (idCol, cluster, a, b) with a = integer squared-L2 to the own
    * centroid and b = min over the other centroids. Same map-only
    * assignment plan — the distance array adds k BIGINTs per row, never
    * a join. */
  def lloydSilhouetteInputs(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 3, scale: Int = 1024): DataFrame =
    lloydRun(emb, idCol, vecCol, k, iters, scale) { assigned =>
      assigned
        .withColumn("a", expr("array_min(dists)"))
        .withColumn("b", expr(
          "array_min(filter(transform(dists, (x, i) -> CASE WHEN i <> cid THEN x END), x -> x IS NOT NULL))"))
        .select(col("id"), col("cid").as("cluster"), col("a"), col("b"))
    }

  /** Shared Lloyd's driver loop: quantize → seed → iterate → hand the
    * final assignment frame (id, qv, dists, cid) to `finish`, then
    * checkpoint the result and release the cache. */
  private def lloydRun(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int)(
      finish: DataFrame => DataFrame): DataFrame = {
    require(k >= 1 && iters >= 0)
    // the seed collect + each iteration's update collect + the final
    // assignment all read q — persist once instead of iters+2 source scans
    val q = emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, v -> cast(floor(v * $scale) as bigint))").as("qv"))
      .persist()

    var centroids: IndexedSeq[Seq[Long]] = q.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1).toIndexedSeq: Seq[Long]).toIndexedSeq

    def assigned: DataFrame = {
      // fused codegen squared-L2 (graft.functions.LongL2Sq) instead of
      // the allocating aggregate(zip_with(...)) chain — bit-identical
      graft.functions.VectorExpressions.registerAll(emb.sparkSession)
      val centLit = centroids
        .map(c => s"cast(array(${c.mkString(",")}) as array<bigint>)")
        .mkString("array(", ",", ")")
      q.withColumn("dists", expr(
          s"transform($centLit, c -> long_l2sq(qv, c))"))
        .withColumn("cid", expr("array_position(dists, array_min(dists))").cast("int") - 1)
    }

    for (_ <- 1 to iters) {
      val upd = assigned.select(col("cid"), posexplode(col("qv")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum("col").as("s"), count(lit(1)).as("n"))
        .withColumn("c", expr("cast(floor(cast(s as double) / n) as bigint)"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
        .collect().map(r => r.getInt(0) -> (r.getSeq[Long](1).toIndexedSeq: Seq[Long])).toMap
      // an emptied cluster keeps its previous centroid (both engines
      // implement the same rule so the twins cannot diverge on it)
      centroids = centroids.indices.map(i => upd.getOrElse(i, centroids(i)))
    }

    // materialize the final assignment from the cache, then release it —
    // the returned frame stays correct either way (unpersisted cache
    // plans recompute from source)
    val out = finish(assigned).withColumnRenamed("id", idCol).localCheckpoint()
    q.unpersist(false)
    out
  }
}
