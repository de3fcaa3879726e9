package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-front) query: the rows no other row dominates, where
  * row q dominates row p iff q is at-least-as-good on EVERY dimension
  * and strictly better on at least one. The multi-objective "best
  * trade-offs" operator (cheapest-vs-largest, fastest-vs-freshest…)
  * relational engines don't ship natively.
  *
  * Two-phase distributed shape (the standard map-reduce skyline, e.g.
  * Park et al., "Parallel Skyline Computation on MapReduce"): a local
  * Pareto prune inside each partition first — dominated rows can never
  * be in the global skyline, so dropping them is lossless — then an
  * exact dominance anti-self-join over the surviving candidates. The
  * full input is touched exactly once, map-side, with no shuffle; only
  * the pruned candidate set (typically orders of magnitude smaller —
  * for d dims and n random rows the expected skyline is
  * O(log^(d-1) n)) reaches the quadratic refinement, broadcast both
  * sides. Ties on ALL dimensions dominate in neither direction, so
  * duplicate optima all survive.
  *
  * Rows with a NULL in any skyline dimension carry no dominance
  * semantics and are dropped up front.
  */
object Skyline {

  /** `dims`: (column, maximize?) — `true` means larger is better. All
    * dimension columns must be numeric. Returns the input's rows (full
    * schema) restricted to the skyline. */
  def skyline(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "need at least one skyline dimension")
    val clean = df.filter(dims.map { case (c, _) => col(c).isNotNull }.reduce(_ && _))
    val schema = clean.schema
    val idx = dims.map { case (c, _) => schema.fieldIndex(c) }
    val maxFlags = dims.map(_._2)

    // exact per-value comparison: BigDecimal(toString) is order-preserving
    // for every numeric type incl. shortest-exact doubles, so the local
    // prune can never discard a true skyline row on a rounding artifact
    def key(r: Row): IndexedSeq[java.math.BigDecimal] =
      idx.zip(maxFlags).map { case (i, mx) =>
        val v = new java.math.BigDecimal(r.get(i).toString)
        if (mx) v else v.negate() // normalize: larger always better
      }.toIndexedSeq
    def dominates(a: IndexedSeq[java.math.BigDecimal],
        b: IndexedSeq[java.math.BigDecimal]): Boolean = {
      var geAll = true; var gtAny = false; var i = 0
      while (i < a.length) {
        val c = a(i).compareTo(b(i))
        if (c < 0) geAll = false
        if (c > 0) gtAny = true
        i += 1
      }
      geAll && gtAny
    }

    val pruned = clean.mapPartitions { it =>
      val kept = scala.collection.mutable.ArrayBuffer.empty[(IndexedSeq[java.math.BigDecimal], Row)]
      it.foreach { r =>
        val k = key(r)
        if (!kept.exists { case (kk, _) => dominates(kk, k) }) {
          kept.filterInPlace { case (kk, _) => !dominates(k, kk) }
          kept += ((k, r))
        }
      }
      kept.iterator.map(_._2)
    }(Encoders.row(schema))

    // exact global refinement over the candidates: drop a iff some b
    // dominates it (the join is candidate×candidate — broadcast-sized)
    val a = pruned.alias("skya")
    val b = pruned.alias("skyb")
    val geAll = dims.map { case (c, mx) =>
      if (mx) col(s"skyb.$c") >= col(s"skya.$c") else col(s"skyb.$c") <= col(s"skya.$c")
    }.reduce(_ && _)
    val gtAny = dims.map { case (c, mx) =>
      if (mx) col(s"skyb.$c") > col(s"skya.$c") else col(s"skyb.$c") < col(s"skya.$c")
    }.reduce(_ || _)
    a.join(broadcast(b), geAll && gtAny, "left_anti")
  }
}
