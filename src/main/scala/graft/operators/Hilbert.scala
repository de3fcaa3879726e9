package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex2

/** Hilbert-curve data layout — [[ZOrder]]'s sibling with strictly
  * better locality: every curve step moves to a grid NEIGHBOR, so the
  * top-bit buckets of the index are perfect sub-squares (proven in
  * HilbertSpec), where Morton buckets of the same size can straddle a
  * diagonal jump. Same 100 TB deployment shape as [[ZOrder.cluster]]:
  * one range shuffle by the curve value + local sorts, footer min/max
  * stats per file become tight rectangles, predicates on either column
  * prune files.
  */
object Hilbert {

  /** Hilbert index of two non-negative integer columns on a
    * 2^bits × 2^bits grid (inputs masked to `bits`, like
    * [[ZOrder.zValue2]]). Backed by the codegen'd
    * [[graft.functions.HilbertIndex2]] expression. */
  def hValue2(x: Column, y: Column, bits: Int = 16): Column =
    call_function("hilbert2", x.cast("long"), y.cast("long"), lit(bits))

  /** Range-partition + sort by the Hilbert value — drop-in replacement
    * for [[ZOrder.cluster]] where per-file bounding boxes matter most.
    * Requires [[graft.functions.HilbertIndex2.registerAll]] (or
    * [[graft.GraftFunctions.registerAll]]) on the session. */
  def cluster(df: DataFrame, x: Column, y: Column,
      numPartitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("__hilbert", hValue2(x, y, bits))
      .repartitionByRange(numPartitions, col("__hilbert"))
      .sortWithinPartitions(col("__hilbert"))
      .drop("__hilbert")

  /** The same walk as a chain of ANSI-SQL CTEs (one per level — linear
    * text, no exponential expression nesting), bit-identical to
    * [[hValue2]]: `h0` seeds masked coordinates from `from` carrying
    * `carry` columns, each level peels one bit (quadrant via the
    * {0,1,3,2} Gray order, then the rotate/flip), and `h<bits>` exposes
    * the final index as `hd`. Every bitwise term is fully parenthesized
    * (single-tier `&`/`>>` precedence in Postgres-dialect engines). */
  def hilbertCtes(from: String, x: String, y: String, bits: Int,
      carry: Seq[String]): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val n = 1L << bits
    val cs = carry.mkString(", ")
    val h0 = s"""h0 AS (SELECT $cs, (CAST($x AS BIGINT) & ${n - 1}) AS hx,
                |  (CAST($y AS BIGINT) & ${n - 1}) AS hy, CAST(0 AS BIGINT) AS hd FROM $from)""".stripMargin
    val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s2 = (1L << k) * (1L << k)
      val rx = s"((hx >> $k) & 1)"
      val ry = s"((hy >> $k) & 1)"
      // (3*rx) XOR ry over {0,1}² enumerates to the Gray order 0,1,3,2
      val quad = s"(CASE ($rx * 2 + $ry) WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END)"
      s"""h${i + 1} AS (SELECT $cs, (hd + $s2 * $quad) AS hd,
         |  (CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END) ELSE hx END) AS hx,
         |  (CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END) ELSE hy END) AS hy
         |  FROM h$i)""".stripMargin
    }
    (h0 +: levels).mkString(",\n")
  }
}
