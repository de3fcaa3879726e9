package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data layout —
  * the clustering step behind multi-column file skipping: sort/range-
  * partition a 100 TB table by the interleaved key and every file's
  * min/max footer stats become a small rectangle in (x, y) space, so
  * point/range predicates on EITHER column prune files (a single-column
  * sort only prunes on that column).
  *
  * The z-value is pure integer bit arithmetic over built-in expressions
  * (shiftright/and/shiftleft/sum — all whole-stage-codegen'd, no UDF),
  * so it is bit-identical in any engine and cheap enough to compute in
  * the write path of an ingestion job.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * result bit 2i is bit i of `x`, bit 2i+1 is bit i of `y`. Columns
    * are masked to `bits` first, so out-of-range values wrap rather
    * than corrupt high bits. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** N-column Morton interleave: result bit k*i+j is bit i of column j —
    * the layout key for three-plus-dimension clustering (e.g. time ×
    * tenant × key). Total bits (cols.length × bits) must fit a long;
    * the two-column case is bit-identical to [[zValue2]]. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && cols.length * bits <= 63,
      "need 1+ columns and cols*bits <= 63")
    val mask = (1L << bits) - 1
    val k = cols.length
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    (for { i <- 0 until bits; (c, j) <- masked.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), k * i + j)
    ).reduce(_.bitwiseOR(_))
  }

  /** Cluster a frame for two-column file skipping: range-partition by
    * the z-value of the two (bucketized) key columns and sort each
    * partition by it, so every output file's min/max footer stats form
    * a small rectangle in (x, y) space. Write the result with plain
    * `.write.parquet(...)` — one file per partition; readers filtering
    * on EITHER column then prune most files (proven in ZOrderSpec).
    *
    * At 100 TB this is the layout job an ingestion pipeline runs once
    * per partition/day: one range shuffle (sampled bounds) + local
    * sorts, no driver-side state. */
  def cluster(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
      numPartitions: Int, bits: Int = 16): org.apache.spark.sql.DataFrame =
    df.withColumn("__zorder", zValue2(x, y, bits))
      .repartitionByRange(numPartitions, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")

  /** [[cluster]] for N key columns via [[zValueN]]: one range shuffle
    * (sampled bounds) + local sorts, so every output file's footer
    * stats bound a small N-dimensional box and predicates on ANY of the
    * key columns prune files. */
  def clusterN(df: org.apache.spark.sql.DataFrame, cols: Seq[Column],
      numPartitions: Int, bits: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("__zorder", zValueN(cols, bits))
      .repartitionByRange(numPartitions, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")

  /** The same interleave as ANSI SQL text (for a DuckDB oracle or a
    * SQL-only caller): bit-identical to [[zValue2]]. Every term is
    * fully parenthesized — Postgres-dialect engines give `|`, `&` and
    * `<<` one shared precedence tier (left-associative), so an unwrapped
    * `a << 0 | b << 1` would compound the shifts. */
  def zValue2Sql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((($x & $mask) >> $i) & 1) << ${2 * i})",
        s"(((($y & $mask) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** [[zValueN]] as ANSI SQL text — bit-identical to the column form
    * (same parenthesization rules as [[zValue2Sql]]). */
  def zValueNSql(cols: Seq[String], bits: Int): String = {
    require(cols.nonEmpty && bits >= 1 && cols.length * bits <= 63,
      "need 1+ columns and cols*bits <= 63")
    val mask = (1L << bits) - 1
    val k = cols.length
    val terms = for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      s"(((($c & $mask) >> $i) & 1) << ${k * i + j})"
    terms.mkString("(", " | ", ")")
  }
}
