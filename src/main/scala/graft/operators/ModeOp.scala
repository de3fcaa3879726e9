package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `mode()` aggregate with a deterministic tie-break.
  *
  * Native mode() implementations pick an arbitrary value on ties (which
  * is why this was previously skipped as un-oracle-able); this
  * formulation makes the choice explicit — highest count wins, SMALLEST
  * value on equal counts — so any engine reproduces it bit-exactly.
  *
  * Shape: per-group value counts (one shuffle, map-side combined — the
  * count fan-in is |distinct values| per group, not rows), then a
  * row_number over the tiny per-group count table. At 100 TB the first
  * aggregation is the only pass over the data.
  */
object ModeOp {

  /** Most frequent `valueCol` per `keys` group (NULLs excluded), with
    * columns (keys..., mode_val, mode_n). */
  def modeBy(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("mode_n"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("mode_n").desc, col(valueCol).asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(keys.map(col) :+ col(valueCol).as("mode_val") :+ col("mode_n"): _*)
  }
}
