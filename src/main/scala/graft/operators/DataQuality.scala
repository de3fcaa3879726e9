package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality profiling — the constraint-validation step a
  * training-data pipeline runs before trusting an input drop (the
  * Deequ/"expectations" pattern).
  *
  * All named metrics evaluate in ONE partial+final aggregate over ONE
  * scan (conditional aggregates, no per-check passes), then unpivot to
  * a (metric, value) long table — at 100 TB the profile costs exactly
  * one map-side-combined pass regardless of how many checks ride it.
  * Referential integrity ([[orphanFraction]]) is the one check that
  * needs a second relation: an aggregated-boolean anti-join formulated
  * as a broadcastable semi probe, never a row-multiplying join.
  */
object DataQuality {

  /** A named metric: any aggregate expression over the frame. */
  final case class Check(name: String, agg: Column)

  def nullFraction(c: String): Column =
    round(avg(when(col(c).isNull, 1.0).otherwise(0.0)), 4)

  /** Exact distinct-to-row ratio (1.0 ⇔ the column is a key). */
  def distinctRatio(c: String): Column =
    round(count_distinct(col(c)).cast("double") / count(lit(1)), 4)

  /** Run all checks in one aggregate pass; returns (metric, value)
    * rows in the checks' order, values cast to double. */
  def profile(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val agged = df.agg(checks.head.agg.cast("double").as(checks.head.name),
      checks.tail.map(c => c.agg.cast("double").as(c.name)): _*)
    val stackArgs = checks.map(c => s"'${c.name}', ${c.name}").mkString(", ")
    agged.select(expr(s"stack(${checks.length}, $stackArgs) AS (metric, value)"))
  }

  /** Fraction of `child` rows whose `childKey` has NO match in
    * `parent.parentKey` (0.0 ⇔ referential integrity holds). NULL child
    * keys count as orphans — a NULL FK cannot join. One aggregate over
    * a left-semi-style probe: the parent side reduces to its DISTINCT
    * keys before the join (broadcastable for dimension-sized parents;
    * hash-join on the key otherwise — never row-multiplying). */
  def orphanFraction(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__dq_pk")).distinct()
      .withColumn("__dq_hit", lit(1))
    child.select(col(childKey).as("__dq_fk"))
      .join(keys, col("__dq_fk") === col("__dq_pk"), "left")
      .agg(round(avg(when(col("__dq_hit").isNull, 1.0).otherwise(0.0)), 4)
        .as("orphan_frac"))
  }
}
