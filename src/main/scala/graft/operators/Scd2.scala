package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a CDC change feed into a
  * versioned history table with `[valid_from, valid_to)` intervals, and
  * read any point-in-time snapshot back out of it.
  *
  * The feed carries the dimension's columns plus a monotonically
  * increasing `version` and an `op` marker (`"U"` upsert / `"D"`
  * delete) — the same contract as [[CdcMerge]]. Every non-delete change
  * opens a history row valid from its own version until the key's NEXT
  * change of any kind (a later upsert supersedes it; a delete closes it
  * without opening a successor, so a deleted key has no current row
  * until re-upserted). `is_current` marks open intervals.
  *
  * Scale shape: one hash shuffle of the changes on the key for the
  * `lead()` window — the history is derived without touching any base
  * table at all, so a 100 TB dimension's history rebuild costs
  * O(changes), and incremental appends only need the per-key tail (the
  * previously-open row) joined to the new batch.
  */
object Scd2 {

  /** Full history from a change feed. Output = the feed's columns minus
    * (`versionCol`, `opCol`) plus `valid_from`, `valid_to` (NULL = open)
    * and `is_current`. Requires (key, version) unique within `changes`.
    */
  def buildHistory(changes: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val attrs = changes.columns.filterNot(c => c == versionCol || c == opCol)
    changes
      // the lead is computed BEFORE deletes are dropped: a tombstone's
      // version is exactly the close boundary of its predecessor
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("valid_from", col(versionCol))
      .withColumn("is_current", col("valid_to").isNull)
      .select((attrs.map(col).toSeq :+ col("valid_from") :+ col("valid_to") :+
        col("is_current")): _*)
  }

  /** Incrementally fold a NEW change batch into an existing history:
    * closed intervals are immutable, so only the touched keys' rows are
    * rebuilt — their open row re-enters the feed as an upsert at its own
    * `valid_from` and [[buildHistory]] re-derives that key's tail, while
    * untouched keys and already-closed rows pass through verbatim.
    * Requires batch versions to exceed every touched key's open
    * `valid_from` (a monotone CDC feed). [[Scd2Spec]] proves
    * `applyBatch(buildHistory(f1), f2) == buildHistory(f1 ++ f2)`.
    *
    * Scale shape: the touched-key set is batch-sized and broadcasts into
    * the two history joins; the only windowed work is the touched keys'
    * open rows + the batch — O(batch log batch), not O(history). */
  def applyBatch(history: DataFrame, batch: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    val touched = batch.select(keyCols.map(col): _*).distinct()
    val untouched = history.join(touched, keyCols, "left_anti")
    val touchedHist = history.join(touched, keyCols, "left_semi")
    val attrs = history.columns.filterNot(Set("valid_from", "valid_to", "is_current"))
    val reopened = touchedHist.filter(col("is_current"))
      .select((attrs.map(col).toSeq :+ col("valid_from").as(versionCol)) :+
        lit("U").as(opCol): _*)
    val feed = reopened.unionByName(batch.select(reopened.columns.map(col).toSeq: _*))
    untouched.unionByName(touchedHist.filter(!col("is_current")))
      .unionByName(buildHistory(feed, keyCols, versionCol, opCol))
  }

  /** Point-in-time view: the rows whose interval covers `asOf`
    * (`valid_from <= asOf < valid_to`, open intervals cover everything
    * at-or-after their start). Equivalent to replaying the feed up to
    * and including version `asOf` — [[Scd2Spec]] proves that against
    * [[CdcMerge.applyChanges]]. */
  def snapshotAt(history: DataFrame, asOf: Long): DataFrame =
    history.filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .drop("valid_from", "valid_to", "is_current")
}
