package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins CDC MERGE — `MERGE INTO` semantics (upsert + delete from
  * a change feed) without requiring a table format: apply a batch of
  * changes to a base snapshot and produce the next snapshot.
  *
  * The change feed carries the base's columns plus a monotonically
  * increasing `version` and an `op` marker (`"U"` upsert / `"D"`
  * delete). A key may appear many times across versions; only its
  * LATEST change applies — an upsert replaces (or inserts) the row, a
  * delete drops it, and intermediate changes are superseded, so a key
  * deleted at v2 and re-upserted at v3 survives.
  *
  * Scale shape (the incremental-maintenance pattern a 100 TB table
  * needs): the latest-per-key cut is one hash shuffle of the CHANGES on
  * the key (partitioned window, no global sort); the base is touched by
  * exactly one anti-join on the same key — broadcast when the change
  * batch is small (the common case: a day's changes vs the full
  * snapshot), shuffle-hash otherwise — and never rewritten where no
  * change landed. Requires (key, version) unique within `changes`
  * (standard CDC feeds satisfy this; ties would make latest-wins
  * nondeterministic).
  */
object CdcMerge {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    val latest = changes.withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(base.columns.map(col).toSeq: _*)
    val touched = latest.select(keyCols.map(col): _*)
    base.join(touched, keyCols, "left_anti").unionByName(upserts)
  }
}
