package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class CdcMergeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def frames() = {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "status", "price")
    // k=2: updated then deleted then re-upserted (latest wins → v3 row)
    // k=3: updated then deleted (tombstone wins → dropped)
    // k=4: single stale-then-newer update (v2 supersedes v1)
    // k=5: brand-new key inserted by the feed
    val changes = Seq(
      (2L, 1L, "U", "b1", 21.0), (2L, 2L, "D", null, 0.0), (2L, 3L, "U", "b3", 23.0),
      (3L, 1L, "U", "c1", 31.0), (3L, 2L, "D", null, 0.0),
      (4L, 1L, "U", "d1", 41.0), (4L, 2L, "U", "d2", 42.0),
      (5L, 1L, "U", "e1", 50.0))
      .toDF("k", "version", "op", "status", "price")
    (base, changes)
  }

  test("latest-wins merge: upsert, tombstone, reinsert, insert, passthrough") {
    val (base, changes) = frames()
    val got = CdcMerge.applyChanges(base, changes, Seq("k"))
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0),   // untouched base row
      (2L, "b3", 23.0),  // delete superseded by later re-upsert
      (4L, "d2", 42.0),  // latest update wins
      (5L, "e1", 50.0))) // feed-inserted key; k=3 tombstoned away
  }

  test("empty change feed is the identity") {
    val (base, changes) = frames()
    val got = CdcMerge.applyChanges(base, changes.limit(0), Seq("k"))
      .orderBy(col("k")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("random feeds: merge equals a sequential latest-wins reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    for (trial <- 0 until 3) {
      val base = (0L until 20L).map(k => (k, s"s$k", k * 1.0))
      val changes = Seq.tabulate(40) { i =>
        val k = rnd.nextInt(30).toLong // half the keys beyond the base
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, i.toLong, op, s"v$i", i * 10.0)
      }
      // reference: group by key, apply only the max-version change
      val latest = changes.groupBy(_._1).map { case (_, cs) => cs.maxBy(_._2) }
      val expected = (base.filterNot(r => latest.exists(_._1 == r._1)) ++
        latest.filter(_._3 != "D").map(c => (c._1, c._4, c._5))).sortBy(_._1)
      val got = CdcMerge.applyChanges(
        base.toDF("k", "status", "price"),
        changes.toDF("k", "version", "op", "status", "price"), Seq("k"))
        .orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(got == expected, s"trial $trial")
    }
  }

  test("merge plans as key-partitioned window + anti join, never a nested loop") {
    val (base, changes) = frames()
    val plan = CdcMerge.applyChanges(base, changes, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }
}
