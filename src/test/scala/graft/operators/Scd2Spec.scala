package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // k=2: U@1, D@2, U@3  → [1,2) closed by tombstone, [3,∞) current
  // k=3: U@1, D@2       → [1,2) only; no current row after the delete
  // k=4: U@1, U@2       → [1,2) then [2,∞)
  // k=5: U@1            → [1,∞)
  private def changes() = {
    import spark.implicits._
    Seq(
      (2L, 1L, "U", "b1", 21.0), (2L, 2L, "D", null, 0.0), (2L, 3L, "U", "b3", 23.0),
      (3L, 1L, "U", "c1", 31.0), (3L, 2L, "D", null, 0.0),
      (4L, 1L, "U", "d1", 41.0), (4L, 2L, "U", "d2", 42.0),
      (5L, 1L, "U", "e1", 50.0))
      .toDF("k", "version", "op", "status", "price")
  }

  test("history intervals: tombstone closes, successor chains, open rows current") {
    val got = Scd2.buildHistory(changes(), Seq("k"))
      .orderBy(col("k"), col("valid_from")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (2L, "b1", 1L, Some(2L), false),
      (2L, "b3", 3L, None, true),
      (3L, "c1", 1L, Some(2L), false),
      (4L, "d1", 1L, Some(2L), false),
      (4L, "d2", 2L, None, true),
      (5L, "e1", 1L, None, true)))
  }

  test("as-of lookup joins each fact to its own version; tombstone holes are NULL") {
    import spark.implicits._
    val hist = Scd2.buildHistory(changes(), Seq("k"))
    // facts at asofs probing every interval shape in the fixture
    val facts = Seq((2L, 1L), (2L, 2L), (2L, 3L), (3L, 2L), (4L, 1L), (4L, 2L), (5L, 9L))
      .toDF("k", "asof")
    val got = facts.join(hist,
        facts("k") === hist("k") && col("valid_from") <= col("asof") &&
          (col("valid_to").isNull || col("asof") < col("valid_to")), "left")
      .select(facts("k"), col("asof"), col("status"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    assert(got == Set(
      (2L, 1L, Some("b1")),  // first interval
      (2L, 2L, None),        // tombstone hole between D@2 and U@3
      (2L, 3L, Some("b3")),  // reborn current row
      (3L, 2L, None),        // deleted, never reborn
      (4L, 1L, Some("d1")), (4L, 2L, Some("d2")),
      (5L, 9L, Some("e1"))), got.toString) // open interval serves any later asof
  }

  test("snapshotAt(v) equals replaying the feed through CdcMerge up to v") {
    import spark.implicits._
    val ch = changes()
    val base = Seq.empty[(Long, String, Double)].toDF("k", "status", "price")
    for (v <- 0L to 4L) {
      val snap = Scd2.snapshotAt(Scd2.buildHistory(ch, Seq("k")), v)
        .orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val replay = CdcMerge.applyChanges(base, ch.filter(col("version") <= v), Seq("k"))
        .orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(snap == replay, s"asOf=$v")
    }
  }

  test("random feeds: every version's snapshot matches the sequential reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val feed = Seq.tabulate(60) { i =>
      val k = rnd.nextInt(12).toLong
      val op = if (rnd.nextInt(4) == 0) "D" else "U"
      (k, i.toLong, op, s"v$i", i * 1.0)
    }
    val hist = Scd2.buildHistory(feed.toDF("k", "version", "op", "status", "price"), Seq("k"))
    for (v <- Seq(0L, 15L, 40L, 59L)) {
      // sequential reference: latest change at-or-before v per key, deletes gone
      val expected = feed.filter(_._2 <= v).groupBy(_._1).toSeq
        .map { case (_, cs) => cs.maxBy(_._2) }
        .filter(_._3 != "D").map(c => (c._1, c._4, c._5)).sortBy(_._1)
      val got = Scd2.snapshotAt(hist, v).orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(got == expected, s"asOf=$v")
    }
  }

  test("applyBatch: incremental fold equals rebuilding from the full feed") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val feed = Seq.tabulate(80) { i =>
      val k = rnd.nextInt(15).toLong
      val op = if (rnd.nextInt(4) == 0) "D" else "U"
      (k, i.toLong, op, s"v$i", i * 1.0)
    }
    def df(rows: Seq[(Long, Long, String, String, Double)]) =
      rows.toDF("k", "version", "op", "status", "price")
    // fold in three monotone version slices
    val (f1, f2, f3) = (feed.filter(_._2 < 30), feed.filter(t => t._2 >= 30 && t._2 < 55),
      feed.filter(_._2 >= 55))
    val incremental = Scd2.applyBatch(
      Scd2.applyBatch(Scd2.buildHistory(df(f1), Seq("k")), df(f2), Seq("k")),
      df(f3), Seq("k"))
    val full = Scd2.buildHistory(df(feed), Seq("k"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("k"), col("valid_from")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))).toSeq
    assert(canon(incremental) == canon(full))
  }

  test("applyBatch on an untouched history is the identity") {
    import spark.implicits._
    val hist = Scd2.buildHistory(changes(), Seq("k"))
    val batch = Seq((9L, 10L, "U", "z", 9.0)).toDF("k", "version", "op", "status", "price")
    val got = Scd2.applyBatch(hist, batch, Seq("k"))
    assert(got.filter(col("k") =!= 9L).count() == hist.count())
    assert(got.filter(col("k") === 9L).count() == 1)
  }

  test("history plans as one key-partitioned window, no join at all") {
    val plan = Scd2.buildHistory(changes(), Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}
