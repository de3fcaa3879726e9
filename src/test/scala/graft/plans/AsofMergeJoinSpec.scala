package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.zeek.SharedSpark

/** The native sort-merge as-of exec vs the composed union+window
  * operator: identical results on dense/sparse/adversarial data, the
  * expected physical shape (AsofJoinExec fed by exchanges+sorts that
  * EnsureRequirements planted, no Window, no Union), and null/tie
  * semantics pinned. */
class AsofMergeJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def randomSides(seed: Int, nLeft: Int, nRight: Int, nKeys: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val left = (0 until nLeft).map { i =>
      (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong)
    }.toDF("l_id", "k", "t")
    val right = (0 until nRight).map { i =>
      (1000L + i, rnd.nextInt(nKeys).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toDouble)
    }.toDF("r_id", "k", "t", "payload")
    (left, right)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("equals the composed operator on random data (several seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val (l, r) = randomSides(seed, 500, 300, 17)
      val exec = AsofMergeJoin.asofBackward(l, r, Seq("k"), "t", "t")
      val comp = AsofJoin.asofBackward(l, r, Seq("k"), "t", "t")
      // project away the matched right id: several right rows can share
      // (k, t) in random data, and WHICH of the tied rows wins is
      // explicitly unspecified in both implementations — compare the
      // deterministic part (match time decides the payload set here)
      val ecols = Seq(col("l_id"), col("k"), col("t"), col("payload").isNotNull.as("m"))
      assert(canon(exec.select(ecols: _*)) == canon(comp.select(ecols: _*)),
        s"seed $seed")
      // and on tie-free data compare FULL rows
      val (l2, r2) = randomSides(seed + 100, 300, 200, 7)
      val rDistinct = r2.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("k"), col("t")).orderBy(col("r_id"))))
        .filter(col("rn") === 1).drop("rn")
      val e2 = AsofMergeJoin.asofBackward(l2, rDistinct, Seq("k"), "t", "t")
      val c2 = AsofJoin.asofBackward(l2, rDistinct, Seq("k"), "t", "t")
      assert(canon(e2) == canon(c2), s"seed $seed tie-free")
    }
  }

  test("plan: AsofJoinExec present, no Window/Union; sorts+exchanges planted by EnsureRequirements") {
    val (l, r) = randomSides(3, 100, 80, 5)
    val df = AsofMergeJoin.asofBackward(l, r, Seq("k"), "t", "t")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2000))
    assert(!plan.contains("Window"), "native exec must not plan a window:\n" + plan.take(2000))
    assert(!plan.contains("Union"), "native exec must not plan a union:\n" + plan.take(2000))
    assert(plan.contains("Sort"), "EnsureRequirements must plant in-partition sorts")
    assert(plan.contains("Exchange"), "EnsureRequirements must plant the key exchanges")
  }

  test("semantics: inclusive ties, strict future excluded, left-outer nulls, empty right") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
      .select(col("k"), col("t"), (col("t") * 100).as("l_payload"))
    val r = Seq((1L, 10L, "at10"), (1L, 15L, "at15"), (1L, 25L, "at25"),
      (3L, 1L, "other")).toDF("k", "t", "tag")
    val out = AsofMergeJoin.asofBackward(l, r, Seq("k"), "t", "t")
      .orderBy("k", "t").collect()
    assert(out(0).getString(3) == "at10") // tie at t=10 matches inclusively
    assert(out(1).getString(3) == "at15") // latest at-or-before 20, not 25
    assert(out(2).isNullAt(3))            // key 2 has no right rows
    val empty = AsofMergeJoin.asofBackward(l, r.filter(col("k") === 999L), Seq("k"), "t", "t")
    assert(empty.count() == 3 && empty.filter(col("tag").isNotNull).count() == 0)
  }

  test("null times never match and null-time left rows emit unmatched") {
    import spark.implicits._
    val l = Seq((1L, Some(10L)), (1L, None)).toDF("k", "t")
    val r = Seq((1L, Option.empty[Long], "nullt"), (1L, Some(5L), "at5"))
      .toDF("k", "t", "tag")
    val out = AsofMergeJoin.asofBackward(l, r, Seq("k"), "t", "t")
      .orderBy(col("t").asc_nulls_first).collect()
    assert(out(0).isNullAt(2), "null-time left row must not match")
    assert(out(1).getString(2) == "at5", "null-time right row must be skipped, not matched")
  }

  test("forward: equals the composed operator on random tie-free data") {
    for (seed <- Seq(2, 11, 77)) {
      val (l, r) = randomSides(seed, 400, 250, 13)
      // tie-free right side: one row per (k, t)
      val rDistinct = r.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("k"), col("t")).orderBy(col("r_id"))))
        .filter(col("rn") === 1).drop("rn")
      val exec = AsofMergeJoin.asofForward(l, rDistinct, Seq("k"), "t", "t")
      val comp = AsofJoin.asofForward(l, rDistinct, Seq("k"), "t", "t")
      assert(canon(exec) == canon(comp), s"seed $seed")
    }
  }

  test("forward semantics: inclusive ties, strict past excluded, left-outer nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 10L, "at10"), (1L, 15L, "at15"), (1L, 19L, "at19"),
      (3L, 1L, "other")).toDF("k", "t", "tag")
    val out = AsofMergeJoin.asofForward(l, r, Seq("k"), "t", "t")
      .orderBy("k", "t").collect()
    assert(out(0).getString(2) == "at10") // tie at t=10 matches inclusively
    assert(out(1).isNullAt(2))            // nothing at-or-after 20
    assert(out(2).isNullAt(2))            // key 2 has no right rows
    // null-time rows never match on either side (native pin)
    val ln = Seq((1L, Option.empty[Long])).toDF("k", "t")
    val outN = AsofMergeJoin.asofForward(ln, r, Seq("k"), "t", "t").collect()
    assert(outN.length == 1 && outN(0).isNullAt(2))
  }

  test("self-as-of: right side derived from the left (shared exprIds) resolves and prunes correctly") {
    import spark.implicits._
    // the q107 shape — both sides descend from the SAME plan, so without
    // the fresh-alias projection the node's sides share exprIds and
    // ColumnPruning strips the right keys (runtime bind failure)
    val e = Seq((1L, 1L, 10L, "view", 1.0), (2L, 1L, 20L, "purchase", 5.0),
      (3L, 1L, 30L, "view", 2.0), (4L, 2L, 15L, "view", 3.0))
      .toDF("event_id", "user_id", "t", "event_type", "value")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t"), col("event_id").as("p_event_id"))
    val back = AsofMergeJoin.asofBackward(e, p, Seq("user_id"), "t", "t")
      .orderBy("event_id").collect()
    assert(back.map(r => if (r.isNullAt(5)) -1L else r.getLong(5)).toSeq ==
      Seq(-1L, 2L, 2L, -1L))
    val fwd = AsofMergeJoin.asofForward(e, p, Seq("user_id"), "t", "t")
      .orderBy("event_id").collect()
    assert(fwd.map(r => if (r.isNullAt(5)) -1L else r.getLong(5)).toSeq ==
      Seq(2L, 2L, -1L, -1L))
  }

  test("exec reports SQL metrics: output rows and matched rows") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 15L, "x")).toDF("k", "t", "tag")
    val df = AsofMergeJoin.asofBackward(l, r, Seq("k"), "t", "t")
    df.collect()
    // AQE wraps the exec in query stages (leaf nodes for collect) —
    // descend through AdaptiveSparkPlanExec / QueryStageExec explicitly
    def findAsof(p: org.apache.spark.sql.execution.SparkPlan): Seq[AsofJoinExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => findAsof(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findAsof(q.plan)
      case e: AsofJoinExec => e +: e.children.flatMap(findAsof)
      case other => other.children.flatMap(findAsof)
    }
    val asof = findAsof(df.queryExecution.executedPlan)
    assert(asof.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    assert(asof.head.metrics("numOutputRows").value == 3L)
    assert(asof.head.metrics("numMatched").value == 1L) // only (1, 20) matches t=15
  }

  test("multi-column keys and duplicate column names across sides") {
    import spark.implicits._
    val l = Seq((1L, "a", 10L, "LP"), (1L, "b", 10L, "LP2")).toDF("k1", "k2", "t", "payload")
    val r = Seq((1L, "a", 9L, "RP"), (1L, "b", 11L, "RP2")).toDF("k1", "k2", "t", "payload")
    val out = AsofMergeJoin.asofBackward(l, r, Seq("k1", "k2"), "t", "t", rightPrefix = "r_")
      .orderBy("k2").collect()
    assert(out(0).getString(3) == "LP" && out(0).getString(4) == "RP")
    assert(out(1).getString(3) == "LP2" && out(1).isNullAt(4))
  }
}
