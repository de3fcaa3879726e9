package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore
import graft.zeek.SharedSpark

/** Specs for the mining family: k-core peeling, kNN graph
  * construction, and windowed co-occurrence PMI. */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // ---------------------------------------------------------------- k-core

  /** Straightforward sequential peel (the textbook definition) used as
    * ground truth for KCore.peel. */
  private def brutePeel(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): (Set[Long], Map[Long, Long]) = {
    var es = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var lastDeg: Map[Long, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val deg = es.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
      lastDeg = deg
      val alive = deg.filter(_._2 >= k).keySet
      es = es.filter { case (a, b) => alive(a) && alive(b) }
    }
    val surv = lastDeg.filter(_._2 >= k)
    (surv.keySet, surv)
  }

  private def runPeel(edges: Seq[(Long, Long)], k: Int, rounds: Int) = {
    import spark.implicits._
    val e = edges.toDF("pa", "pb")
    val sym = e.select(col("pa").as("s"), col("pb").as("t"))
      .union(e.select(col("pb"), col("pa")))
    KCore.peel(sym, k, rounds).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
  }

  test("k-core: clique survives, pendant tail cascades off over rounds") {
    // 4-clique {1,2,3,4} (degree 3 inside) + tail 4-5-6: 6 has degree 1
    // (dies round 1), 5 then has degree 1 (dies round 2), clique keeps
    // degree >= 3 only after the tail stops counting toward 4's degree.
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = clique ++ Seq((4L, 5L), (5L, 6L))
    val got = runPeel(edges, k = 3, rounds = 3)
    val (aliveSet, degs) = brutePeel(edges, k = 3, rounds = 3)
    assert(got.length == 6) // every node reported
    for ((n, inCore, deg) <- got) {
      assert((inCore == 1) == aliveSet(n), s"node $n flag")
      assert(deg == degs.getOrElse(n, 0L), s"node $n degree")
    }
    assert(aliveSet == Set(1L, 2L, 3L, 4L))
  }

  test("k-core: matches the sequential peel on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    for (k <- Seq(2, 5, 8)) {
      val got = runPeel(edges, k, rounds = 4)
        .map { case (n, f, dg) => n -> ((f, dg)) }.toMap
      val (aliveSet, degs) = brutePeel(edges, k, rounds = 4)
      for ((n, (f, dg)) <- got) {
        assert((f == 1) == aliveSet(n), s"k=$k node $n flag")
        assert(dg == degs.getOrElse(n, 0L), s"k=$k node $n degree")
      }
    }
  }

  // ------------------------------------------------------------- kNN graph

  test("knn graph: duplicate vectors are mutual top-1 with maximal cosine") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def vec() = Array.fill(64)(rnd.nextFloat() * 0.4f - 0.2f)
    val twin = vec()
    val rows = Seq(0L -> twin, 1L -> twin.clone()) ++
      (2L to 40L).map(i => i -> vec())
    val emb = rows.toDF("vec_id", "embedding")
    val g = MiningQueries.knnGraphQuantized(emb, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // identical vectors share every LSH bucket, so each must see the
    // other as its rank-1 neighbor (quantized cosine exactly 1)
    assert(g.exists { case (v, rk, n, _) => v == 0L && rk == 1L && n == 1L })
    assert(g.exists { case (v, rk, n, _) => v == 1L && rk == 1L && n == 0L })
    // per-node invariants: contiguous ranks from 1, <= topK rows
    for ((v, rows) <- g.groupBy(_._1)) {
      val rks = rows.map(_._2).sorted
      assert(rks.length <= 3 && rks.sameElements(1L to rks.length), s"node $v ranks")
    }
  }

  test("knn graph: bucket occupancy cap bounds a signature-collision flood") {
    import spark.implicits._
    // 30 IDENTICAL vectors share every bucket; cap 5 keeps only the 5
    // lowest ids as candidates, so candidate volume is probes × 5, not
    // probes × 30 — and every surviving candidate id is < 5
    val rnd = new scala.util.Random(31)
    val twin = Array.fill(64)(rnd.nextFloat() * 0.4f - 0.2f)
    val emb = (0L until 30L).map(i => i -> twin.clone()).toDF("vec_id", "embedding")
    val capped = MiningQueries.knnCandidatesQuantized(emb, bucketCap = 5).collect()
    assert(capped.nonEmpty)
    assert(capped.map(_.getLong(1)).forall(_ < 5L), "only the 5 lowest ids survive as candidates")
    val uncapped = MiningQueries.knnCandidatesQuantized(emb, bucketCap = 4096).count()
    assert(capped.length < uncapped, "cap actually reduced candidate volume")
  }

  test("knn graph: qdot matches a driver-side quantized dot product") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextFloat() * 0.4f - 0.2f)
    val rows = (0L to 30L).map(i => i -> vec())
    val byId = rows.toMap
    val emb = rows.toDF("vec_id", "embedding")
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1024.0).toLong)
    val g = MiningQueries.knnGraphQuantized(emb, topK = 3).collect()
    assert(g.nonEmpty)
    for (r <- g) {
      val (a, b) = (q(byId(r.getLong(0))), q(byId(r.getLong(2))))
      val expect = a.zip(b).map { case (x, y) => x * y }.sum
      assert(r.getLong(3) == expect, s"pair ${r.getLong(0)}-${r.getLong(2)}")
    }
  }

  // ------------------------------------------------------------------- PMI

  test("pmi: planted collocation scores above an anti-correlated pair") {
    import spark.implicits._
    // "alpha beta" always adjacent; "alpha zeta" never within 5 tokens
    val docs = (0L until 30L).map { i =>
      i -> s"alpha beta c$i d$i e$i f$i g$i h$i zeta yy zz ww vv uu tt"
    }.toDF("doc_id", "text")
    val out = MiningQueries.cooccurrencePmi(docs, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val (cAb, pmiAb) = out(("alpha", "beta"))
    assert(cAb == 30L) // once per doc at offset 1
    assert(!out.contains(("alpha", "zeta"))) // distance 8 > window 5
    // yy/zz co-occur too, but alpha-beta must be positive (collocation)
    assert(pmiAb > 0.0)
  }

  // --------------------------------------------------------- triplet mining

  test("triplet mining: planted same/different-label twins are the hard pos/neg") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(64)(rnd.nextFloat() * 0.4f - 0.2f)
    val anchor = vec()
    // 0 = anchor (label 1); 1 = identical twin with SAME label -> pos;
    // 2 = identical twin with DIFFERENT label -> neg; rest random
    val rows = Seq((0L, anchor, 1), (1L, anchor.clone(), 1), (2L, anchor.clone(), 2)) ++
      (3L to 40L).map(i => (i, vec(), (i % 3).toInt))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val labels = emb.select(col("vec_id"), col("label"))
    val c = MiningQueries.knnCandidatesQuantized(emb)
      .join(labels.select(col("vec_id"), col("label").as("a_label")), Seq("vec_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")),
        Seq("neighbor_id"))
    val posOf0 = c.filter(col("vec_id") === 0 && col("n_label") === col("a_label"))
      .orderBy(col("cosq").desc, col("neighbor_id")).limit(1)
      .collect().map(_.getAs[Long]("neighbor_id"))
    val negOf0 = c.filter(col("vec_id") === 0 && col("n_label") =!= col("a_label"))
      .orderBy(col("cosq").desc, col("neighbor_id")).limit(1)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(posOf0.sameElements(Array(1L)), "same-label twin is the hard positive")
    assert(negOf0.sameElements(Array(2L)), "different-label twin is the hard negative")
  }

  // ------------------------------------------------------------ index health

  test("index health: occupancies partition the corpus; imbalance >= 1") {
    val out = graft.SparkEntry.queries("e32_index_health")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.map(_._2).sum == 500L, "every vector lands in exactly one cell")
    assert(out.map(_._3).distinct.size == 1 && out.head._3 == out.length.toLong)
    val imb = out.head._4
    assert(out.map(_._4).distinct.size == 1)
    // Cauchy-Schwarz: nLists * sum(c^2) / N^2 >= n_used_fraction >= 1 when
    // all cells used; equality only for a perfectly uniform spread
    assert(imb >= 1.0 - 1e-12 && imb <= 16.0 + 1e-12, s"imbalance $imb")
  }

  // ------------------------------------------------------------ graph search

  test("graph search: 5 queries x ranks 1..3, no self-hits, qdot recomputes") {
    val out = graft.SparkEntry.queries("e31_graph_search")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).distinct.sorted.sameElements(100L to 104L))
    for ((qid, rows) <- out.groupBy(_._1)) {
      assert(rows.map(_._2).sorted.sameElements(1L to 3L), s"query $qid ranks")
      assert(rows.forall(_._3 != qid), s"query $qid self-hit")
    }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1024.0).toLong).toArray).toMap
    for ((qid, _, node, qdot) <- out) {
      val expect = emb(qid).zip(emb(node)).map { case (x, y) => x * y }.sum
      assert(qdot == expect, s"qdot $qid-$node")
    }
  }

  // ------------------------------------------------------- label propagation

  test("label prop: spreads over rounds, deterministic tie-break, -1 for unreached") {
    import spark.implicits._
    // chain 10 -> 1 -> 2 (labels spread one hop per round); 20 votes
    // between labels 1 and 2 with equal counts (tie -> min label);
    // 30 has no labeled neighbor (stays -1)
    val nodes = Seq(
      (1L, Option(7)), (2L, None), (10L, None), (20L, None), (30L, None),
      (3L, Option(1)), (4L, Option(2)), (31L, None)
    ).toDF("vec_id", "label")
    val edges = Seq(
      (10L, 1L), (2L, 10L), // 10 labels in round 1 (via 1), 2 in round 2 (via 10)
      (20L, 3L), (20L, 4L), // tie between labels 1 and 2 -> min label 1
      (30L, 31L) // unlabeled neighbor only
    ).toDF("vec_id", "neighbor_id")
    val got = MiningQueries.labelProp(nodes, edges, rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -999 else r.getInt(1)), r.getInt(2))).toMap
    assert(got(1L) == ((7, 0)) && got(3L) == ((1, 0)) && got(4L) == ((2, 0)))
    assert(got(10L) == ((7, 1)), "one hop in round 1")
    assert(got(2L) == ((7, 2)), "two hops in round 2")
    assert(got(20L) == ((1, 1)), "vote tie breaks to min label")
    assert(got(30L) == ((-999, -1)) && got(31L) == ((-999, -1)))
  }

  // --------------------------------------------------------------- a-priori

  test("a-priori triples equal brute-force counting on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = ('a' to 'p').map(_.toString)
    val baskets = (0L until 120L).map { i =>
      i -> rnd.shuffle(vocab).take(3 + rnd.nextInt(6)).toSet
    }
    val dt = baskets.flatMap { case (i, ws) => ws.map(w => (i, w)) }.toDF("doc_id", "w")
    val (minItem, minSet) = (0.1, 0.05)
    val nd = baskets.size
    // brute force: count EVERY triple over raw baskets, no pruning
    val expect = baskets.flatMap { case (_, ws) =>
      ws.toSeq.sorted.combinations(3).map(c => (c(0), c(1), c(2)))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter { case (_, c) => c * 1.0 >= minSet * nd }
    val got = MiningQueries.frequentTriples(dt, minItem, minSet)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got == expect, "lossless a-priori pruning")
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------- stickiness

  test("stickiness: dau/wau match a driver-side recount") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val ud = (0 until 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(15).toLong))
    val got = MiningQueries.stickiness(ud.toDF("day", "user_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val dist = ud.distinct
    val (d0, d1) = (dist.map(_._1).min, dist.map(_._1).max)
    assert(got.keySet == (d0 + 6 to d1).toSet, "full windows only")
    for ((day, (dau, wau, st)) <- got) {
      val expDau = dist.filter(_._1 == day).map(_._2).distinct.size.toLong
      val expWau = dist.filter(t => t._1 >= day - 6 && t._1 <= day).map(_._2).distinct.size.toLong
      assert((dau, wau) == ((expDau, expWau)), s"day $day")
      assert(st == dau.toDouble / wau)
    }
  }

  // ---------------------------------------------------------- link prediction

  test("link prediction: equals a brute-force Adamic-Adar recomputation at sf0.001") {
    import scala.math.BigDecimal.RoundingMode
    val got = graft.SparkEntry.queries("q133_link_prediction")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // brute force from the raw table
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { b =>
      val pks = b.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = adj.map { case (k, v) => k -> v.size }
    def term(z: Long) =
      BigDecimal.valueOf(1.0 / math.log(deg(z).toDouble)).setScale(9, RoundingMode.HALF_UP)
    val cand = for {
      (z, ns) <- adj.toSeq
      if deg(z) <= 500
      a <- ns if a < 100
      b <- ns if a < b
    } yield ((a, b), z)
    val scores = cand.groupBy(_._1).map { case ((a, b), zs) =>
      (a, b, zs.size.toLong, zs.map(w => term(w._2)).sum.toDouble)
    }.filter { case (a, b, _, _) => !edges((a, b)) }
    val expect = scores.toSeq.sortBy { case (a, b, _, s) => (-s, a, b) }.take(50)
      .map { case (a, b, n, s) => (a, b, n, s) }
    assert(got.toSeq == expect)
    assert(got.nonEmpty)
  }

  // ---------------------------------------------------------- continuation

  test("continuation pairs: planted boundary match found; hot gram pruned") {
    import spark.implicits._
    // doc 1 ends with "x y z", doc 2 starts with "x y z" -> pair (1, 2);
    // 60 docs share the SAME opener AND closer "hot hot hot" (> maxDf)
    // -> the gram is pruned, contributing one pruned key and NO pairs
    val docs = (Seq(
      (1L, "aa bb cc x y z"),
      (2L, "x y z dd ee ff"),
      (3L, "gg hh ii jj kk ll")
    ) ++ (100L until 160L).map(i => (i, "hot hot hot"))).toDF("doc_id", "text")
    val out = MiningQueries.continuationPairs(docs, k = 3, maxDf = 50).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(out.head.getLong(2) == 1L, "hot boundary gram reported as pruned")
  }

  test("continuation pairs: without the cap the hot gram would be quadratic") {
    import spark.implicits._
    val docs = (100L until 160L).map(i => (i, "hot hot hot")).toDF("doc_id", "text")
    // cap off (maxDf huge): 60 docs all continue each other -> 60*59 pairs
    val uncapped = MiningQueries.continuationPairs(docs, k = 3, maxDf = 10000).count()
    assert(uncapped == 60L * 59L)
    // cap on: zero pairs, one pruned key
    assert(MiningQueries.continuationPairs(docs, k = 3, maxDf = 50).count() == 0L)
  }

  // ------------------------------------------------------------- dup matrix

  test("dup matrix: arithmetic counts equal brute-force pair expansion") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 300).map { i =>
      (s"fp${rnd.nextInt(40)}", s"src${rnd.nextInt(4)}")
    }
    val got = MiningQueries.dupMatrix(rows.toDF("fp", "source"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // brute force: expand every same-fp document pair, classify by source
    val docs = rows.zipWithIndex
    val expect = (for {
      ((fa, sa), ia) <- docs
      ((fb, sb), ib) <- docs
      if ia < ib && fa == fb
    } yield (Seq(sa, sb).min, Seq(sa, sb).max))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expect)
    assert(got.nonEmpty)
  }

  // --------------------------------------------------------- window distinct

  test("window-distinct: the forward projection equals the collect_set window rewrite") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val got = graft.SparkEntry.queries("q134_window_distinct")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the COUNT(DISTINCT) OVER rewrite Spark users would hand-write
    // (correct, but type-partitioned — kept as the semantic twin)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // same tus dispatch as EventQueries.events (tz-free NTZ parts)
    val tus = e.schema("ts").dataType match {
      case LongType            => expr("ts div 1000")
      case _: TimestampNTZType => expr(
        "unix_date(cast(ts as date)) * 86400000000 + " +
          "(hour(ts) * 3600 + minute(ts) * 60) * CAST(1000000 AS BIGINT) + " +
          "cast(extract(SECOND FROM ts) * 1000000 AS BIGINT)")
      case _                   => expr("unix_micros(ts)")
    }
    val base = e.withColumn("tus", tus)
      .select(col("event_type"), expr("tus div 3600000000").as("hidx"), col("user_id"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("hidx")).rangeBetween(-2, 0)
    val twin = base
      .withColumn("u3h", size(collect_set(col("user_id")).over(w)).cast(LongType))
      .select(col("event_type"), col("hidx"), col("u3h")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == twin)
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------- length trim

  test("length trim: per-source p5/p95 band keeps ~90% and bounds are ordered") {
    val rows = graft.SparkEntry.queries("d57_length_trim")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((src, nDocs, nKept, lo, hi) <- rows) {
      assert(lo <= hi, s"$src bounds")
      assert(nKept <= nDocs, src)
      val frac = nKept.toDouble / nDocs
      assert(frac >= 0.85 && frac <= 0.96, s"$src kept fraction $frac")
    }
  }

  // ---------------------------------------------------------------- q132 STL

  test("stl: trend and seasonal are consistent with the output series") {
    val out = graft.SparkEntry.queries("q132_stl_decompose")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    for ((_, rows0) <- out.groupBy(_._1)) {
      val rows = rows0.sortBy(_._2)
      // output = original observed series minus 12 rows at each end, so
      // for output positions 12..len-13 the whole 25-row frame is inside
      // the output — trend must equal its mean there
      for (j <- 12 until rows.length - 12) {
        val frame = rows.slice(j - 12, j + 13).map(_._3)
        assert(math.abs(frame.sum / 25 - rows(j)._4) < 1e-6, s"trend at output pos $j")
      }
      // decomposition identity v = trend + seasonal + resid
      for ((_, _, v, trend, seasonal, resid) <- rows)
        assert(math.abs(v - (trend + seasonal + resid)) < 1e-9)
      // seasonal is constant per hour-of-day
      for ((_, g) <- rows.groupBy(r => r._2 % 24))
        assert(g.map(_._5).distinct.size == 1)
    }
  }

  test("pmi: counts match a driver-side window count on a tiny corpus") {
    import spark.implicits._
    val texts = Seq("a b a c b", "b a a a d", "c c a b e")
    val docs = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("doc_id", "text")
    def pairsOf(t: String): Seq[(String, String)] = {
      val ws = t.split("\\s+").filter(_.nonEmpty)
      for {
        o <- 1 to 5
        i <- 0 until ws.length - o
        if ws.length > o
      } yield {
        val (x, y) = (ws(i), ws(i + o))
        (Seq(x, y).min, Seq(x, y).max)
      }
    }
    val expect = texts.flatMap(pairsOf).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = MiningQueries.cooccurrencePmi(docs, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  // ------------------------------------------------------- q143 modularity

  test("modularity: two planted triangles with one bridge score the textbook Q") {
    import spark.implicits._
    // triangles {0,1,2} and {3,4,5}, bridge 2-3; communities A/B per triangle
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L)).toDF("vec_id", "neighbor_id")
    val lbl = Seq((0L, 1), (1L, 1), (2L, 1), (3L, 2), (4L, 2), (5L, 2))
      .toDF("vec_id", "label")
    val got = MiningQueries.modularityByCommunity(g, lbl)
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // m = 7; each community: lc = 3, dc = 7 -> Q_c = 3/7 - (7/14)^2
    val expQ = 3.0 / 7 - (7.0 / 14) * (7.0 / 14)
    assert(got.toSeq == Seq((1, 3L, 3L, 7L, expQ), (2, 3L, 3L, 7L, expQ)),
      s"got: ${got.toSeq}")
  }

  test("modularity: labeled isolated node contributes a zero-term community") {
    import spark.implicits._
    val g = Seq((0L, 1L)).toDF("vec_id", "neighbor_id")
    val lbl = Seq((0L, 1), (1L, 1), (9L, 7)).toDF("vec_id", "label")
    val got = MiningQueries.modularityByCommunity(g, lbl)
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // community 1 holds the single edge entirely: Q = 1/1 - (2/2)^2 = 0
    assert(got.toSeq == Seq((1, 2L, 1L, 2L, 0.0), (7, 1L, 0L, 0L, 0.0)),
      s"got: ${got.toSeq}")
  }

  test("modularity: mixed labeling splits intra and inter edges correctly") {
    import spark.implicits._
    // square 0-1-2-3-0 with diagonal communities: every edge is inter
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("vec_id", "neighbor_id")
    val lbl = Seq((0L, 1), (2L, 1), (1L, 2), (3L, 2)).toDF("vec_id", "label")
    val got = MiningQueries.modularityByCommunity(g, lbl)
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // m = 4, lc = 0 both, dc = 4 both -> Q_c = 0 - (4/8)^2 = -0.25
    assert(got.toSeq == Seq((1, 0L, 4L, -0.25), (2, 0L, 4L, -0.25)),
      s"got: ${got.toSeq}")
  }

  // ------------------------------------------------------- e40 NN-descent

  test("nn-descent: finds the two-hop neighbor the base graph missed") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.5f, 0.5f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    // base graph only knows 0->1; 2 is reachable as a neighbor-of-neighbor
    val g = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("vec_id", "neighbor_id")
    val got = MiningQueries.nnDescentRound(g, emb, topK = 2)
      .orderBy("vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    // node 0: cos(0,2) > cos(0,1), so 2 ranks first and is NEW
    assert(got.filter(_._1 == 0L).toSeq ==
      Seq((0L, 1L, 2L, true), (0L, 2L, 1L, false)), s"got: ${got.toSeq}")
  }

  test("nn-descent: refinement never worsens the best neighbor (random corpus)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val emb = vecs.toDF("vec_id", "embedding")
    // base graph: a ring with skip links — deliberately not the true kNN
    val g = (0L until 40L).flatMap(i =>
      Seq((i, (i + 1) % 40), (i, (i + 7) % 40))).toDF("vec_id", "neighbor_id")
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1024).toLong)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val qv = vecs.map { case (id, v) => id -> q(v) }.toMap
    val baseBest = (0L until 40L).map(i =>
      i -> Seq((i + 1) % 40, (i + 7) % 40).map(j => cos(qv(i), qv(j))).max).toMap
    val got = MiningQueries.nnDescentRound(g, emb, topK = 1).collect()
    assert(got.length == 40)
    got.foreach { r =>
      val (i, j) = (r.getLong(0), r.getLong(2))
      val c = cos(qv(i), qv(j))
      assert(c >= baseBest(i) - 1e-12, s"node $i: new best $c < base ${baseBest(i)}")
    }
    // on a ring-vs-random mismatch, at least one node must improve
    assert(got.exists(_.getBoolean(4)), "no edge improved — candidate stage broken?")
  }

  // -------------------------------------------------- q144 local clustering

  test("local clustering: triangle nodes score 1, star center scores 0") {
    import spark.implicits._
    // triangle {0,1,2}; star center 3 with leaves 10,11,12 (no leaf edges)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 10L), (3L, 11L), (3L, 12L)).toDF("pa", "pb")
    val got = MiningQueries.localClustering(e, probeMax = 10L, degCap = 500L)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 2L, 1L, 1.0), (1L, 2L, 1L, 1.0),
      (2L, 2L, 1L, 1.0), (3L, 3L, 0L, 0.0)), s"got: ${got.toSeq}")
  }

  test("local clustering: half-connected neighborhood scores the exact fraction; hubs go NULL") {
    import spark.implicits._
    // node 0 with neighbors 1,2,3,4; only (1,2) and (3,4) closed -> 2 of 6 wedges
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 2L), (3L, 4L),
      // node 5: degree 3 > cap 2 -> NULLs
      (5L, 6L), (5L, 7L), (5L, 8L)).toDF("pa", "pb")
    val got = MiningQueries.localClustering(e, probeMax = 6L, degCap = 2L)
      .orderBy("node").collect()
    val n0 = got.find(_.getLong(0) == 0L).get
    // deg 4 > cap 2 -> node 0 is ALSO capped here; re-run with a higher cap
    assert(n0.isNullAt(2) && n0.isNullAt(3))
    val got2 = MiningQueries.localClustering(e, probeMax = 6L, degCap = 500L)
      .orderBy("node").collect()
    val m0 = got2.find(_.getLong(0) == 0L).get
    assert(m0.getLong(1) == 4L && m0.getLong(2) == 2L &&
      m0.getDouble(3) == 2.0 * 2 / (4 * 3), s"node0: $m0")
  }

  // ----------------------------------------------- e46 space health + d70

  test("embedding-space health: totals, bounds and balance arithmetic hold") {
    val d = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("e46_embedding_space_health")(spark, d)
      .collect().head
    val (nv, nOcc, maxB, ent, bal) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(nv == Tables.embeddings(spark, d).count())
    assert(nOcc >= 1 && nOcc <= 256 && maxB >= 1 && maxB <= nv)
    assert(ent >= 0.0 && ent <= 8.0 + 1e-9, s"entropy $ent")
    assert(math.abs(bal - BigDecimal(ent / 8.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("filter agreement: cells partition the corpus; gopher margin matches d45") {
    val d = "/root/testdata/sf0.001"
    val cells = CurationQueries.queries("d70_filter_agreement")(spark, d)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2), r.getLong(3)))
    val total = Tables.documents(spark, d).count()
    assert(cells.map(_._4).sum == total)
    val gopherTrue = cells.filter(_._1).map(_._4).sum
    val d45Pass = graft.SparkEntry.queries("d45_gopher_rules")(spark, d)
      .filter(org.apache.spark.sql.functions.col("pass")).count()
    assert(gopherTrue == d45Pass, s"gopher margin $gopherTrue != d45 $d45Pass")
  }

  // ---------------------------------------------------- e45 index sweep

  test("index sweep: the unified table equals its two arms row-for-row") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("e45_index_sweep")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val lsh = CurationQueries.queries("e25_lsh_radius_sweep")(spark, d).collect()
      .map(r => ("lsh", r.getInt(0).toLong) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ivf = MiningQueries.queries("e36_ivf_nprobe_sweep")(spark, d).collect()
      .map(r => ("ivf", r.getInt(0).toLong) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = (lsh ++ ivf).toMap
    assert(got == expect, s"got $got\nexpect $expect")
    // recall must be monotone in the budget within each family
    Seq("lsh", "ivf").foreach { fam =>
      val rows = got.filter(_._1._1 == fam).toSeq.sortBy(_._1._2).map(_._2._3)
      assert(rows.sliding(2).forall { case Seq(a, b) => b >= a; case _ => true },
        s"$fam recall not monotone: $rows")
    }
  }

  // -------------------------------------------------- e43 incremental kNN

  test("incremental knn: delta equals the full rebuild restricted to affected nodes") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val full = MiningQueries.knnGraphQuantized(emb, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val affected = MiningQueries.knnCandidatesBetween(
        emb.filter(col("vec_id") % 10 =!= 0), emb.filter(col("vec_id") % 10 === 0))
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet ++
      emb.filter(col("vec_id") % 10 === 0).collect().map(_.getLong(0)).toSet
    val got = graft.SparkEntry.queries("e43_incremental_knn")(spark, d).collect()
    val gotEdges = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expectEdges = full.filter(e => affected(e._1))
    assert(gotEdges == expectEdges,
      s"delta != rebuild: missing ${expectEdges -- gotEdges}, extra ${gotEdges -- expectEdges}")
    // untouched old nodes never appear in the delta
    assert(got.map(_.getLong(0)).toSet == affected.intersect(got.map(_.getLong(0)).toSet)
      && got.map(_.getLong(0)).forall(affected))
    // status marks batch membership; surviving old edges are not "new"
    got.foreach { r =>
      val isNewNode = r.getLong(0) % 10 == 0
      assert(r.getString(4) == (if (isNewNode) "insert" else "update"))
      if (isNewNode) assert(r.getBoolean(5), "new-node edges must be is_new_edge")
    }
    assert(got.exists(r => !r.getBoolean(5)),
      "expected at least one surviving old edge in the delta")
  }

  // ----------------------------------------------------- e44 knn deletion

  test("knn deletion: repair equals the remaining-corpus rebuild; unaffected nodes keep their rows") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val remEmb = emb.filter(col("vec_id") % 17 =!= 0)
    val full = MiningQueries.knnGraphQuantized(emb, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rebuild = MiningQueries.knnGraphQuantized(remEmb, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val affected = full.filter(e => e._3 % 17 == 0 && e._1 % 17 != 0).map(_._1)
    val got = graft.SparkEntry.queries("e44_knn_deletion")(spark, d).collect()
    val gotEdges = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotEdges == rebuild.filter(e => affected(e._1)),
      "repair != remaining-corpus rebuild for affected nodes")
    // no tombstoned neighbor survives anywhere in the repair
    assert(got.forall(_.getLong(2) % 17 != 0))
    // the skip-unaffected claim: every unaffected surviving node's
    // rebuild rows are exactly its full-graph rows
    rebuild.filter(e => !affected(e._1)).foreach { e =>
      assert(full(e), s"unaffected node ${e._1} changed: $e")
    }
    assert(affected.nonEmpty, "fixture should tombstone at least one referenced vector")
  }

  // ------------------------------------------- e47 reverse-aware NN-descent

  test("reverse neighbors recover the asymmetric miss a forward round cannot") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    // only 1 -> 2 exists: node 2 has NO forward edges at all
    val g = Seq((1L, 2L)).toDF("vec_id", "neighbor_id")
    val fwd = MiningQueries.nnDescentRound(g, emb, topK = 3).collect()
    assert(!fwd.exists(_.getLong(0) == 2L), "forward round invented edges for node 2")
    val gen = g.union(g.select(col("neighbor_id").as("vec_id"),
      col("vec_id").as("neighbor_id"))).distinct()
    val rev = MiningQueries.nnDescentRound(gen, emb, topK = 3).collect()
    val n2 = rev.filter(_.getLong(0) == 2L)
    assert(n2.length == 1 && n2.head.getLong(2) == 1L,
      "reverse edge must give node 2 its neighbor back")
  }

  test("q150: capped funnel never exceeds the uncapped q80 counts and is monotone") {
    val d = "/root/testdata/sf0.001"
    def steps(q: String): Map[Int, Long] =
      graft.SparkEntry.queries(q)(spark, d).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val capped = steps("q150_capped_funnel")
    val open = steps("q80_funnel")
    (1 to 3).foreach(i => assert(capped(i) <= open(i), s"step $i exceeds uncapped"))
    assert(capped(1) >= capped(2) && capped(2) >= capped(3), "funnel must narrow")
    assert(capped(2) < open(2) || capped(3) < open(3),
      "the 24h cap should bite somewhere at this SF")
  }

  // ------------------------------------------------------ e42 graph recall

  test("graph recall: matches a driver-side replay at sf0.001; refinement is monotone") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1024).toLong)
    val qv = vecs.map { case (id, v) => id -> q(v) }
    def cos(a: Long, b: Long): Double = {
      val dot = qv(a).zip(qv(b)).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(qv(a).map(x => x * x).sum.toDouble) *
        math.sqrt(qv(b).map(x => x * x).sum.toDouble))
    }
    val g = MiningQueries.knnGraphQuantized(
        Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")), topK = 3)
      .select(col("vec_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = g.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val probes = vecs.keySet.filter(_ < 8).toSeq.sorted
    def top3(p: Long, cands: Set[Long]): Set[Long] =
      cands.toSeq.sortBy(c => (-cos(p, c), c)).take(3).toSet
    val expect = probes.map { p =>
      val exact = top3(p, vecs.keySet - p)
      val base = adj.getOrElse(p, Set.empty)
      val cand = base ++ base.flatMap(v => adj.getOrElse(v, Set.empty)) - p
      val refined = top3(p, cand)
      (p, (base & exact).size.toLong, (refined & exact).size.toLong)
    }
    val got = graft.SparkEntry.queries("e42_graph_recall")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect, s"got: ${got.toSeq}\nexpect: $expect")
    got.foreach { case (p, hb, hr) =>
      assert(hr >= hb, s"probe $p: refinement lost recall ($hr < $hb)")
    }
  }

  // ------------------------------------------------------ e41 grid density

  test("grid density: two blobs cluster separately, sparse cells are noise") {
    import spark.implicits._
    val pts =
      ((0 until 10).map(i => (i.toLong, 0L, 0L)) ++          // blob A core cell
        (10 until 18).map(i => (i.toLong, 0L, 1L)) ++        // adjacent core cell
        (18 until 27).map(i => (i.toLong, 5L, 5L)) ++        // blob B (far away)
        Seq((27L, 9L, 9L), (28L, -3L, 2L)))                  // noise singletons
        .toDF("vec_id", "gx", "gy")
    val got = MiningQueries.gridDensityClusters(pts, minPts = 8, rounds = 3)
      .orderBy("gx", "gy").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    // A's two adjacent core cells merge under min label 0*100000+0 = 0
    assert(got((0L, 0L)) == ((10L, true, Some(0L), Some(18L))))
    assert(got((0L, 1L)) == ((8L, true, Some(0L), Some(18L))))
    // B is its own cluster
    assert(got((5L, 5L)) == ((9L, true, Some(500005L), Some(9L))))
    // noise cells: not core, no cluster
    assert(got((9L, 9L)) == ((1L, false, None, None)))
    assert(got((-3L, 2L)) == ((1L, false, None, None)))
  }

  test("grid density: diagonal adjacency connects, a 2-cell gap does not") {
    import spark.implicits._
    val pts =
      ((0 until 8).map(i => (i.toLong, 0L, 0L)) ++
        (8 until 16).map(i => (i.toLong, 1L, 1L)) ++         // diagonal neighbor
        (16 until 24).map(i => (i.toLong, 4L, 4L)))          // 2+ cells away
        .toDF("vec_id", "gx", "gy")
    val got = MiningQueries.gridDensityClusters(pts, minPts = 8, rounds = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(got((0L, 0L)) == got((1L, 1L)), "diagonal cells share a cluster")
    assert(got((4L, 4L)) != got((0L, 0L)), "distant core cell stays separate")
  }
}
