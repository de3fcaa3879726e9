package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** Planted-data invariants for the corpus-audit family (d58-d61) and
  * the round-7 session-3 additions (q136, q137, e33). */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- d58 spans

  test("dup spans: shared run merges to one maximal span per doc") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f q r s"),
      // internal repetition only — 'm n o p q' twice in the SAME doc
      (3L, "m n o p q m n o p q")).toDF("doc_id", "text")
    val got = AuditQueries.dupSpans(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: grams at pos 1..2 duplicated -> span tokens 1..6
    // doc 2: grams at pos 3..4 duplicated -> span tokens 3..8
    assert(got.toSeq == Seq((1L, 1L, 6L, 6L, 2L), (2L, 3L, 8L, 6L, 2L)),
      s"got: ${got.toSeq}")
    // doc 3 absent: df counts DISTINCT docs, within-doc repetition is not duplication
    assert(!got.exists(_._1 == 3L))
  }

  // ------------------------------------------------------------ d59 chunks

  test("cdc chunks: partition the doc; chunking is shift-resistant") {
    // deterministic pseudo-random token stream
    val words = (0 until 120).map(i => s"w${(i * 37 + 11) % 53}")
    val a = words.mkString(" ")
    val b = ("zzz " + a)
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val ch = AuditQueries.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val aCh = ch.filter(_._1 == 1L).sortBy(_._2)
    val bCh = ch.filter(_._1 == 2L).sortBy(_._2)
    // chunks tile the token stream exactly
    assert(aCh.map(_._4).sum == 120)
    assert(bCh.map(_._4).sum == 121)
    for (c <- Seq(aCh, bCh)) {
      val starts = c.map(_._3)
      val ends = c.map(x => x._3 + x._4)
      assert(starts.head == 1L)
      assert(starts.tail.sameElements(ends.init), "chunks are contiguous")
    }
    // THE content-defined property: a single token prepended to the doc
    // re-fingerprints at most the first chunk — every later chunk of A
    // reappears in B verbatim (fixed-stride chunking would shift all).
    val aFps = aCh.map(_._5).drop(1).toSet
    val bFps = bCh.map(_._5).toSet
    assert(aFps.subsetOf(bFps),
      s"missing after shift: ${aFps.diff(bFps).size} of ${aFps.size}")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cdc chunks equal a sequential reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (1L to 8L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(150))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val got = AuditQueries.cdcChunks(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    val expect = docs.flatMap { case (id, text) =>
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      // boundary AFTER token i when md5(trailing 3-gram) has first-8-hex % 16 == 0
      val boundary = (1 to t.length).map { i =>
        i >= 3 && java.lang.Long.parseLong(
          md5Hex(t.slice(i - 3, i).mkString(" ")).take(8), 16) % 16 == 0
      }
      val chunkId = boundary.scanLeft(0L)((acc, b) => acc + (if (b) 1 else 0)).init
      (1 to t.length).groupBy(i => chunkId(i - 1)).toSeq.map { case (cid, ps) =>
        val (start, n) = (ps.min.toLong, ps.size.toLong)
        (id, cid, start, n, md5Hex(t.slice(start.toInt - 1, start.toInt - 1 + n.toInt).mkString(" ")))
      }
    }.toSet
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5)) == expect)
  }

  test("dup spans equal a sequential reference on random corpora with planted overlaps") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10")
    val shared = Seq.fill(9)(vocab(rnd.nextInt(vocab.size)))
    val docs = (1L to 6L).map { i =>
      val own = Seq.fill(10 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      // plant the shared run into half the docs at a random offset
      val t = if (i % 2 == 0) {
        val at = rnd.nextInt(own.size)
        own.take(at) ++ shared ++ own.drop(at)
      } else own
      (i, t.mkString(" "))
    }
    val got = AuditQueries.dupSpans(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val grams = docs.map { case (id, text) =>
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> (1 to t.length - 4).map(i => i -> t.slice(i - 1, i + 4).mkString(" "))
    }.toMap
    val df = grams.toSeq.flatMap { case (id, g) => g.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expect = grams.toSeq.flatMap { case (id, g) =>
      val dupPos = g.filter(x => df(x._2) > 1).map(_._1)
      // islands of consecutive duplicated positions
      dupPos.foldLeft(List.empty[List[Int]]) {
        case (h :: t, p) if p == h.head + 1 => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }.map { isl =>
        val (mn, mx) = (isl.min.toLong, isl.max.toLong)
        (id, mn, mx + 4, mx + 5 - mn, isl.size.toLong)
      }
    }.toSet
    assert(got == expect, s"got ${got.size} spans vs expected ${expect.size}")
  }

  // ------------------------------------------------------------ d61 phrase

  test("phrase search: adjacency required, repeated words need both offsets") {
    val docs = Seq(
      (1L, "table table x"),
      (2L, "table x table"),
      (3L, "a b a b a")).toDF("doc_id", "text")
    val phrases = Seq((1L, "table table"), (2L, "a b a")).toDF("phrase_id", "phrase")
    val got = AuditQueries.phraseSearch(docs, phrases)
      .orderBy("phrase_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2 has both 'table's but NOT adjacent -> no match
    // 'a b a' overlaps itself in doc 3: starts at 1 and 3
    assert(got.toSeq == Seq((1L, 1L, 1L, 1L), (2L, 3L, 2L, 1L)), s"got: ${got.toSeq}")
  }

  // ------------------------------------------------------------- q136 cusum

  test("cusum: planted level shift is found at the step boundary") {
    val rows = (1 to 100).map { i =>
      ("m", i.toLong, i.toLong * 1000L, if (i <= 50) 10.0 else 20.0)
    }
    val ev = rows.toDF("event_type", "event_id", "tus", "value")
    val got = EventQueries.cusumChangepoints(ev).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("cp_index") == 50L)
    assert(r.getAs[Long]("cp_event_id") == 50L)
    // |S_50| = |100 * (50 * 10000) - 50 * 1500000| = 25,000,000 exactly
    assert(r.getAs[Double]("cusum_max") == 2.5e7)
  }

  // ------------------------------------------- q137 neighborhood function

  test("neighborhood function: path graph counts grow one hop per round") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val sym = e.select(col("pa").as("es"), col("pb").as("et"))
      .union(e.select(col("pb"), col("pa")))
    val seeds = Seq(1L, 3L).toDF("seed")
    val got = MiningQueries.neighborhoodCounts(sym, seeds, rounds = 3)
      .orderBy("seed", "r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 4L),   // 1 -> {1,2}, {1,2,3}, {1,2,3,4}
      (3L, 1L, 3L), (3L, 2L, 5L), (3L, 3L, 5L)),  // 3 is the center of the path
      s"got: ${got.toSeq}")
  }

  test("neighborhood function: seeds across the 64-bit mask-group boundary") {
    // the bitmask state keys on (seed >> 6, seed & 63): 1 and 3 share
    // group 0, 70 and 129 land in groups 1 and 2 — counts must come out
    // per SEED, not per group, and seed values must reconstruct exactly
    val e = Seq((1L, 3L), (3L, 70L), (70L, 129L)).toDF("pa", "pb")
    val sym = e.select(col("pa").as("es"), col("pb").as("et"))
      .union(e.select(col("pb"), col("pa")))
    val seeds = Seq(1L, 70L, 129L).toDF("seed")
    val got = MiningQueries.neighborhoodCounts(sym, seeds, rounds = 2)
      .orderBy("seed", "r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L), (1L, 2L, 3L),     // 1 -> {1,3}, {1,3,70}
      (70L, 1L, 3L), (70L, 2L, 4L),   // 70 -> {3,70,129}, all
      (129L, 1L, 2L), (129L, 2L, 3L)), // 129 -> {70,129}, {3,70,129}
      s"got: ${got.toSeq}")
  }

  // -------------------------------------------------------- q138 hyperball

  test("hyperball: below the register cap the estimate IS the exact neighborhood size") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val sym = e.select(col("pa").as("es"), col("pb").as("et"))
      .union(e.select(col("pb"), col("pa")))
    val got = MiningQueries.hyperballEstimates(sym, rounds = 2, k = 32)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 2-hop neighborhoods on the 1-2-3-4-5 path (incl. self)
    val expect = Map(1L -> 3L, 2L -> 4L, 3L -> 5L, 4L -> 4L, 5L -> 3L)
    assert(got.length == 5)
    for ((n, nReg, nEst) <- got) {
      assert(nReg == expect(n), s"node $n register size")
      assert(nEst == expect(n).toDouble, s"node $n exact estimate")
    }
  }

  test("hyperball: capped registers estimate within KMV error on a clique") {
    val n = 60
    val e = (for (a <- 1 to n; b <- 1 to n if a < b) yield (a.toLong, b.toLong))
      .toDF("pa", "pb")
    val sym = e.select(col("pa").as("es"), col("pb").as("et"))
      .union(e.select(col("pb"), col("pa")))
    val got = MiningQueries.hyperballEstimates(sym, rounds = 1, k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for ((node, nReg, nEst) <- got) {
      assert(nReg == 16L, s"node $node register should cap at k")
      // true |N| = 60; KMV with k=16 has ~25% relative sd — 3σ bound
      assert(nEst > 15.0 && nEst < 240.0, s"node $node estimate $nEst")
    }
  }

  // --------------------------------------------------------- e33 k-center

  test("k-center init matches the sequential farthest-first traversal") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f)), (1L, Array(0.1f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)), (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)), (5L, Array(1.0f, 1.0f, 1.0f)),
      (6L, Array(0.5f, 0.5f, 0.0f)), (7L, Array(0.9f, 0.1f, 0.8f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = MiningQueries.kcenterInit(spark, emb, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // sequential ground truth with the same floor(v*1024) quantization
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1024).toLong)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qv = vecs.map { case (id, v) => (id, q(v)) }
    var centers = Vector(qv.minBy(_._1))
    var expect = Vector((1L, centers.head._1, 0L))
    for (r <- 2 to 4) {
      val scored = qv.map { case (id, v) => (id, centers.map(c => d2(c._2, v)).min) }
      val pick = scored.maxBy { case (id, md) => (md, -id) }
      centers :+= qv.find(_._1 == pick._1).get
      expect :+= ((r.toLong, pick._1, pick._2))
    }
    assert(got.toSeq == expect, s"got: ${got.toSeq}\nexpect: $expect")
  }

  // ---------------------------------------------------- q147 concurrency

  test("concurrency: profile is non-negative, ends at zero, max matches a recount") {
    val sf = "/root/testdata/sf0.001"
    val got = EventQueries.queries("q147_concurrency")(spark, sf)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (t, _, c) => assert(c >= 0, s"negative concurrency at $t") }
    assert(got.last._3 == 0, "every interval must close by the final boundary")
    // sequential sweep recount
    var acc = 0L
    got.foreach { case (_, d, c) => acc += d; assert(acc == c) }
    assert(got.map(_._3).max > 1, "fixture should overlap somewhere")
  }

  // -------------------------------------------------------- q146 benford

  test("benford: counts partition the table, expected follows log10(1+1/d)") {
    val sf = "/root/testdata/sf0.001"
    val got = AuditQueries.queries("q146_benford")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables.lineitem(spark, sf).count()
    assert(got.map(_._2).sum == total)
    got.foreach { case (dg, n, obs, exp) =>
      assert(dg.length == 1 && dg.head.isDigit && dg != "0")
      assert(math.abs(exp - math.log10(1.0 + 1.0 / dg.toInt)) < 1e-8, s"digit $dg exp $exp")
      assert(math.abs(obs - n.toDouble / total) < 1e-5)
    }
    // prices spread over orders of magnitude: low digits must dominate 9
    val byDigit = got.map(d => d._1 -> d._2).toMap
    assert(byDigit.getOrElse("1", 0L) > byDigit.getOrElse("9", 0L))
  }

  // ------------------------------------------------------- q145 survival

  test("survival table: planted cohort yields the textbook KM rows") {
    val day = 86400000000L
    val ev = Seq(
      (1L, "signup", 0L), (1L, "purchase", 2 * day),
      (2L, "signup", 0L), (2L, "purchase", 2 * day),
      (3L, "signup", 0L), (3L, "purchase", 5 * day),
      (4L, "signup", 0L),                               // censored at day 10
      (5L, "signup", 3 * day),                          // censored at day 7
      (6L, "signup", 4 * day), (6L, "purchase", 1 * day), // pre-signup purchase ignored
      (9L, "view", 10 * day)                            // sets stream end; no signup
    ).toDF("user_id", "event_type", "tus")
    val got = EventQueries.survivalTable(ev).orderBy("t_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // 6 subjects; events at day 2 (x2) and day 5; risk set shrinks by
    // prior removals only
    assert(got.toSeq == Seq(
      (2L, 6L, 2L, 0L, 0.666667),
      (5L, 4L, 1L, 0L, 0.75)), s"got: ${got.toSeq}")
  }

  // ----------------------------------------------------------- d68 quota

  test("source quota: greedy md5-priority draw matches a sequential replay") {
    val docs = Seq(
      (1L, "srcA", "a b c d e f g h i j"),          // 10 tokens
      (2L, "srcA", "a b c d e f g"),                // 7
      (3L, "srcA", "a b c d e"),                    // 5
      (4L, "srcB", "one two three"),                // 3
      (5L, "srcB", ("x " * 30).trim)                // 30
    ).toDF("doc_id", "source", "text")
    val budget = 15L
    val got = AuditQueries.sourceQuota(docs, budget)
      .orderBy("source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    // sequential ground truth with the same md5 priority + cumsum rule
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = Seq((1L, "srcA", 10L), (2L, "srcA", 7L), (3L, "srcA", 5L),
      (4L, "srcB", 3L), (5L, "srcB", 30L))
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val ordered = ds.sortBy(d => (md5hex(s"quota:${d._1}"), d._1))
      var cum = 0L
      var kept = 0L
      var keptToks = 0L
      ordered.foreach { d =>
        cum += d._3
        if (cum <= budget) { kept += 1; keptToks += d._3 }
      }
      val (nDocs, total, nKept, keptTokens) = got(src)
      assert(nDocs == ds.size && total == ds.map(_._3).sum, s"$src totals")
      assert(nKept == kept && keptTokens == keptToks,
        s"$src kept: got ($nKept, $keptTokens) expect ($kept, $keptToks)")
    }
    // the budget is a hard per-source cap
    got.values.foreach { case (_, _, _, keptTokens) => assert(keptTokens <= budget) }
  }
}
