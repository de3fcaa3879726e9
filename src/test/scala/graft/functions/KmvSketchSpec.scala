package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** The KMV distinct sketch's distributed-aggregate contract: the result
  * must be INVARIANT to partitioning (partial/merge order), exact below
  * saturation, and accurate above it. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def estimate(df: org.apache.spark.sql.DataFrame, k: Int): Double = {
    KmvSketch.registerAll(spark)
    df.agg(call_function("kmv_distinct", col("v"), lit(k)).as("e"))
      .collect()(0).getDouble(0)
  }

  test("exact below saturation, partition-invariant always") {
    import spark.implicits._
    val small = (1 to 40).map(i => s"val$i").toDF("v")
    assert(estimate(small, 64) == 40.0) // |set| < k → the sketch IS the count
    val big = (1 to 5000).map(i => s"value-$i").toDF("v")
    val e1 = estimate(big.repartition(1), 128)
    val e7 = estimate(big.repartition(7), 128)
    val e32 = estimate(big.repartition(32), 128)
    assert(e1 == e7 && e7 == e32, s"partitioning changed the sketch: $e1 $e7 $e32")
  }

  test("estimation accuracy ~ 1/sqrt(k) on 5000 distinct values") {
    import spark.implicits._
    val big = (1 to 5000).map(i => s"value-$i").toDF("v")
    val est = estimate(big, 128)
    assert(math.abs(est - 5000) / 5000.0 < 0.3, s"estimate $est too far from 5000")
    // duplicates must not inflate the estimate (hash-set semantics)
    val dup = big.union(big).union(big)
    assert(estimate(dup, 128) == est)
  }

  test("kmv_sample: partition-invariant, duplicate-insensitive, draw-ordered") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    val df = (1 to 1000).map(i => s"doc-$i").toDF("v")
    def sample(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.agg(call_function("kmv_sample", col("v"), lit(10)).as("s"))
        .collect()(0).getSeq[String](0)
    val s1 = sample(df.repartition(1))
    val s9 = sample(df.repartition(9))
    assert(s1 == s9, s"partitioning changed the sample: $s1 vs $s9")
    assert(s1.size == 10 && s1.distinct.size == 10)
    assert(sample(df.union(df)) == s1) // duplicates cannot re-draw
  }

  test("min_k_strings == slice(array_sort(collect_set), 1, k) bit for bit") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    val rnd = new scala.util.Random(2026L)
    // groups with < k, == k, and >> k distinct values; duplicates; empty
    // strings; multi-byte; and enough rows across partitions to force
    // partial/merge + serialize round-trips
    val rows = (1 to 20000).map { _ =>
      val g = rnd.nextInt(20)
      val v = rnd.nextInt(g * 40 + 2) // group g has up to 40g+2 distinct
      (g, if (v == 0) "" else if (v == 1) s"你好$v" else s"h${v}x")
    }
    val df = rows.toDF("g", "v").repartition(13)
    for (k <- Seq(1, 5, 32)) {
      val got = df.groupBy("g")
        .agg(KmvSketch.minKStrings(col("v"), k).as("r"),
          expr(s"slice(array_sort(collect_set(v)), 1, $k)").as("exp"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k group=${r.getInt(0)}: ${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
      }
    }
    // SQL registration path + null handling (nulls skipped like collect_set)
    val s = Seq((1, Some("b")), (1, None), (1, Some("a")), (1, Some("b")))
      .toDF("g", "v")
    s.createOrReplaceTempView("mks")
    val viaSql = spark.sql("SELECT min_k_strings(v, 2) FROM mks GROUP BY g")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("a", "b"))
  }

  test("min_k_longs == slice(array_sort(collect_set), 1, k) bit for bit") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    val rnd = new scala.util.Random(2027L)
    // groups with < k, == k, and >> k distinct values; duplicates;
    // negatives; extremes; 13 partitions forces partial/merge +
    // serialize round-trips
    val rows = (1 to 20000).map { _ =>
      val g = rnd.nextInt(20)
      val v = rnd.nextInt(g * 40 + 2).toLong
      (g, if (v == 0) Long.MinValue else if (v == 1) Long.MaxValue else v - 20)
    }
    val df = rows.toDF("g", "v").repartition(13)
    for (k <- Seq(1, 5, 32)) {
      val got = df.groupBy("g")
        .agg(KmvSketch.minKLongs(col("v"), k).as("r"),
          expr(s"slice(array_sort(collect_set(v)), 1, $k)").as("exp"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"k=$k group=${r.getInt(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
      }
    }
    // SQL registration path + null handling (nulls skipped like collect_set)
    val s = Seq((1, Some(7L)), (1, None), (1, Some(3L)), (1, Some(7L)))
      .toDF("g", "v")
    s.createOrReplaceTempView("mkl")
    val viaSql = spark.sql("SELECT min_k_longs(v, 2) FROM mkl GROUP BY g")
      .collect()(0).getSeq[Long](0)
    assert(viaSql == Seq(3L, 7L))
  }

  test("min_k_longs_merge(arrays) == min_k_longs(exploded elements)") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    val rnd = new scala.util.Random(2028L)
    // variable-width arrays, duplicates within and across rows, empty
    // arrays, 13 partitions for partial/merge + serialize round-trips
    val rows = (1 to 5000).map { _ =>
      val g = rnd.nextInt(12)
      val w = rnd.nextInt(6)
      (g, (0 until w).map(_ => rnd.nextInt(g * 30 + 2).toLong - 10))
    }
    val df = rows.toDF("g", "regs").repartition(13)
    for (k <- Seq(1, 4, 32)) {
      val merged = df.groupBy("g")
        .agg(KmvSketch.minKLongsMerge(col("regs"), k).as("r"))
      val exploded = df.select(col("g"), explode(col("regs")).as("h"))
        .groupBy("g")
        .agg(KmvSketch.minKLongs(col("h"), k).as("r"))
      val m = merged.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val e = exploded.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      // explode drops groups whose every array is empty; merge keeps them
      // with an empty register — compare on the exploded key set and pin
      // the merge-only groups to empty
      e.foreach { case (g, v) => assert(m(g) == v, s"k=$k group=$g") }
      (m.keySet -- e.keySet).foreach(g => assert(m(g).isEmpty, s"k=$k group=$g"))
    }
    // NULL elements in a nullable array<bigint> are SKIPPED, matching
    // min_k_longs(explode(...)) whose update skips null inputs — a null
    // read as getLong would silently insert 0 into the sketch (the
    // function is SQL-registered, so user arrays can be nullable)
    val nullable = Seq((1, Seq(Some(7L), None, Some(3L))),
      (1, Seq[Option[Long]](None)), (2, Seq[Option[Long]](None, None)))
      .toDF("g", "regs")
    nullable.createOrReplaceTempView("mklm_nulls")
    val viaSql = spark.sql(
      "SELECT g, min_k_longs_merge(regs, 4) AS r FROM mklm_nulls GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql(1) == Seq(3L, 7L), "null elements must be skipped, not read as 0")
    assert(viaSql(2).isEmpty, "all-null arrays must yield an empty register")
  }

  test("null inputs are ignored, not hashed") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    assert(estimate(df, 8) == 2.0)
  }

  test("kmv_pair_stats: planted overlap matches a from-scratch replay") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    // |A|=300, |B|=250, |A∩B|=150 (shared-i for i in 150..299), J=0.375
    val a = ((0 until 150).map(i => s"only-a-$i") ++
      (150 until 300).map(i => s"shared-$i")).map(("A", _))
    val b = ((0 until 100).map(i => s"only-b-$i") ++
      (150 until 300).map(i => s"shared-$i")).map(("B", _))
    val df = (a ++ b).toDF("side", "v").repartition(7)
    val k = 32
    val st = df.groupBy("side").agg(call_function("kmv_state", col("v"), lit(k)).as("st"))
    val row = st.filter(col("side") === "A").crossJoin(
        st.filter(col("side") === "B").select(col("st").as("st2")))
      .select(call_function("kmv_pair_stats", col("st"), col("st2"), lit(k)).as("ps"))
      .select("ps.*").collect()(0)
    val (matches, unionEst, interEst, jaccardEst) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // from-scratch reference: same hash, same bottom-k construction
    val ha = a.map(x => KmvHash.hash60(x._2)).sorted.take(k).toSet
    val hb = b.map(x => KmvHash.hash60(x._2)).sorted.take(k).toSet
    val l = (ha ++ hb).toSeq.sorted.take(k)
    val expMatches = l.count(h => ha(h) && hb(h)).toLong
    val expUnion = (k - 1).toDouble * 1152921504606846976.0 / l.last.toDouble
    assert(matches == expMatches && matches > 0, s"matches $matches vs $expMatches")
    assert(unionEst == expUnion)
    assert(jaccardEst == matches.toDouble / l.size.toDouble)
    assert(interEst == matches.toDouble * expUnion / l.size.toDouble)
    // estimates in a sane band around the true values (350 / 0.375)
    assert(math.abs(unionEst - 350) / 350.0 < 0.5, s"union $unionEst")
    assert(math.abs(jaccardEst - 0.375) < 0.25, s"jaccard $jaccardEst")
    // symmetry: swapping the states cannot change any estimate
    val sym = st.filter(col("side") === "B").crossJoin(
        st.filter(col("side") === "A").select(col("st").as("st2")))
      .select(call_function("kmv_pair_stats", col("st"), col("st2"), lit(k)).as("ps"))
      .select("ps.*").collect()(0)
    assert(sym.getLong(0) == matches && sym.getDouble(1) == unionEst &&
      sym.getDouble(2) == interEst && sym.getDouble(3) == jaccardEst)
  }

  test("kmv_pair_stats: disjoint and identical sets hit the boundaries") {
    import spark.implicits._
    KmvSketch.registerAll(spark)
    val df = ((1 to 50).map(i => ("X", s"x-$i")) ++
      (1 to 50).map(i => ("Y", s"y-$i")) ++
      (1 to 50).map(i => ("Z", s"x-$i"))).toDF("side", "v")
    val st = df.groupBy("side").agg(call_function("kmv_state", col("v"), lit(16)).as("st"))
    def pair(s1: String, s2: String) =
      st.filter(col("side") === s1).crossJoin(
          st.filter(col("side") === s2).select(col("st").as("st2")))
        .select(call_function("kmv_pair_stats", col("st"), col("st2"), lit(16)).as("ps"))
        .select("ps.*").collect()(0)
    val dis = pair("X", "Y")
    assert(dis.getLong(0) == 0L && dis.getDouble(3) == 0.0)
    val same = pair("X", "Z") // identical value sets → full-match merge
    assert(same.getLong(0) == 16L && same.getDouble(3) == 1.0)
    assert(same.getDouble(1) == same.getDouble(2)) // inter == union at J=1
  }
}
