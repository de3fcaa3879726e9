package graft.inet

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** The CIDR containment JOIN: must equal the brute-force cross-join ×
  * inet_contains result exactly, while planning as an equi-join (the
  * 100 TB shape) rather than a nested loop. */
class InetOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def bruteForce(logs: org.apache.spark.sql.DataFrame,
      nets: org.apache.spark.sql.DataFrame) =
    logs.crossJoin(nets).where(InetFunctions.inet_contains(col("cidr"), col("addr")))

  test("cidrJoin == cross-join + contains on generated v4/v6 data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val addrs = ((1 to 300).map { i =>
      s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
    } ++ (1 to 60).map(_ => f"2001:db8:${rnd.nextInt(0x10000)}%x::${rnd.nextInt(0x10000)}%x") ++
      Seq("not an ip", "10.0.0.300", null)).zipWithIndex
      .map { case (a, i) => (i.toLong, a) }
    val logs = addrs.toDF("log_id", "addr")
    val nets = Seq(
      "10.0.0.0/8", "192.168.0.0/16", "172.16.0.0/12", "0.0.0.0/0",
      s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.0.0/16",
      s"${rnd.nextInt(256)}.0.0.0/6",         // shorter than the bucket: expands
      "203.0.113.7",                           // bare host route
      "2001:db8::/32", "::/0", "garbage/8", "10.1.2.0/33")
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("net_id", "cidr")

    val got = InetOps.cidrJoin(logs, col("addr"), nets, col("cidr"))
      .select("log_id", "net_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(logs, nets)
      .select("log_id", "net_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "test data must produce matches")
    assert(got == want,
      s"missing=${(want -- got).take(10)} extra=${(got -- want).take(10)}")
  }

  test("cidrJoin at smaller bucket widths stays exact") {
    import spark.implicits._
    val logs = Seq((1L, "10.1.2.3"), (2L, "10.200.0.1"), (3L, "11.0.0.1"),
      (4L, "fe80::1"), (5L, "feff::2")).toDF("log_id", "addr")
    val nets = Seq((1L, "10.0.0.0/7"), (2L, "fe80::/10"), (3L, "10.1.0.0/16"))
      .toDF("net_id", "cidr")
    for (k <- Seq(1, 4, 8, 12, 16)) {
      val got = InetOps.cidrJoin(logs, col("addr"), nets, col("cidr"), bucketBits = k)
        .select("log_id", "net_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForce(logs, nets)
        .select("log_id", "net_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"bucketBits=$k")
    }
  }

  test("cidrSemiJoin / cidrAntiJoin partition the log set exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val logs = ((1 to 200).map { i =>
      (i.toLong, s"${rnd.nextInt(64)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}")
    } ++ Seq((900L, "junk"), (901L, null.asInstanceOf[String]))).toDF("log_id", "addr")
    val nets = Seq("10.0.0.0/8", "17.32.0.0/11", "0.0.0.0/2", "21.1.0.0/16")
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("net_id", "cidr")

    val semi = InetOps.cidrSemiJoin(logs, col("addr"), nets, col("cidr"))
      .select("log_id").as[Long].collect().toSet
    val anti = InetOps.cidrAntiJoin(logs, col("addr"), nets, col("cidr"))
      .select("log_id").as[Long].collect().toSet
    val wantSemi = bruteForce(logs, nets).select("log_id").as[Long].collect().toSet
    val all = logs.select("log_id").as[Long].collect().toSet
    assert(semi == wantSemi)
    assert(anti == (all -- wantSemi), "anti must be the exact complement")
    assert(semi.intersect(anti).isEmpty && (semi ++ anti) == all)
    // each semi row appears ONCE even when several subnets match
    assert(InetOps.cidrSemiJoin(logs, col("addr"), nets, col("cidr")).count() == semi.size)
    // unparseable / null addresses match nothing → anti keeps them
    assert(anti.contains(900L) && anti.contains(901L))
  }

  test("cidrJoin plans an equi-join, not a nested loop") {
    import spark.implicits._
    val logs = (1 to 100).map(i => (i.toLong, s"10.0.0.$i")).toDF("log_id", "addr")
    val nets = Seq((1L, "10.0.0.0/8"), (2L, "192.168.0.0/16")).toDF("net_id", "cidr")
    val p = InetOps.cidrJoin(logs, col("addr"), nets, col("cidr"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "containment join must not be a nested loop:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
    // round-15: the bucket keys are StaticInvoke expressions like the
    // rest of the inet family — no interpreted ScalaUDF hop on either
    // side of the join. (The addr-side key does not APPEAR here only
    // because the local test relation lets Catalyst constant-fold it
    // into the LocalTableScan — itself proof it is a native expression;
    // a ScalaUDF is never folded.)
    assert(!p.contains("UDF"), p.take(2000))
    assert(p.contains("static_invoke(graft.inet.InetRuntime.cidrBuckets"), p.take(2000))
  }

  test("security pipeline e2e: zeek conn logs × intel subnets → zeek-format hits") {
    // the full composition the library exists for: ingest real zeek
    // logs, containment-join against an intel list, land the hits as
    // zeek-format output that reads straight back with types intact
    import graft.zeek.ZeekFixtures
    import spark.implicits._
    val in = ZeekFixtures.tempDir()
    ZeekFixtures.write(in, "conn.log", ZeekFixtures.connContent)
    val conn = spark.read.format("zeek").load(s"$in/*.log")
    val intel = Seq((1L, "8.8.0.0/16", "dns-providers"), (2L, "2001:4860::/32", "goog-v6"))
      .toDF("intel_id", "cidr", "tag")
    val hits = InetOps.cidrJoin(conn, col("id_resp_h"), intel, col("cidr"))
      .select(col("ts"), col("uid"), col("id_resp_h"), col("tag"))
    val out = ZeekFixtures.tempDir()
    hits.write.format("zeek").mode("append").option("zeek_path", "intel_hits").save(out.toString)
    val back = spark.read.format("zeek").load(s"$out/*.log")
    assert(back.count() == 3) // 8.8.8.8, 8.8.4.4, and the goog v6 addr
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      "time typing must survive the whole pipeline")
    assert(back.select("tag").distinct().count() == 2)
  }

  test("shared column names and a pre-existing __inet_bucket don't break analysis") {
    // logs and nets both carry `id` and `note`, and each already has a
    // column named __inet_bucket — the join must neither fail with
    // ambiguous-attribute errors nor corrupt the caller's columns
    import spark.implicits._
    val logs = Seq((1L, "keepL", 7, "10.1.2.3"), (2L, "keepL", 8, "11.0.0.1"),
      (3L, "keepL", 9, "8.8.8.8")).toDF("id", "note", "__inet_bucket", "addr")
    val nets = Seq((10L, "keepN", 70, "10.0.0.0/8"), (11L, "keepN", 71, "8.8.0.0/16"))
      .toDF("id", "note", "__inet_bucket", "cidr")

    val inner = InetOps.cidrJoin(logs, col("addr"), nets, col("cidr"))
    assert(inner.count() == 2)
    // caller columns survive untouched (both sides' copies, no temps left)
    assert(inner.columns.count(_ == "id") == 2)
    assert(inner.columns.count(_ == "__inet_bucket") == 2)
    assert(inner.columns.forall(c => !c.startsWith("__inet_bucket1") && !c.startsWith("__inet_addr")))
    assert(inner.select(logs("__inet_bucket")).collect().map(_.getInt(0)).toSet == Set(7, 9))

    val semi = InetOps.cidrSemiJoin(logs, col("addr"), nets, col("cidr"))
    assert(semi.columns.toSeq == logs.columns.toSeq)
    assert(semi.select("id").as[Long].collect().toSet == Set(1L, 3L))
    val anti = InetOps.cidrAntiJoin(logs, col("addr"), nets, col("cidr"))
    assert(anti.select("id").as[Long].collect().toSet == Set(2L))
    assert(anti.select("__inet_bucket").as[Int].collect().toSet == Set(8),
      "the caller's own __inet_bucket values must pass through unchanged")
  }

  test("cidr joins work stream-static: streaming zeek logs enriched against a static intel list") {
    // the operational form: a live conn.log rotation stream containment-
    // joined against a (small, static) intel list. The bucketed equi-join
    // is stream-static-legal — the stream side only gains derived columns
    // map-side; the static side explodes its buckets once per trigger.
    import graft.zeek.ZeekFixtures
    import spark.implicits._
    val in = ZeekFixtures.tempDir()
    ZeekFixtures.write(in, "conn.log", ZeekFixtures.connContent)
    val intel = Seq((1L, "8.8.0.0/16", "dns"), (2L, "2001:4860::/32", "goog6"))
      .toDF("intel_id", "cidr", "tag")
    val stream = spark.readStream.format("zeek").load(s"$in/*.log")
    val hits = InetOps.cidrJoin(stream, col("id_resp_h"), intel, col("cidr"))
      .select("uid", "id_resp_h", "tag")
    val q = hits.writeStream.format("memory").queryName("inet_stream_hits")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("inet_stream_hits").collect()
        .map(r => (r.getString(1), r.getString(2))).toSet
      assert(got.map(_._2) == Set("dns", "goog6"), got.toString)
      assert(spark.table("inet_stream_hits").count() == 3)
      // semi-join flavor also runs stream-static (each log row at most once)
      val semi = InetOps.cidrSemiJoin(stream, col("id_resp_h"), intel, col("cidr"))
      val q2 = semi.writeStream.format("memory").queryName("inet_stream_semi")
        .outputMode("append").start()
      try {
        q2.processAllAvailable()
        assert(spark.table("inet_stream_semi").count() == 3)
      } finally q2.stop()
    } finally q.stop()
  }

  test("subnet bucket expansion is exactly 2^(bucketBits - prefix), capped by family") {
    assert(InetOps.cidrBuckets("10.0.0.0/16", 16).length == 1)
    assert(InetOps.cidrBuckets("10.0.0.0/24", 16).length == 1)
    assert(InetOps.cidrBuckets("10.0.0.0/8", 16).length == 256)
    assert(InetOps.cidrBuckets("10.0.0.0/14", 16).length == 4)
    assert(InetOps.cidrBuckets("1.2.3.4", 16).length == 1) // host route
    assert(InetOps.cidrBuckets("junk", 16).isEmpty)
    assert(InetOps.cidrBuckets("10.0.0.0/33", 16).isEmpty)
    assert(InetOps.cidrBuckets("10.0.0.0/x", 16).isEmpty)
    // the expanded ids line up with address buckets
    val b = InetOps.cidrBuckets("10.4.0.0/14", 16)
    for (a <- Seq("10.4.0.1", "10.5.255.254", "10.6.0.0", "10.7.9.9"))
      assert(b.contains(InetOps.addrBucket(a, 16).get), a)
    assert(!b.contains(InetOps.addrBucket("10.8.0.0", 16).get))
  }
}
