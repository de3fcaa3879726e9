package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark
import StreamOps._

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // NOTE: base offset of 1 hour — an event at exactly epoch 0 sits ON the
  // initial watermark (0) and Spark's late-row filter is strict, so it
  // would be dropped before the stateful operator (observed empirically).
  private val Base = 60
  private def ts(min: Int): Timestamp = new Timestamp((Base + min) * 60000L)
  private def mins(t: Long): Long = t / 60000L - Base

  test("stateful sessionization over a memory stream emits closed sessions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = sessionize(input.toDS(), gapMillis = 30 * 60 * 1000L,
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: two events 10min apart (one session), then a 40min gap
      input.addData(
        SessionEvent(1L, 1L, ts(0), 1.0),
        SessionEvent(1L, 2L, ts(10), 2.0),
        SessionEvent(2L, 3L, ts(5), 5.0))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, 4L, ts(50), 3.0)) // closes user1's first session
      q.processAllAvailable()
      // advance the watermark far enough to time out everything open
      input.addData(SessionEvent(9L, 99L, ts(500), 0.0))
      q.processAllAvailable()
      input.addData(SessionEvent(9L, 100L, ts(600), 0.0))
      q.processAllAvailable()

      val out = spark.table("sess").as[SessionOut].collect()
        .map(s => (s.user_id, mins(s.session_start.getTime), mins(s.session_end.getTime), s.n_events, s.sum_value))
        .sortBy(x => (x._1, x._2))
      // user 1 session A: minutes 0-10, 2 events, sum 3.0
      assert(out.contains((1L, 0L, 10L, 2L, 3.0)))
      // user 1 session B: minute 50 alone (closed by watermark advance)
      assert(out.contains((1L, 50L, 50L, 1L, 3.0)))
      // user 2: single event at minute 5
      assert(out.contains((2L, 5L, 5L, 1L, 5.0)))
    } finally q.stop()
  }

  test("session splits inside a single micro-batch when the gap is exceeded") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = sessionize(input.toDS(), gapMillis = 30 * 60 * 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(7L, 1L, ts(0), 1.0),
        SessionEvent(7L, 2L, ts(100), 1.0), // out-of-order arrival, same batch
        SessionEvent(7L, 3L, ts(5), 1.0))
      q.processAllAvailable()
      val out = spark.table("sess2").as[SessionOut].collect()
      // the 0-5 minute pair closed immediately (gap to minute 100 > 30min)
      assert(out.exists(s => s.user_id == 7L && s.n_events == 2L &&
        mins(s.session_start.getTime) == 0L && mins(s.session_end.getTime) == 5L),
        out.mkString(";"))
    } finally q.stop()
  }

  test("windowed distinct users: duplicates collapse, windows finalize exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df = input.toDS().toDF("ts", "event_type", "user_id")
    val q = windowedDistinctUsers(df, "ts", "event_type", "user_id", "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("windistinct").outputMode("append").start()
    try {
      // hour 0: user 1 appears THREE times for click (must count once),
      // users 1 and 2 once each for view
      input.addData((ts(5), "click", 1L), (ts(10), "click", 1L), (ts(20), "click", 1L),
        (ts(15), "view", 1L), (ts(25), "view", 2L))
      q.processAllAvailable()
      input.addData((ts(70), "click", 9L)) // advance watermark past hour 0
      q.processAllAvailable()
      input.addData((ts(200), "click", 9L)) // finalize hour 1
      q.processAllAvailable()
      val rows = spark.table("windistinct").collect()
        .map(r => (mins(r.getTimestamp(0).getTime), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((0L, "click", 1L)), rows.toString) // 3 events, 1 user
      assert(rows.contains((0L, "view", 2L)), rows.toString)
      assert(rows.contains((60L, "click", 1L)), rows.toString)
    } finally q.stop()
  }

  test("watermarked tumbling windows finalize and drop late data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDS().toDF("ts", "event_type", "value")
    val q = windowedEventCounts(df, "ts", "event_type", "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("wincnt").outputMode("append").start()
    try {
      input.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0), (ts(40), "view", 4.0))
      q.processAllAvailable()
      input.addData((ts(70), "click", 8.0)) // advances watermark past hour 0
      q.processAllAvailable()
      input.addData((ts(15), "click", 100.0)) // LATE: inside hour 0, must be dropped
      q.processAllAvailable()
      input.addData((ts(200), "click", 0.5)) // finalize hour 1
      q.processAllAvailable()

      val rows = spark.table("wincnt")
        .select(col("window_start"), col("event_type"), col("cnt"), col("sum_value")).collect()
        .map(r => (mins(r.getTimestamp(0).getTime), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains((0L, "click", 2L, 3.0)), rows.toString) // late event NOT counted
      assert(rows.contains((0L, "view", 1L, 4.0)))
      assert(rows.contains((60L, "click", 1L, 8.0)))
    } finally q.stop()
  }

  test("asof lookup enriches a stream point-in-time: no future feature values leak") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // feature snapshots for user u1 at t=10 and t=30; u2 never has one
    val dim = Seq(("u1", 10L, 0.5, "v1"), ("u1", 30L, 0.9, "v2"))
      .toDF("user", "ft", "score", "tag")
    val input = MemoryStream[(String, Long)]
    val events = input.toDS().toDF("user", "t")
    val out = asofLookup(events, dim, "user", "t", "ft")
    val q = out.writeStream.format("memory").queryName("asoflkp")
      .outputMode("append").start()
    try {
      input.addData(("u1", 5L), ("u1", 10L), ("u1", 25L), ("u1", 35L), ("u2", 50L))
      q.processAllAvailable()
      val rows = spark.table("asoflkp").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getString(3))).toSet
      assert(rows == Set(
        ("u1", 5L, null, null),        // before any snapshot — no leak
        ("u1", 10L, 0.5, "v1"),        // inclusive tie
        ("u1", 25L, 0.5, "v1"),        // latest at-or-before, not the t=30 one
        ("u1", 35L, 0.9, "v2"),
        ("u2", 50L, null, null)), rows.toString)
    } finally q.stop()

    // the same operator over a BATCH frame gives identical semantics
    val batch = asofLookup(Seq(("u1", 25L)).toDF("user", "t"), dim, "user", "t", "ft")
      .collect()
    assert(batch.head.getDouble(2) == 0.5 && batch.head.getString(3) == "v1")
  }

  test("asofLookupLarge == asofLookup on a shared fixture (distributed dimension)") {
    import spark.implicits._
    // dim with NULL key and NULL time rows (must be dropped), ties at
    // the same timestamp (last in sort order wins), multiple keys
    val dim = Seq(
      ("u1", 10L, 0.5, "v1"), ("u1", 30L, 0.9, "v2"), ("u1", 30L, 0.95, "v2b"),
      ("u2", 7L, 0.1, "w1"), (null, 5L, 9.9, "bad"), ("u3", -1L, 0.2, "x1"))
      .toDF("user", "ft", "score", "tag")
      .union(Seq(("u2", null.asInstanceOf[java.lang.Long], 8.8, "bad2"))
        .toDF("user", "ft", "score", "tag"))
    // events with NULL key / NULL time (must pass through unmatched)
    val events = Seq(("u1", 5L), ("u1", 10L), ("u1", 30L), ("u1", 31L),
      ("u2", 6L), ("u2", 7L), ("u3", 100L), ("u4", 1L), (null, 20L))
      .toDF("user", "t")
      .union(Seq(("u1", null.asInstanceOf[java.lang.Long])).toDF("user", "t"))

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (0 until r.size).map(i => if (r.isNullAt(i)) null else r.get(i)))
      .sortBy(_.mkString("|")).toSeq
    val small = asofLookup(events, dim, "user", "t", "ft")
    val large = asofLookupLarge(events, dim, "user", "t", "ft")
    assert(large.columns.toSeq == small.columns.toSeq)
    assert(canon(large) == canon(small),
      s"\nlarge=${canon(large)}\nsmall=${canon(small)}")

    // the foreachBatch recipe end-to-end: per-micro-batch enrichment
    // equals the broadcast form over the same rows
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = input.toDS().toDF("user", "t").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= canon(asofLookupLarge(b, dim, "user", "t", "ft"))
        }: Unit
      }.start()
    try {
      input.addData(("u1", 25L), ("u2", 50L), ("u4", 3L))
      q.processAllAvailable()
    } finally q.stop()
    val want = canon(asofLookup(
      Seq(("u1", 25L), ("u2", 50L), ("u4", 3L)).toDF("user", "t"),
      dim, "user", "t", "ft"))
    assert(got.sortBy(_.mkString("|")).toSeq == want, s"\ngot=$got\nwant=$want")
  }

  test("asof lookup with an UNORDERABLE (map) payload: tie collapse skips, lookup still works") {
    import spark.implicits._
    // MapType is not orderable (RowOrdering.isOrderable = false), so
    // collapseDimTies must SKIP the max(struct) collapse rather than
    // throw at analysis time. Unique (key, time) rows still resolve
    // exactly; the duplicated (u1, 30) row keeps engine-chosen tie
    // resolution (documented limitation — an SCD effective-time should
    // be unique per key), so we only pin "one of the candidates, no
    // throw" there.
    val dim = Seq(
      ("u1", 10L, Map("a" -> 1)), ("u1", 30L, Map("b" -> 2)),
      ("u1", 30L, Map("b" -> 3)), ("u2", 7L, Map("c" -> 4)))
      .toDF("user", "ft", "props")
    val events = Seq(("u1", 20L), ("u2", 50L), ("u3", 5L), ("u1", 40L))
      .toDF("user", "t")
    for (out <- Seq(asofLookup(events, dim, "user", "t", "ft"),
                    asofLookupLarge(events, dim, "user", "t", "ft"))) {
      val rows = out.collect().map(r => ((r.getString(0), r.getLong(1)),
        if (r.isNullAt(2)) null else r.getMap[String, Int](2).toMap)).toMap
      assert(rows(("u1", 20L)) == Map("a" -> 1))
      assert(rows(("u2", 50L)) == Map("c" -> 4))
      assert(rows(("u3", 5L)) == null)
      val tied = rows(("u1", 40L)) // duplicated dim time: either candidate
      assert(tied == Map("b" -> 2) || tied == Map("b" -> 3), tied.toString)
    }
  }

  test("kmv_distinct runs as a streaming windowed aggregate with state across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.functions.KmvSketch.registerAll(spark)
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDS().toDF("ts", "user")
    val agg = df.withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(call_function("kmv_distinct", col("user"), lit(8)).as("est"))
      .select(col("window.start").as("ws"), col("est"))
    val q = agg.writeStream.format("memory").queryName("kmvstream")
      .outputMode("append").start()
    try {
      input.addData((ts(10), "u1"), (ts(20), "u2"), (ts(30), "u1"))
      q.processAllAvailable()
      input.addData((ts(40), "u3"), (ts(50), "u2"))   // same window, later batch
      q.processAllAvailable()
      input.addData((ts(100), "u9"))                  // next hour closes hour 0
      q.processAllAvailable()
      input.addData((ts(200), "zz"))                  // force final windows out
      q.processAllAvailable()
      val rows = spark.table("kmvstream").collect()
        .map(r => (mins(r.getTimestamp(0).getTime), r.getDouble(1))).toMap
      // 3 distinct users across two micro-batches, below k → exact
      assert(rows(0L) == 3.0, rows.toString)
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the lookback only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val imps = MemoryStream[(Long, Timestamp, String)]
    // both sides deliberately share ALL column names — the r_ prefixing
    // must keep the join unambiguous
    val joined = intervalJoin(
      clicks.toDS().toDF("uid", "ts", "tag"),
      imps.toDS().toDF("uid", "ts", "tag"),
      "uid", "ts", "ts", lookback = "30 minutes", watermarkDelay = "0 seconds")
    val q = joined.select(col("uid"), col("tag").as("click"), col("r_tag").as("imp"))
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      imps.addData((1L, ts(0), "i1"), (1L, ts(100), "i2"), (2L, ts(5), "i3"))
      clicks.addData((1L, ts(20), "c1")) // pairs with i1 (20min back), not i2 (future)
      q.processAllAvailable()
      // advance both watermarks so results finalize
      imps.addData((9L, ts(500), "ix"))
      clicks.addData((9L, ts(500), "cx"))
      q.processAllAvailable()
      val rows = spark.table("ivj").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows.contains((1L, "c1", "i1")), rows.toString)
      assert(!rows.exists(r => r._2 == "c1" && r._3 == "i2"), "future impression joined")
      assert(!rows.exists(_._3 == "i3"), "other user's impression joined")
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched left rows with NULL right side") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val conns = MemoryStream[(Long, Timestamp, String)]
    val alerts = MemoryStream[(Long, Timestamp, String)]
    val joined = intervalJoinLeftOuter(
      conns.toDS().toDF("uid", "ts", "tag"),
      alerts.toDS().toDF("uid", "ts", "tag"),
      "uid", "ts", "ts", lookback = "30 minutes", watermarkDelay = "0 seconds")
    val q = joined.select(col("uid"), col("tag").as("conn"), col("r_tag").as("alert"))
      .writeStream.format("memory").queryName("ivjlo").outputMode("append").start()
    try {
      alerts.addData((1L, ts(0), "a1")) // matches uid 1 only
      conns.addData((1L, ts(20), "c1"), (2L, ts(20), "c2"))
      q.processAllAvailable()
      // unmatched rows finalize only once the watermark passes their join
      // horizon — advance both sides well beyond it
      alerts.addData((9L, ts(500), "ax"))
      conns.addData((9L, ts(500), "cx"))
      q.processAllAvailable()
      alerts.addData((9L, ts(900), "ay"))
      conns.addData((9L, ts(900), "cy"))
      q.processAllAvailable()
      val rows = spark.table("ivjlo").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(rows.contains((1L, "c1", Some("a1"))), rows.toString)
      assert(rows.contains((2L, "c2", None)), "unmatched conn must pass through: " + rows)
    } finally q.stop()
  }

  test("full-outer interval join reports leftovers from BOTH sides") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val expected = MemoryStream[(Long, Timestamp, String)]
    val actual = MemoryStream[(Long, Timestamp, String)]
    val joined = intervalJoinFullOuter(
      expected.toDS().toDF("uid", "ts", "tag"),
      actual.toDS().toDF("uid", "ts", "tag"),
      "uid", "ts", "ts", lookback = "30 minutes", watermarkDelay = "0 seconds")
    val q = joined.select(col("uid"), col("r_uid"),
        col("tag").as("exp"), col("r_tag").as("act"))
      .writeStream.format("memory").queryName("ivjfo").outputMode("append").start()
    try {
      actual.addData((1L, ts(0), "a1")) // matches uid 1; uid 7 is actual-only
      actual.addData((7L, ts(10), "a7"))
      expected.addData((1L, ts(20), "e1"), (2L, ts(20), "e2")) // uid 2 expected-only
      q.processAllAvailable()
      // advance watermarks far past the horizon to flush the leftovers
      for (t <- Seq(500, 900)) {
        actual.addData((9L, ts(t), "ax")); expected.addData((9L, ts(t), "ex"))
        q.processAllAvailable()
      }
      val rows = spark.table("ivjfo").collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.getString(2)), Option(r.getString(3)))).toSet
      assert(rows.contains((Some(1L), Some(1L), Some("e1"), Some("a1"))), rows.toString)
      assert(rows.contains((Some(2L), None, Some("e2"), None)),
        "expected-only row must emit NULL-padded: " + rows)
      assert(rows.contains((None, Some(7L), None, Some("a7"))),
        "actual-only row must emit NULL-padded: " + rows)
    } finally q.stop()
  }

  test("streaming exact dedup emits each fingerprint once within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df = input.toDS().toDF("ts", "fp", "doc_id")
    val q = dedupStream(df, "ts", "fp", "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "aaa", 1L), (ts(1), "bbb", 2L), (ts(2), "aaa", 3L))
      q.processAllAvailable()
      // duplicate arriving in a later batch, still within the watermark
      input.addData((ts(5), "aaa", 4L), (ts(6), "ccc", 5L))
      q.processAllAvailable()
      val fps = spark.table("dedup_stream").select("fp").collect().map(_.getString(0))
      assert(fps.sorted.toSeq == Seq("aaa", "bbb", "ccc"),
        s"each fingerprint exactly once, got ${fps.mkString(",")}")
    } finally q.stop()
  }

  test("continuous curation: map-only quality/lang/fingerprint ops compose with streaming dedup unchanged") {
    import spark.implicits._
    import graft.text.TextFunctions
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    // the batch curation expressions applied verbatim to a stream —
    // map-only columns need no watermark; the dedup supplies one
    val curated = StreamOps.dedupStream(
      input.toDS().toDF("ts", "doc_id", "text")
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
        .withColumn("quality", TextFunctions.qualityScore(col("text"))),
      "ts", "fp", "30 minutes")
      .filter(col("quality") > 0.1)
    val q = curated.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    val docs = Seq(
      (ts(0), 1L, "the quick brown fox, and a fine dog in the yard today."),
      (ts(1), 2L, "THE  quick brown fox, and a fine dog in the yard today."), // fp-dup of 1 (case/ws)
      (ts(2), 3L, "!!!! ???? ;;;; ::::"), // punctuation junk — quality-filtered
      (ts(5), 4L, "it is a truth universally acknowledged that a reader wants data."))
    try {
      input.addData(docs.take(3): _*)
      q.processAllAvailable()
      input.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val kept = spark.table("curation_stream").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      // batch ground truth: same exprs, first-arrival dedup, same filter
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("ts"), col("doc_id"))
      val batch = docs.toDF("ts", "doc_id", "text")
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("quality") > 0.1)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == batch, s"stream kept $kept, batch kept $batch")
      assert(kept == Seq(1L, 4L))
    } finally q.stop()
  }

  test("streaming decontamination tags contaminated docs, agrees with the batch op") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "to be or not to be that is the question"))
      .toDF("doc_id", "text")
    // doc 1 copies eval shingles (contaminated), doc 2 shares one bigram
    // (below minShared), doc 3 is clean
    val docs = Seq(
      (1L, "note the quick brown fox jumps over everything"),
      (2L, "a quick brown bear sat down"),
      (3L, "completely unrelated content about spark plans"))

    val input = MemoryStream[(Long, String)]
    val tagged = StreamOps.streamingDecontaminate(
      input.toDF().toDF("doc_id", "text"), evalSet, "doc_id", "text",
      shingleSize = 2, minShared = 3)
    val q = tagged.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()

      val out = spark.table("decontam")
        .select("doc_id", "n_shared", "contaminated").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
      assert(out.map(_._1) == Seq(1L, 2L, 3L))
      assert(out(0)._3, "doc 1 shares >= 3 shingles with the eval set")
      assert(!out(1)._3 && !out(2)._3)

      // agreement with the batch operator on the same data
      val batch = graft.dedup.Dedup.contaminationPairs(
        docs.toDF("doc_id", "text"), evalSet, "doc_id", "text",
        shingleSize = 2, minShared = 3)
        .select("corpus_id").distinct().collect().map(_.getLong(0)).toSet
      assert(out.filter(_._3).map(_._1).toSet == batch)
      // exact-confirmed count for the implicated doc matches the batch count
      val batchShared = graft.dedup.Dedup.contaminationPairs(
        docs.toDF("doc_id", "text"), evalSet, "doc_id", "text",
        shingleSize = 2, minShared = 1)
        .groupBy("corpus_id").agg(max("n_shared").as("m")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(0)._2 == batchShared(1L))
    } finally q.stop()
  }

  test("streaming decontamination with an empty eval set keeps everything") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val evalSet = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val tagged = StreamOps.streamingDecontaminate(
      input.toDF().toDF("doc_id", "text"), evalSet, "doc_id", "text")
    val q = tagged.writeStream.format("memory").queryName("decontam_empty")
      .outputMode("append").start()
    try {
      input.addData((1L, "anything at all"))
      q.processAllAvailable()
      val out = spark.table("decontam_empty").collect()
      assert(out.length == 1 && !out.head.getAs[Boolean]("contaminated"))
    } finally q.stop()
  }

  test("windowed top-k emits per-window heavy hitters once the watermark closes them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TopKEvent]
    val q = windowedTopK(input.toDS(), windowMillis = 60 * 60000L, k = 2,
        capacity = 16, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("topk").outputMode("append").start()
    try {
      // window [60,120): a=3, b=2, c=1 — split across two micro-batches
      input.addData(TopKEvent(ts(0), "a"), TopKEvent(ts(1), "b"),
        TopKEvent(ts(2), "a"), TopKEvent(ts(3), "c"))
      q.processAllAvailable()
      input.addData(TopKEvent(ts(10), "a"), TopKEvent(ts(11), "b"))
      q.processAllAvailable()
      assert(spark.table("topk").count() == 0, "window must not emit while open")
      // next window's data pushes the watermark past the first window end
      input.addData(TopKEvent(ts(130), "z"))
      q.processAllAvailable()
      input.addData(TopKEvent(ts(260), "z")) // closes the z window too
      q.processAllAvailable()
      val out = spark.table("topk").as[TopKOut].collect()
        .map(o => (mins(o.window_start.getTime), o.rank, o.key, o.cnt, o.err))
        .sortBy(x => (x._1, x._2))
      assert(out.take(2).toSeq == Seq((0L, 1, "a", 3L, 0L), (0L, 2, "b", 2L, 0L)))
      assert(out.drop(2).toSeq == Seq((120L, 1, "z", 1L, 0L)))
    } finally q.stop()
  }

  test("space-saving eviction bounds state and keeps true heavy hitters") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TopKEvent]
    // capacity 4 << 20 distinct keys; the heavy key must survive eviction
    val q = windowedTopK(input.toDS(), windowMillis = 60 * 60000L, k = 1,
        capacity = 4, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("topk_ss").outputMode("append").start()
    try {
      val noise = (0 until 20).map(i => TopKEvent(ts(2 + i % 5), f"n$i%02d"))
      val heavy = (0 until 10).map(i => TopKEvent(ts(1 + i % 50), "HOT"))
      input.addData(scala.util.Random.shuffle(heavy ++ noise): _*)
      q.processAllAvailable()
      input.addData(TopKEvent(ts(200), "z"))
      q.processAllAvailable()
      val out = spark.table("topk_ss").as[TopKOut].collect()
        .filter(o => mins(o.window_start.getTime) == 0L)
      assert(out.length == 1)
      val top = out.head
      // space-saving may overcount (by at most err), never undercount
      assert(top.key == "HOT", s"true heavy hitter lost: $top")
      assert(top.cnt >= 10L, s"undercount: $top")
      assert(top.cnt - top.err <= 10L, s"error bound violated: $top")
    } finally q.stop()
  }

  test("transformWithState entity profiles accumulate across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[ProfileEvent]
    val q = StreamOps.entityProfiles(input.toDS())
      .writeStream.format("memory").queryName("profiles")
      .outputMode("update").start()
    try {
      input.addData(
        ProfileEvent("10.0.0.1", "80", 100L),
        ProfileEvent("10.0.0.1", "443", 50L),
        ProfileEvent("10.0.0.1", "80", 10L),
        ProfileEvent("10.0.0.2", "22", 7L))
      q.processAllAvailable()
      input.addData(ProfileEvent("10.0.0.1", "8080", 1L))
      q.processAllAvailable()

      val out = spark.table("profiles").as[ProfileOut].collect()
      // update-mode memory sink keeps every emitted version; the profile
      // with the highest n_events per key is the current one
      val latest = out.groupBy(_.key).map { case (k, vs) => k -> vs.maxBy(_.n_events) }
      assert(latest("10.0.0.1") == ProfileOut("10.0.0.1", 4L, 161L, 3L))
      assert(latest("10.0.0.2") == ProfileOut("10.0.0.2", 1L, 7L, 1L))
      // batch-1 emission must also have been the correct running profile
      assert(out.contains(ProfileOut("10.0.0.1", 3L, 160L, 2L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  case class CdcChange(k: Long, version: Long, op: String, status: String, price: Double)

  test("streaming CDC snapshot maintenance folds change batches, survives restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("cdcsnap").toString
    val (snapDir, ckptDir) = (s"$root/snap", s"$root/ckpt")

    def state(): Seq[(Long, String, Double)] =
      readSnapshot(spark, snapDir).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

    val input = MemoryStream[CdcChange]
    val q = maintainSnapshot(input.toDF(), snapDir, ckptDir, Seq("k"))
    try {
      // batch 0: two inserts (v orders within the batch — stale v1 loses)
      input.addData(
        CdcChange(1L, 1L, "U", "a1", 10.0), CdcChange(1L, 2L, "U", "a2", 11.0),
        CdcChange(2L, 1L, "U", "b1", 20.0))
      q.processAllAvailable()
      assert(state() == Seq((1L, "a2", 11.0), (2L, "b1", 20.0)))

      // batch 1: tombstone k=1, delete-then-reinsert k=2, insert k=3
      input.addData(
        CdcChange(1L, 3L, "D", null, 0.0),
        CdcChange(2L, 3L, "D", null, 0.0), CdcChange(2L, 4L, "U", "b4", 24.0),
        CdcChange(3L, 1L, "U", "c1", 30.0))
      q.processAllAvailable()
      assert(state() == Seq((2L, "b4", 24.0), (3L, "c1", 30.0)))
    } finally q.stop()

    // restart from the same checkpoint (same source instance, as a real
    // source would resume): the next batch folds onto the committed
    // snapshot — across batches arrival order wins over version
    input.addData(CdcChange(3L, 1L, "U", "c9", 39.0), CdcChange(4L, 1L, "U", "d1", 40.0))
    val q2 = maintainSnapshot(input.toDF(), snapDir, ckptDir, Seq("k"))
    try {
      q2.processAllAvailable()
      assert(state() == Seq((2L, "b4", 24.0), (3L, "c9", 39.0), (4L, "d1", 40.0)))
    } finally q2.stop()

    // version pruning keeps storage bounded (last 2 committed versions)
    val fs = new org.apache.hadoop.fs.Path(snapDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(snapDir))
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
    assert(versions.length <= 2, versions.mkString(","))
  }

  test("streaming SCD2 history maintenance folds change batches, survives restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scd2hist").toString
    val (histDir, ckptDir) = (s"$root/hist", s"$root/ckpt")

    def hist(): Seq[(Long, String, Long, Option[Long], Boolean)] =
      readSnapshot(spark, histDir).orderBy("k", "valid_from").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))).toSeq

    val input = MemoryStream[CdcChange]
    val q = maintainScd2(input.toDF(), histDir, ckptDir, Seq("k"))
    try {
      // batch 0: k=1 twice (chained intervals), k=2 once
      input.addData(
        CdcChange(1L, 1L, "U", "a1", 10.0), CdcChange(1L, 2L, "U", "a2", 11.0),
        CdcChange(2L, 3L, "U", "b1", 20.0))
      q.processAllAvailable()
      assert(hist() == Seq(
        (1L, "a1", 1L, Some(2L), false), (1L, "a2", 2L, None, true),
        (2L, "b1", 3L, None, true)))

      // batch 1: tombstone closes k=1's open row; k=3 appears
      input.addData(CdcChange(1L, 4L, "D", null, 0.0), CdcChange(3L, 5L, "U", "c1", 30.0))
      q.processAllAvailable()
      assert(hist() == Seq(
        (1L, "a1", 1L, Some(2L), false), (1L, "a2", 2L, Some(4L), false),
        (2L, "b1", 3L, None, true), (3L, "c1", 5L, None, true)))
    } finally q.stop()

    // restart from the same checkpoint: k=1 re-upserts after its delete
    input.addData(CdcChange(1L, 6L, "U", "a6", 16.0))
    val q2 = maintainScd2(input.toDF(), histDir, ckptDir, Seq("k"))
    try {
      q2.processAllAvailable()
      assert(hist() == Seq(
        (1L, "a1", 1L, Some(2L), false), (1L, "a2", 2L, Some(4L), false),
        (1L, "a6", 6L, None, true),
        (2L, "b1", 3L, None, true), (3L, "c1", 5L, None, true)))
      // the history's snapshotAt view agrees with the closed/open structure
      val now = graft.operators.Scd2.snapshotAt(readSnapshot(spark, histDir), 99L)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(now == Seq((1L, "a6"), (2L, "b1"), (3L, "c1")))
    } finally q2.stop()
  }

  test("streaming incremental aggregate maintenance folds batches, survives restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("aggsnap").toString
    val (stateDir, ckptDir) = (s"$root/state", s"$root/ckpt")

    def state(): Seq[(Long, Long, String, Double, Double)] =
      readSnapshot(spark, stateDir).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString,
          r.getDouble(3), r.getDouble(4))).toSeq

    val input = MemoryStream[(Long, Double)]
    val q = maintainAggregate(input.toDF().toDF("k", "v"), stateDir, ckptDir,
      Seq("k"), "v")
    try {
      input.addData((1L, 10.0), (1L, 20.0), (2L, 5.0))
      q.processAllAvailable()
      assert(state() == Seq((1L, 2L, "30.00", 10.0, 20.0), (2L, 1L, "5.00", 5.0, 5.0)))

      input.addData((1L, 1.0), (3L, 7.0))
      q.processAllAvailable()
      assert(state() == Seq((1L, 3L, "31.00", 1.0, 20.0), (2L, 1L, "5.00", 5.0, 5.0),
        (3L, 1L, "7.00", 7.0, 7.0)))
    } finally q.stop()

    // restart from the same checkpoint: the next batch folds onto the
    // committed state — maintenance keeps equaling a full recompute
    input.addData((2L, 100.0))
    val q2 = maintainAggregate(input.toDF().toDF("k", "v"), stateDir, ckptDir,
      Seq("k"), "v")
    try {
      q2.processAllAvailable()
      assert(state() == Seq((1L, 3L, "31.00", 1.0, 20.0), (2L, 2L, "105.00", 5.0, 100.0),
        (3L, 1L, "7.00", 7.0, 7.0)))
    } finally q2.stop()

    // bounded storage: only the newest 2 committed versions remain
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
    assert(versions.length <= 2, versions.mkString(","))
  }

  test("streaming near-dups: arriving doc matches the corpus index once, unrelated doc never") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val corpus = Seq(
      (100L, base),
      (101L, "completely different vocabulary here nothing shared at all truly none")
    ).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
    val out = streamingNearDups(stream, "doc_id", "ts", "text",
      corpus, "doc_id", "text", threshold = 0.5, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), base.replace("today", "tonight")), // near-dup of corpus 100
        (2L, ts(1), "zebra xylophone quark plasma neutrino lattice fermion boson")) // no match
      q.processAllAvailable()
      input.addData((3L, ts(60), "another unrelated batch of words entirely fresh set"))
      q.processAllAvailable()
      val got = spark.table("neardup")
        .select(col("s_id"), col("c_id"), col("jaccard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // exactly ONE pair despite the near-identical docs matching many bands
      assert(got.length == 1, s"got: ${got.toSeq}")
      assert(got(0)._1 == 1L && got(0)._2 == 100L)
      assert(got(0)._3 > 0.8, s"jaccard ${got(0)._3}")
    } finally q.stop()
  }

  test("streaming near-dups plan carries no ScalaUDF (native shingle jaccard)") {
    // round-16 pin: the confirm stage reuses the batch pipeline's native
    // Shingles/array_intersect expressions; a reintroduced per-pair
    // closure would hide here (streaming plans get no bench coverage)
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Seq((100L, "some corpus text here")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.streamingNearDups(input.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "ts", "text", corpus, "doc_id", "text")
    val plan = out.queryExecution.analyzed
    val udfs = plan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u })
    }.flatten
    assert(udfs.isEmpty, udfs.map(_.udfName).mkString(","))
    assert(plan.toString.contains("shingles") || plan.toString.contains("Shingles"),
      plan.toString.take(800))
  }

  test("page-hinkley drift monitor alarms after a level shift, stays quiet on a flat stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DriftEvent]
    val alarms = driftMonitor(input.toDS(), delta = 0.0, lambda = 50.0)
    val q = alarms.writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    try {
      // key "m": 30 flat values, then a +10 level shift; key "flat": all 10.0
      input.addData((1 to 30).map(i =>
        DriftEvent("m", i.toLong, ts(i), 10.0)) ++
        (1 to 60).map(i => DriftEvent("flat", 100L + i, ts(i), 10.0)): _*)
      q.processAllAvailable()
      assert(spark.table("drift").count() == 0, "no alarm before the shift")

      input.addData((31 to 60).map(i => DriftEvent("m", i.toLong, ts(i), 20.0)): _*)
      q.processAllAvailable()
      val out = spark.table("drift").as[DriftAlarm].collect()
      assert(out.length == 1, s"exactly one alarm: ${out.toSeq}")
      val a = out(0)
      assert(a.key == "m")
      // PH needs ~2*lambda/shift events past the change to accumulate
      assert(a.event_id > 30L && a.event_id <= 50L, s"alarm at ${a.event_id}")
      assert(a.ph_dev > 50.0)
      // mean at alarm time sits between the two levels
      assert(a.mean > 10.0 && a.mean < 20.0)
    } finally q.stop()
  }

  test("streaming knn inserts equal the batch incremental candidate stage") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(19)
    val corpusVecs = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val newVecs = (100L until 104L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val corpus = corpusVecs.toDF("vec_id", "embedding")
    val input = MemoryStream[(Long, Timestamp, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "ts", "embedding")
    val out = streamingKnnInserts(stream, "vec_id", "ts", "embedding",
      corpus, "vec_id", "embedding", topK = 3)
    val q = out.writeStream.format("memory").queryName("knnins")
      .outputMode("append").start()
    try {
      input.addData(newVecs.map { case (id, v) => (id, ts(0), v) }: _*)
      q.processAllAvailable()
      input.addData((999L, ts(60), Array.fill(16)(0.5f))) // advances the watermark
      q.processAllAvailable()
      val got = spark.table("knnins")
        .filter(col("s_id") < 999)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      // batch ground truth: the e43 candidate stage + per-probe top-3
      val expect = {
        val cand = graft.queries.MiningQueries.knnCandidatesBetween(
          newVecs.toDF("vec_id", "embedding"), corpus)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
        cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
          .collect().map(r => (r.getLong(0), r.getInt(4).toLong, r.getLong(1), r.getLong(2)))
          .toSet
      }
      assert(got == expect,
        s"stream != batch:\nmissing ${expect -- got}\nextra ${got -- expect}")
      assert(got.nonEmpty, "fixture produced no candidate edges")
    } finally q.stop()
  }
}
