package graft.zeek

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-range splitting of large uncompressed Zeek files: results must be
  * identical to the unsplit read (every line exactly once, regardless of
  * where split boundaries fall), and compressed content must never be
  * split even when the extension lies. */
class ZeekSplitSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def bigLog(rows: Int): String = {
    val sb = new StringBuilder
    sb.append(ZeekFixtures.header("t", Seq("ts", "id", "value"), Seq("time", "string", "count")))
    var i = 0
    while (i < rows) {
      sb.append(s"$i.5\tid_$i\t${i * 3}\n")
      i += 1
    }
    sb.append("#close\t2026-01-22-02-30-59\n")
    sb.toString
  }

  test("split read == unsplit read, every row exactly once") {
    val dir = ZeekFixtures.tempDir()
    val content = bigLog(20000) // ~400 KB
    val p = ZeekFixtures.write(dir, "big.log", content)

    val unsplit = spark.read.format("zeek").load(p)
    // force many tiny splits so boundaries land mid-line all over the file
    val split = spark.read.format("zeek").option("split_size", "10000").load(p)
    assert(split.rdd.getNumPartitions > 10, s"got ${split.rdd.getNumPartitions} partitions")

    assert(split.count() == 20000)
    val a = unsplit.select("id").collect().map(_.getString(0)).sorted
    val b = split.select("id").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    // values survive too (sum is position-independent)
    val sum = split.agg(org.apache.spark.sql.functions.sum("value")).collect().head.getLong(0)
    assert(sum == (0L until 20000L).map(_ * 3).sum)
    // filters still work across splits
    assert(split.filter(col("id") === "id_19999").count() == 1)
  }

  test("compressed content with a lying extension is not split (no dup/loss)") {
    val dir = ZeekFixtures.tempDir()
    // gzip content in a plain .log name: planner will try to split by
    // extension; the reader's sniff must collapse it to the start-0 split
    val path = ZeekFixtures.write(dir, "lying.log", bigLog(5000), gzip = true)
    val df = spark.read.format("zeek").option("split_size", "4000").load(path)
    assert(df.count() == 5000)
    assert(df.select("id").distinct().count() == 5000)
  }

  test("invalid large plain file yields zero rows under ignore_file_errors (no garbage from ranged splits)") {
    val dir = ZeekFixtures.tempDir()
    ZeekFixtures.write(dir, "good.log", bigLog(1000))
    // 50 KB of non-zeek content in a plain .log name — big enough to be
    // range-split; every split must notice the invalid header
    val garbage = new StringBuilder
    (0 until 2000).foreach(i => garbage.append(s"random line $i with no header\n"))
    ZeekFixtures.write(dir, "junk.log", garbage.toString)

    val df = spark.read.format("zeek")
      .option("split_size", "10000").option("ignore_file_errors", "true")
      .load(s"$dir/*.log")
    assert(df.count() == 1000) // only the valid file's rows
    // and without the flag the job fails rather than emitting garbage
    val e = intercept[Exception] {
      spark.read.format("zeek").option("split_size", "10000")
        .load(s"$dir/*.log").count()
    }
    assert(e.getMessage.contains("missing #fields") ||
      Option(e.getCause).exists(_.getMessage.contains("missing #fields")))
  }

  test("union_by_name with ranged splits keeps per-file column maps") {
    val dir = ZeekFixtures.tempDir()
    ZeekFixtures.write(dir, "old.log", bigLog(5000))
    val wide = new StringBuilder
    wide.append(ZeekFixtures.header("t", Seq("ts", "id", "value", "extra"),
      Seq("time", "string", "count", "string")))
    (0 until 5000).foreach(i => wide.append(s"$i.5\twid_$i\t${i}\tx$i\n"))
    ZeekFixtures.write(dir, "wide.log", wide.toString)

    val df = spark.read.format("zeek")
      .option("split_size", "20000").option("union_by_name", "true")
      .load(s"$dir/*.log")
    assert(df.rdd.getNumPartitions > 4)
    assert(df.count() == 10000)
    assert(df.filter(col("extra").isNull).count() == 5000)  // old.log rows
    assert(df.filter(col("extra").isNotNull).count() == 5000)
  }

  test("split boundaries exactly on newlines do not duplicate lines") {
    val dir = ZeekFixtures.tempDir()
    // constant-width rows so some split boundary lands exactly at a line start
    val sb = new StringBuilder
    sb.append(ZeekFixtures.header("t", Seq("id"), Seq("string")))
    (0 until 1000).foreach(i => sb.append(f"x$i%08d\n")) // 10 bytes per line
    val p = ZeekFixtures.write(dir, "fixed.log", sb.toString)
    val df = spark.read.format("zeek").option("split_size", "100").load(p)
    assert(df.count() == 1000)
    assert(df.distinct().count() == 1000)
  }

  test("recompress: one big gzip file becomes multi-part zstd with identical rows") {
    val dir = ZeekFixtures.tempDir()
    // a compressed file is ONE partition no matter its size — the
    // 1 TB .gz problem in miniature
    val p = ZeekFixtures.write(dir, "conn.log.gz", bigLog(20000), gzip = true)
    val single = spark.read.format("zeek").load(p)
    assert(single.rdd.getNumPartitions == 1)

    val out = Zeek.recompress(spark, p, s"$dir/parts", rowsPerFile = 3000L)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".log.zst")).map(_.getName).toSeq
    assert(parts.size >= 7, s"expected >= 7 rotated parts, got $parts")

    val multi = spark.read.format("zeek").load(s"$out/*.log.zst")
    // partition-per-file parallelism restored
    assert(multi.rdd.getNumPartitions == parts.size)
    // identical content: same rows, same values, schema preserved
    assert(multi.schema == single.schema)
    assert(multi.count() == 20000)
    val a = single.select("id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = multi.select("id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
    // the #path directive carried over from the input's own header
    val firstPart = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".log.zst")).head
    val in = ZeekIO.open(firstPart.getAbsolutePath,
      spark.sessionState.newHadoopConf())
    val header = try ZeekHeader.parseHeaderOnly(in) finally in.close()
    assert(header.path.contains("t"), header.path.toString)
  }
}
