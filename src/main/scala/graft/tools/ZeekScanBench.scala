package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what [[graft.zeek.Zeek.recompress]] buys: a single huge
  * `.gz` zeek log is one non-splittable stream (gzip has no sync
  * points — the scan is ONE task no matter how many cores exist), and
  * the recompressed multi-part output scans with one task per part.
  * `ZeekSplitSpec` proves the two reads EQUAL; this records the
  * before/after wall clock for BASELINE.md.
  *
  * Usage: runMain graft.tools.ZeekScanBench [rows] [parts]
  */
object ZeekScanBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("zeek_scan_bench").toFile
    val gz = new java.io.File(dir, "conn.log.gz")
    writeSyntheticConn(gz, rows)
    println(s"[zeekbench] wrote $rows rows, ${gz.length() / 1048576} MiB gzip")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def scanAgg(path: String): Long =
      // full-parse aggregate: touches every column type in the row
      graft.zeek.Zeek.read(spark, path)
        .agg(count(lit(1)) + countDistinct(col("id_orig_h")) +
          sum(col("orig_bytes")).cast("long")).head.getLong(0)

    // warm JIT/codegen on a slice so both sides measure steady state
    scanAgg(gz.getAbsolutePath)

    val (cnt1, tSingle) = time(scanAgg(gz.getAbsolutePath))
    val recompressed = new java.io.File(dir, "parts").getAbsolutePath
    val (_, tRecompress) = time(graft.zeek.Zeek.recompress(
      spark, gz.getAbsolutePath, recompressed, rowsPerFile = rows / parts))
    val partGlob = recompressed + "/*.zst"
    scanAgg(partGlob) // warm the split path too
    val (cnt2, tParts) = time(scanAgg(partGlob))
    require(cnt1 == cnt2, s"recompressed scan disagrees: $cnt1 vs $cnt2")
    val nParts = new java.io.File(recompressed).listFiles()
      .count(_.getName.endsWith(".zst"))
    println(f"[zeekbench] single-gz full-parse agg: $tSingle%.2f s (1 task)")
    println(f"[zeekbench] recompress (one-time): $tRecompress%.2f s -> $nParts parts")
    println(f"[zeekbench] parts full-parse agg: $tParts%.2f s " +
      f"(speedup ${tSingle / tParts}%.1fx)")
    spark.stop()
  }

  /** A plausible conn.log: 8 columns over time/addr/port/count types,
    * deterministic values, written as ONE gzip stream. */
  private def writeSyntheticConn(f: java.io.File, rows: Long): Unit = {
    val out = new java.io.PrintStream(new BufferedOutputStream(
      new GZIPOutputStream(new FileOutputStream(f), 1 << 16), 1 << 16), false, "UTF-8")
    try {
      out.print(
        "#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n" +
          "#unset_field\t-\n#path\tconn\n#open\t2026-01-01-00-00-00\n" +
          "#fields\tts\tuid\tid.orig_h\tid.orig_p\tid.resp_h\tid.resp_p\tproto\torig_bytes\n" +
          "#types\ttime\tstring\taddr\tport\taddr\tport\tenum\tcount\n")
      var i = 0L
      while (i < rows) {
        val ts = 1700000000L + i / 100
        out.print(s"$ts.${i % 1000000}\tC${i % 97}x${i}\t10.${(i / 65536) % 256}.${(i / 256) % 256}.${i % 256}\t" +
          s"${1024 + i % 60000}\t192.168.${i % 256}.${(i * 7) % 256}\t${i % 1024}\ttcp\t${i % 100000}\n")
        i += 1
      }
    } finally out.close()
  }
}
