package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling probe for the wide-log tokenizer question (not part of the
  * driver contract): does a NARROW projection over an ULTRA-WIDE zeek
  * log pay for tokenizing every trailing field it never reads?
  *
  * Generates a deterministic `nExtra`-extra-column conn-style corpus
  * (plain text — splittable, so every core scans), then times four
  * scans that bracket the tokenizer's work profile:
  *   count(*)        — zero-parse path (line scan only; the floor)
  *   early 2-col     — projection whose LAST file field is index 3
  *   late 1-col      — projection of the FINAL file field (worst case)
  *   full-width agg  — every column parsed (tokenizer cost saturated)
  *
  * The lazy-tokenizer hypothesis: early-column projections should cost
  * ~the count(*) floor, not O(line width). Compare the early-2-col
  * row against count(*) before/after a tokenizer change.
  *
  * Usage: runMain graft.tools.WideLogProbe [dir] [nFiles] [rowsPerFile] [nExtra]
  */
object WideLogProbe {

  def generate(dir: String, nFiles: Int, rowsPerFile: Int, nExtra: Int): Long = {
    Files.createDirectories(Paths.get(dir))
    var bytes = 0L
    val extraFields = (0 until nExtra).map(i => s"x$i").mkString("\t")
    val extraTypes = (0 until nExtra).map(_ => "count").mkString("\t")
    for (f <- 0 until nFiles) {
      val path = Paths.get(dir, f"wide_$f%03d.log")
      val out = new OutputStreamWriter(
        new BufferedOutputStream(new FileOutputStream(path.toFile), 1 << 16))
      out.write("#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n#unset_field\t-\n")
      out.write("#path\twide\n#open\t2026-01-16-00-00-01\n")
      out.write(s"#fields\tts\tuid\tid.orig_h\tid.orig_p\t$extraFields\tzlast\n")
      out.write(s"#types\ttime\tstring\taddr\tport\t$extraTypes\tcount\n")
      val sb = new StringBuilder(1024)
      var r = 0
      while (r < rowsPerFile) {
        val seed = f.toLong * rowsPerFile + r
        val m = graft.dedup.Dedup.mix64(seed)
        sb.setLength(0)
        sb.append(1768500000 + seed / 100).append('.').append(f"${seed % 1000000}%06d").append('\t')
        sb.append('C').append(java.lang.Long.toHexString(m)).append('\t')
        sb.append("10.0.").append((m >>> 8) & 255).append('.').append(m & 255).append('\t')
        sb.append((m >>> 16) & 0xffff).append('\t')
        var i = 0
        while (i < nExtra) {
          sb.append((m >>> (i % 56)) & 127).append('\t')
          i += 1
        }
        sb.append(seed % 9973).append('\n')
        out.write(sb.toString)
        bytes += sb.length
        r += 1
      }
      out.close()
    }
    bytes
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      Files.createTempDirectory("widelog").toString)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val rowsPerFile = args.drop(2).headOption.map(_.toInt).getOrElse(250000)
    val nExtra = args.drop(3).headOption.map(_.toInt).getOrElse(116)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!Files.exists(Paths.get(dir, "wide_000.log"))) {
      val b = generate(dir, nFiles, rowsPerFile, nExtra)
      println(s"[widelog] wrote ${nFiles.toLong * rowsPerFile} rows, ${b / 1048576} MiB plain")
    } else println(s"[widelog] reusing $dir")

    def time(label: String)(f: => Long): Unit = {
      f // warm codegen + JIT
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[widelog] $label%-14s min=${runs.min}%6.2f s  (${runs.mkString(", ")})")
    }
    def rd = graft.zeek.Zeek.read(spark, s"$dir/*.log")
    time("count(*)") { rd.count() }
    // early vs late are the SAME work (one count-typed column summed) at
    // the two ends of the line: their gap is pure tokenizer tail cost
    time("early-1col") { rd.agg(sum(col("id_orig_p"))).head.getLong(0) }
    time("late-1col") { rd.agg(sum(col("zlast"))).head.getLong(0) }
    time("full-width") {
      rd.agg(sum((4 until 8).map(i => col(s"x$i")).reduce(_ + _) + col("zlast"))
          + countDistinct(col("uid"))).head.getLong(0) }
    spark.stop()
  }
}
