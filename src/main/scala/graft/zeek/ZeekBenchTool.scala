package graft.zeek

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput benchmark for the Zeek source (not part of the driver
  * contract — evidence for the single-node-throughput goal).
  *
  * Generates a deterministic conn-log corpus (`nFiles` gzip files ×
  * `rowsPerFile` rows, realistic 24-column rows), then times: COUNT(*)
  * (zero-parse path), a selective pushed filter, a 2-column projection,
  * and a full-width aggregation. Reports rows/s and decompressed MB/s.
  *
  * Usage: runMain graft.zeek.ZeekBenchTool [dir] [nFiles] [rowsPerFile]
  */
object ZeekBenchTool {

  def generate(dir: String, nFiles: Int, rowsPerFile: Int): Long = {
    Files.createDirectories(Paths.get(dir))
    var bytes = 0L
    for (f <- 0 until nFiles) {
      val path = Paths.get(dir, f"conn_$f%03d.log.gz")
      val out = new OutputStreamWriter(new GZIPOutputStream(
        new BufferedOutputStream(new FileOutputStream(path.toFile), 1 << 16), 1 << 16))
      val sb = new StringBuilder(256)
      out.write("#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n#unset_field\t-\n")
      out.write("#path\tconn\n#open\t2026-01-16-00-00-01\n")
      out.write("#fields\tts\tuid\tid.orig_h\tid.orig_p\tid.resp_h\tid.resp_p\tproto\tservice\tduration\torig_bytes\tresp_bytes\tconn_state\tlocal_orig\tlocal_resp\tmissed_bytes\thistory\torig_pkts\torig_ip_bytes\tresp_pkts\tresp_ip_bytes\ttunnel_parents\n")
      out.write("#types\ttime\tstring\taddr\tport\taddr\tport\tenum\tstring\tinterval\tcount\tcount\tstring\tbool\tbool\tcount\tstring\tcount\tcount\tcount\tcount\tset[string]\n")
      var r = 0
      while (r < rowsPerFile) {
        val seed = f.toLong * rowsPerFile + r
        val m = graft.dedup.Dedup.mix64(seed)
        sb.setLength(0)
        sb.append(1768500000 + seed / 100).append('.').append(f"${seed % 1000000}%06d").append('\t')
        sb.append("C").append(java.lang.Long.toHexString(m)).append('\t')
        sb.append("10.").append((m & 0xff)).append('.').append((m >> 8) & 0xff).append('.').append((m >> 16) & 0xff).append('\t')
        sb.append(1024 + (m & 0xffff) % 64000).append('\t')
        sb.append("192.168.").append((m >> 24) & 0xff).append('.').append((m >> 32) & 0xff).append('\t')
        sb.append(if ((m & 3) == 0) 53 else 443).append('\t')
        sb.append(if ((m & 3) == 0) "udp" else "tcp").append('\t')
        sb.append(if ((m & 7) == 0) "-" else "dns").append('\t')
        sb.append((m & 0xfff)).append('.').append(f"${m & 0xffff}%05d").append('\t')
        sb.append(m & 0xffffff).append('\t').append((m >> 12) & 0xffffff).append('\t')
        sb.append("SF\tT\tF\t0\tShADad\t")
        sb.append((m & 0xfff)).append('\t').append((m & 0xffff)).append('\t')
        sb.append(((m >> 4) & 0xfff)).append('\t').append(((m >> 4) & 0xffff)).append('\t')
        sb.append(if ((m & 15) == 0) "(empty)" else "a,b").append('\n')
        out.write(sb.toString)
        r += 1
      }
      out.close()
      bytes += Files.size(path)
    }
    bytes
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/zeek_bench_data"
    val nFiles = if (args.length > 1) args(1).toInt else 16
    val rowsPerFile = if (args.length > 2) args(2).toInt else 250000
    val totalRows = nFiles.toLong * rowsPerFile

    if (!Files.exists(Paths.get(dir, "conn_000.log.gz"))) {
      println(s"[gen] writing $nFiles x $rowsPerFile rows to $dir ...")
      val bytes = generate(dir, nFiles, rowsPerFile)
      println(s"[gen] done, ${bytes / 1024 / 1024} MiB gzip")
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // steady-state timing: run once to compile codegen + warm the JIT,
    // then time a FRESH plan (same codegen cache, no shuffle reuse —
    // re-collecting the same DataFrame object would skip the scan stage
    // entirely via shuffle-output reuse and report fantasy numbers)
    def time(name: String)(body: => Any): Unit = {
      body // warm-up execution
      val t0 = System.nanoTime()
      val res = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $sec%7.2f s  ${totalRows / sec / 1e6}%6.2f Mrows/s  ($res)")
    }

    def mkDf() = spark.read.format("zeek").load(s"$dir/*.log.gz")
    val scalarCols = mkDf().schema.fields.collect {
      case f if !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => f.name
    }
    time("count(*) zero-parse")(mkDf().count())
    time("pushed filter count")(mkDf().filter(col("proto") === "udp").count())
    time("2-col projection agg")(
      mkDf().groupBy(col("proto")).agg(sum(col("orig_bytes"))).collect().length)
    time("full-width scan")(
      mkDf().agg(count(col("uid")), sum(col("orig_bytes")), sum(col("resp_pkts")),
        max(col("duration")), countDistinct(col("conn_state"))).collect().length)
    // every scalar column parsed (20 cols; the set[string] column would
    // force the generic row path) — the full-parse throughput metric
    time("wide scalar parse (20 col)")(
      mkDf().agg(scalarCols.map(c => count(col(c)).as(s"n_$c")).head,
        scalarCols.map(c => count(col(c)).as(s"n_$c")).tail: _*).collect().length)
    spark.stop()
  }
}
