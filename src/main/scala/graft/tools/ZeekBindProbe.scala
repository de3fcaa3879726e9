package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration

import graft.zeek.{ZeekOptions, ZeekSchema}

/** Times union_by_name bind over a many-file glob — the plan-time cost
  * the round-10 verdict flagged: union mode must open EVERY file's
  * header at bind, and doing it serially on the driver is tens of
  * thousands of sequential open+read round trips at the 100-TB shape
  * (hourly rotated logs on an object store). The bind now reads headers
  * on a bounded pool; this probe generates an n-file synthetic glob
  * (rotating field layouts so the union is non-trivial) and reports the
  * bind wall-clock alongside a serial single-file-at-a-time baseline
  * over the same files.
  *
  * Usage: runMain graft.tools.ZeekBindProbe [numFiles] [workDir]
  */
object ZeekBindProbe {

  private def header(fields: Seq[(String, String)]): String = {
    val names = fields.map(_._1).mkString("\t")
    val types = fields.map(_._2).mkString("\t")
    s"""#separator \\x09
       |#set_separator\t,
       |#empty_field\t(empty)
       |#unset_field\t-
       |#path\tconn
       |#open\t2024-01-01-00-00-00
       |#fields\t$names
       |#types\t$types
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000
    val work = if (args.length > 1) args(1) else "/tmp/graft_zeek_bindprobe"
    val dir = Paths.get(work)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (dir.toFile.exists()) rm(dir.toFile)
    Files.createDirectories(dir)

    // three rotating layouts: shared prefix + per-layout extras, so the
    // union is real (NULL fill + first-seen ordering both exercised)
    val base = Seq("ts" -> "time", "uid" -> "string", "id.orig_h" -> "addr")
    val layouts = Seq(
      base ++ Seq("orig_bytes" -> "count"),
      base ++ Seq("resp_bytes" -> "count", "duration" -> "interval"),
      base ++ Seq("proto" -> "enum"))
    (0 until n).foreach { i =>
      val body = (0 until 3).map(r =>
        s"1700000000.$r\tuid$i-$r\t10.0.0.$r" +
          (if (i % 3 == 0) s"\t$r" else if (i % 3 == 1) s"\t$r\t0.5" else "\ttcp"))
        .mkString("", "\n", "\n")
      Files.writeString(dir.resolve(f"conn.$i%05d.log"),
        header(layouts(i % 3)) + body)
    }

    val conf = new Configuration()
    val opts = ZeekOptions(unionByName = true)
    val glob = s"$work/conn.*.log"

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm FS caches with one full pass, then measure
    ZeekSchema.bind(Seq(glob), opts, conf)
    val (bind, parallelSec) = time(ZeekSchema.bind(Seq(glob), opts, conf))

    // serial baseline: the pre-round-11 behavior — one header open+parse
    // at a time, same files, same parse (strict bind on each single file
    // reads exactly one header through the same code path)
    val files = bind.files.map(_.path)
    val (_, serialSec) = time {
      files.foreach(f =>
        ZeekSchema.bind(Seq(f), ZeekOptions(unionByName = false), conf))
    }

    println(f"ZEEKBINDPROBE files=$n union_cols=${bind.schema.length} " +
      f"parallel_bind_sec=$parallelSec%.2f serial_headers_sec=$serialSec%.2f " +
      f"speedup=${serialSec / parallelSec}%.1fx")
  }
}
