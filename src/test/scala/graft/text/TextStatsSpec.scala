package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.zeek.SharedSpark

/** Pins the fused [[graft.functions.TextStats]] kernel to the split-based
  * formulation it replaced: for ANY string,
  *   n_tokens  == size(split(text, "\\s+"))
  *   stop_cnt  == size(filter(split(text, "\\s+"), w -> w IN stoplist))
  *   punct_cnt == regexp_count(text, "[.,;:!?]")
  * including the boundary-empty-field quirks of Java's split with
  * limit -1 and multi-byte UTF-8 content. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val stops = TextFunctions.DefaultStopwords

  private val tricky = Seq(
    "", " ", "  ", "a", " a", "a ", " a ", "a  b", "\ta\nbc\fd\re",
    "the", "the the the", "THE the The", "a.b,c;d:e!f?g",
    "!!!...???", ". , ; : ! ?", "the quick, brown fox. over the lazy dog!",
    "héllo wörld", " ", "a b", // NBSP is NOT \s
    "你好 世界", "emoji 😀 end",
    "trailing spaces   ", "   leading", "mixed\t \n ws\r\n runs",
    "of", "of.", ".of", "of of to in is it that and a an the",
    "punct.inside,tokens;still:counts!every?one")

  private def fuzzStrings(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val atoms = Vector("the", "and", "of", "to", "xyz", "Fox", "a", "an",
      "héllo", "世界", "😀", ".", ",", ";", ":", "!", "?",
      " ", "  ", "\t", "\n", "", "\f", "\r", " ", "", "...", "a.b")
    (1 to n).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
    }
  }

  private def checkCorpus(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text").select(
      col("text"),
      TextFunctions.tokenCount(col("text")).as("nt"),
      TextFunctions.stopwordCount(col("text")).as("sc"),
      TextFunctions.punctCount(col("text")).as("pc"),
      TextFunctions.qualityScore(col("text")).as("q"),
      // the original split-based formulations, inlined as the oracle
      size(split(col("text"), "\\s+")).as("nt0"),
      size(filter(split(col("text"), "\\s+"), w => w.isInCollection(stops))).as("sc0"),
      regexp_count(col("text"), lit("[.,;:!?]")).as("pc0"))
    val rows = df.collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getInt(1) == r.getInt(5), s"n_tokens mismatch on ${t.inspect()}")
      assert(r.getInt(2) == r.getInt(6), s"stop_cnt mismatch on ${t.inspect()}")
      assert(r.getInt(3) == r.getInt(7), s"punct_cnt mismatch on ${t.inspect()}")
      // quality recomputed from the oracle counters, same double order
      val n = r.getInt(5); val sc = r.getInt(6); val pc = r.getInt(7)
      // Spark's length() counts codepoints, not UTF-16 units
      val nChars = t.codePointCount(0, t.length)
      val q = math.min(math.max(
        (math.min(n, 200) * 1.0 / 200.0) * 0.5 + (sc * 1.0 / n) * 0.3 +
          (1.0 - pc * 1.0 / math.max(nChars, 1)) * 0.2, 0.0), 1.0)
      assert(r.getDouble(4) == q, s"quality mismatch on ${t.inspect()}")
    }
  }

  implicit private class Inspect(s: String) {
    def inspect(): String = s.map(c => if (c < ' ' || c > '~') f"\\u${c.toInt}%04x" else c).mkString("\"", "", "\"")
  }

  test("fused kernel == split formulation on the tricky corpus") {
    checkCorpus(tricky)
  }

  test("fused kernel == split formulation on 400 fuzz strings") {
    checkCorpus(fuzzStrings(400, seed = 20260815L))
  }

  test("kernel direct eval (interpreted path) matches") {
    val stopsB = stops.map(_.getBytes("UTF-8")).toArray
    val r = TextStatsKernel.stats(UTF8String.fromString("the quick, fox."), stopsB)
    assert(r.getInt(0) == 3 && r.getInt(1) == 1 && r.getInt(2) == 2)
    val empty = TextStatsKernel.stats(UTF8String.fromString(""), stopsB)
    assert(empty.getInt(0) == 1 && empty.getInt(1) == 0 && empty.getInt(2) == 0)
  }

  test("null text stays null; non-default stopword list is honored") {
    import spark.implicits._
    val df = Seq(Some("the end"), None).toDF("text")
    val out = df.select(
      TextFunctions.tokenCount(col("text")).as("nt"),
      TextFunctions.stopwordCount(col("text"), Seq("end")).as("sc")).collect()
    assert(out(0).getInt(0) == 2 && out(0).getInt(1) == 1)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("SQL surface: text_stats registered via GraftExtensions builder") {
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_stats", graft.functions.TextStats.builder, "scala_udf")
    Seq("the quick the").toDF("text").createOrReplaceTempView("tss")
    val r = spark.sql(
      "SELECT text_stats(text).n_tokens AS n, text_stats(text, 'quick').stop_cnt AS s FROM tss").collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 1)
  }

  test("text_stats builder rejects a foldable NULL stopword with a clear error") {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.StringType
    // CAST(NULL AS STRING) is foldable and string-typed but evals to null —
    // must raise the same analysis-time IllegalArgumentException as a
    // non-literal, not an NPE at plan time
    val nullStr = Cast(Literal(null, org.apache.spark.sql.types.NullType), StringType)
    val e = intercept[IllegalArgumentException] {
      graft.functions.TextStats.builder(Seq(Literal("x"), nullStr))
    }
    assert(e.getMessage.contains("must be string literals"))
  }

  test("native lang_profile == the tuple-UDF formulation it replaced") {
    import spark.implicits._
    // the previous implementation, inlined as the oracle
    val markerSets = TextFunctions.LangMarkers.map { case (l, ms) => l -> ms.toSet }
    val oldUdf = udf { (text: String) =>
      if (text == null) null
      else {
        val ws = text.toLowerCase.split("\\s+")
        val scores = markerSets.map { case (l, ms) => l -> ws.count(ms.contains) }
        val mx = scores.map(_._2).max
        val guess = if (mx <= 0) "und" else scores.find(_._2 == mx).get._1
        (scores(0)._2, scores(1)._2, scores(2)._2, scores(3)._2, guess)
      }
    }
    val corpus = tricky ++ fuzzStrings(400, seed = 99L) ++ Seq(
      "THE AND OF", "el la de la el", "der DIE und", "le les et dans",
      "the el", "el the", // ties resolve by declaration order: en first
      null)
    val rows = corpus.toDF("text").select(
      TextFunctions.langProfile(col("text")).as("p"),
      oldUdf(col("text")).as("o"),
      col("text")).collect()
    rows.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(0) && r.isNullAt(1))
      else {
        val p = r.getStruct(0); val o = r.getStruct(1)
        (0 until 4).foreach(i => assert(p.getInt(i) == o.getInt(i),
          s"score $i mismatch on ${r.getString(2).inspect()}"))
        assert(p.getString(4) == o.getString(4),
          s"guess mismatch on ${r.getString(2).inspect()}")
      }
    }
  }

  test("canonical_text == lower(regexp_replace(text, \\s+, ' '))") {
    import spark.implicits._
    val corpus = tricky ++ fuzzStrings(400, seed = 7L) ++
      Seq("MiXeD CaSe\t\tTABS", "ÄÖÜ ß É", "  Ends  ")
    val rows = corpus.toDF("text").select(
      TextFunctions.fingerprint(col("text")).as("fp"),
      md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp0"),
      col("text")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"fingerprint mismatch on ${r.getString(2).inspect()}"))
  }

  test("two instances in one projection codegen cleanly (freshName discipline)") {
    import spark.implicits._
    // distinct stopword lists -> distinct (non-CSE-able) TextStats
    // instances in ONE generated projection; Janino local-name collisions
    // would silently fall back to interpreted mode and/or wrong results
    val r = Seq("the a the b").toDF("text").select(
      TextFunctions.stopwordCount(col("text"), Seq("the")).as("x"),
      TextFunctions.stopwordCount(col("text"), Seq("a", "b")).as("y")).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
  }
}
