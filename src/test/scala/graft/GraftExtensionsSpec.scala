package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** Cluster-deployment path: `spark.sql.extensions=graft.GraftExtensions`
  * must make every expression-backed function available without any
  * per-session registerAll call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension injection exposes vector + inet functions session-wide") {
    SharedSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions is the same injection path `spark.sql.extensions`
    // triggers; the static conf itself can't be set on an already-running
    // SparkContext, which this test shares
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  inet_contains('10.0.0.0/8', '10.1.2.3') AS hit,
          |  inet_normalize('2001:0db8:0000:0000:0000:0000:0000:0001') AS n6,
          |  is_ipv4('1.2.3.4') AS v4""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
      assert(r.getBoolean(2))
      assert(r.getString(3) == "2001:db8::1")
      assert(r.getBoolean(4))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SharedSpark.spark)
      SparkSession.setActiveSession(SharedSpark.spark)
    }
  }

  test("extension injection registers the read_zeek SQL table function") {
    import graft.zeek.ZeekFixtures
    SharedSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val dir = ZeekFixtures.tempDir()
      ZeekFixtures.write(dir, "conn.log", ZeekFixtures.connContent)
      // no register() call — the injected table function must resolve
      val n = s.sql(s"SELECT count(*) AS n FROM read_zeek('$dir/*.log')")
        .collect()(0).getLong(0)
      assert(n > 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SharedSpark.spark)
      SparkSession.setActiveSession(SharedSpark.spark)
    }
  }

  test("optimizer rule: literal-CIDR containment pushes a prefix predicate into the zeek scan") {
    import org.apache.spark.sql.functions._
    import graft.zeek.ZeekFixtures
    SharedSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val dir = ZeekFixtures.tempDir()
      ZeekFixtures.write(dir, "conn.log", ZeekFixtures.connContent)
      def conn = s.read.format("zeek").load(s"$dir/*.log")

      // /16 over the SQL (StaticInvoke) form: prefix reaches the scan
      val df = conn.filter(expr("inet_contains('8.8.0.0/16', id_resp_h)"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("StringStartsWith(id_resp_h,8.8.)"),
        "implied prefix must be pushed into the zeek scan:\n" + plan.take(2500))
      assert(df.collect().map(_.getAs[String]("id_resp_h")).toSet == Set("8.8.8.8", "8.8.4.4"))

      // Column-API (ScalaUDF) form matches by function identity
      val viaUdf = conn.filter(
        graft.inet.InetFunctions.inet_contains(lit("8.8.0.0/16"), col("id_resp_h")))
      assert(viaUdf.queryExecution.executedPlan.toString
        .contains("StringStartsWith(id_resp_h,8.8.)"))
      assert(viaUdf.count() == 2)

      // host route (/32 implied) becomes a pushed equality
      val eq = conn.filter(expr("inet_contains('8.8.8.8', id_resp_h)"))
      assert(eq.queryExecution.executedPlan.toString.contains("EqualTo(id_resp_h,8.8.8.8)"))
      assert(eq.count() == 1)

      // non-octet-aligned and v6 CIDRs: NO rewrite, semantics intact
      val odd = conn.filter(expr("inet_contains('8.8.0.0/12', id_resp_h)"))
      assert(!odd.queryExecution.executedPlan.toString.contains("StringStartsWith"))
      assert(odd.count() == 2)
      val v6 = conn.filter(expr("inet_contains('2001:4860::/32', id_resp_h)"))
      assert(!v6.queryExecution.executedPlan.toString.contains("StringStartsWith"))
      assert(v6.count() == 1)

      // non-literal CIDR (column vs column): untouched
      val dyn = conn.filter(expr("inet_contains(concat(id_orig_h, '/32'), id_resp_h)"))
      assert(dyn.count() == 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SharedSpark.spark)
      SparkSession.setActiveSession(SharedSpark.spark)
    }
  }

  test("optimizer rule: jaro-winkler threshold filters gain a length-ratio prefilter") {
    import org.apache.spark.sql.functions._
    SharedSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      graft.functions.StringSimilarity.registerAll(s)
      import s.implicits._
      val wdir = java.nio.file.Files.createTempDirectory("jw_rule").toString
      Seq("martha", "marhta", "ma", "completely different and far longer")
        .toDF("w").write.mode("overwrite").parquet(wdir)
      val words = s.read.parquet(wdir)

      val df = words.filter(expr("jaro_winkler(w, 'martha') >= 0.9"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("least(") && optimized.contains("greatest("),
        "length-ratio bound missing:\n" + optimized)
      // the bound must short-circuit BEFORE the kernel
      assert(optimized.indexOf("least(") < optimized.indexOf("jaroWinkler"), optimized)
      assert(df.collect().map(_.getString(0)).toSet == Set("martha", "marhta"))

      // flipped literal side rewrites too
      val flipped = words.filter(expr("0.9 <= jaro_winkler(w, 'martha')"))
      assert(flipped.queryExecution.optimizedPlan.toString.contains("least("))
      assert(flipped.count() == 2)

      // jaro_sim gets its own (weaker) ratio bound
      val jaro = words.filter(expr("jaro_sim(w, 'martha') >= 0.8"))
      assert(jaro.queryExecution.optimizedPlan.toString.contains("least("))
      assert(jaro.collect().map(_.getString(0)).toSet == Set("martha", "marhta"))

      // vacuous thresholds are NOT rewritten (bound would be <= 0)
      val low = words.filter(expr("jaro_winkler(w, 'martha') >= 0.7"))
      assert(!low.queryExecution.optimizedPlan.toString.contains("least("))
      assert(low.count() >= 2)

      // lower bounds (>= on the other side of the row value) untouched
      val ge = words.filter(expr("jaro_winkler(w, 'martha') <= 0.9"))
      assert(!ge.queryExecution.optimizedPlan.toString.contains("least("))

      // idempotence under re-application
      val once = new graft.plans.JaroWinklerBoundRule()(df.queryExecution.optimizedPlan)
      assert(once.toString.split("least\\(").length ==
        df.queryExecution.optimizedPlan.toString.split("least\\(").length)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SharedSpark.spark)
      SparkSession.setActiveSession(SharedSpark.spark)
    }
  }

  test("optimizer rule: levenshtein threshold filters gain a length-gap prefilter") {
    import org.apache.spark.sql.functions._
    SharedSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      import s.implicits._
      // parquet-backed (a LocalRelation would be constant-folded through
      // the filter before the rule's effect is observable)
      val wdir = java.nio.file.Files.createTempDirectory("lev_rule").toString
      Seq("kitten", "sitting", "kit", "mitten",
        "a far longer string than the probe").toDF("w")
        .write.mode("overwrite").parquet(wdir)
      val words = s.read.parquet(wdir)

      val df = words.filter(expr("levenshtein(w, 'kitten') <= 2"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("abs(") && optimized.contains("length("),
        "length-gap bound missing:\n" + optimized)
      // the bound must come BEFORE the kernel in the conjunction
      assert(optimized.indexOf("abs(") < optimized.indexOf("levenshtein("), optimized)
      assert(df.collect().map(_.getString(0)).toSet == Set("kitten", "mitten"))

      // flipped literal side and strict < both rewrite
      val flipped = words.filter(expr("2 >= levenshtein(w, 'kitten')"))
      assert(flipped.queryExecution.optimizedPlan.toString.contains("abs("))
      assert(flipped.count() == 2)
      val strict = words.filter(expr("levenshtein(w, 'kitten') < 4"))
      assert(strict.queryExecution.optimizedPlan.toString.contains("abs("))
      assert(strict.collect().map(_.getString(0)).toSet ==
        Set("kitten", "sitting", "kit", "mitten"))

      // idempotence: re-optimizing an already-rewritten plan adds nothing
      val once = new graft.plans.LevenshteinBoundRule()(df.queryExecution.optimizedPlan)
      assert(once.toString.split("abs\\(").length ==
        df.queryExecution.optimizedPlan.toString.split("abs\\(").length)

      // column-vs-column comparison also bounds (no literal needed)
      val pdir = java.nio.file.Files.createTempDirectory("lev_rule2").toString
      Seq(("abc", "abcd"), ("abc", "xy")).toDF("x", "y")
        .write.mode("overwrite").parquet(pdir)
      val pairs = s.read.parquet(pdir).filter(expr("levenshtein(x, y) <= 1"))
      assert(pairs.queryExecution.optimizedPlan.toString.contains("abs("))
      assert(pairs.count() == 1)

      // equality and >= thresholds are NOT rewritten (no sound bound)
      val ge = words.filter(expr("levenshtein(w, 'kitten') >= 2"))
      assert(!ge.queryExecution.optimizedPlan.toString.contains("abs("))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SharedSpark.spark)
      SparkSession.setActiveSession(SharedSpark.spark)
    }
  }
}
