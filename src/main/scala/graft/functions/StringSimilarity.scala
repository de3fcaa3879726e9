package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro-Winkler similarity as codegen-native expressions
  * (StaticInvoke — called directly from generated code, no ScalaUDF
  * boxing). The record-linkage scorer that pairs with `levenshtein` in
  * fuzzy matching / blocking pipelines.
  *
  * Semantics follow the textbook definition (Winkler 1990) as
  * implemented by DuckDB / rapidfuzz, which the oracle checks against:
  * match window `max(|a|,|b|)/2 - 1`, transpositions counted over the
  * matched sequences, prefix bonus `l * 0.1 * (1 - jaro)` with `l <= 4`,
  * applied only when `jaro > 0.7` (the boost threshold). Any empty input
  * scores 0 (DuckDB's convention, even for two empties); equal non-empty
  * strings score 1.
  */
object StringSimRuntime {

  def jaro(a: UTF8String, b: UTF8String): Double = jaroImpl(a.toString, b.toString)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val j = jaroImpl(s1, s2)
    if (j > 0.7) {
      var l = 0
      val max = math.min(4, math.min(s1.length, s2.length))
      while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  private def jaroImpl(s1: String, s2: String): Double = {
    val len1 = s1.length; val len2 = s2.length
    // empty-before-equal: DuckDB/rapidfuzz score ''~'' as 0, not 1
    if (len1 == 0 || len2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!m2(k) && s1.charAt(i) == s2.charAt(k)) {
          m1(i) = true; m2(k) = true; m += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: positions where the matched subsequences disagree
    var t = 0
    var k2 = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k2)) k2 += 1
        if (s1.charAt(i) != s2.charAt(k2)) t += 1
        k2 += 1
      }
      i += 1
    }
    val half = t / 2
    (m.toDouble / len1 + m.toDouble / len2 + (m - half).toDouble / m) / 3.0
  }
}

object StringSimilarity {

  private def invoke(method: String, args: Seq[Expression]): Expression =
    StaticInvoke(StringSimRuntime.getClass, DoubleType, method, args,
      inputTypes = args.map(_ => StringType),
      propagateNull = true, returnNullable = false)

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "jaro_sim" -> { es =>
      require(es.length == 2, s"jaro_sim requires 2 arguments, got ${es.length}")
      invoke("jaro", es)
    },
    "jaro_winkler" -> { es =>
      require(es.length == 2, s"jaro_winkler requires 2 arguments, got ${es.length}")
      invoke("jaroWinkler", es)
    })

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
