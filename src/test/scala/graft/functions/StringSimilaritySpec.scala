package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.zeek.SharedSpark

/** Jaro / Jaro-Winkler against the textbook values (Winkler 1990; the
  * same ones DuckDB's jaro_winkler_similarity reproduces — the q102
  * oracle cross-checks the full pair matrix against DuckDB itself). */
class StringSimilaritySpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark

  private def jw(a: String, b: String): Double =
    StringSimRuntime.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
  private def jaro(a: String, b: String): Double =
    StringSimRuntime.jaro(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("textbook pairs") {
    jaro("martha", "marhta") shouldBe 0.9444444444444445 +- 1e-12
    jw("martha", "marhta") shouldBe 0.9611111111111111 +- 1e-12
    jw("DWAYNE", "DUANE") shouldBe 0.8400000000000001 +- 1e-12
    jw("DIXON", "DICKSONX") shouldBe 0.8133333333333332 +- 1e-12
    // below the 0.7 boost threshold: jw == jaro despite the shared prefix? no —
    // CRATE/TRACE share no prefix; the value stays plain jaro
    jw("CRATE", "TRACE") shouldBe 0.7333333333333334 +- 1e-12
    jaro("aaa", "aaaaaa") shouldBe 0.8333333333333334 +- 1e-12
  }

  test("edge cases match DuckDB: empties score 0, equal non-empty 1, window-0 transposition") {
    jw("", "") shouldBe 0.0
    jaro("", "") shouldBe 0.0
    jaro("abc", "") shouldBe 0.0
    jw("abc", "abc") shouldBe 1.0
    // len-2 strings have match window 0: reversed pair shares nothing
    jaro("ab", "ba") shouldBe 0.0
    jaro("abc", "xyz") shouldBe 0.0
  }

  test("boost applies only above 0.7 and caps the prefix at 4") {
    // prefix 5 common chars, but only 4 count toward the bonus
    val j = jaro("prefixab", "prefixba")
    val expected = j + 4 * 0.1 * (1 - j)
    jw("prefixab", "prefixba") shouldBe expected +- 1e-12
  }

  test("codegen path: registered function equals the runtime on a column") {
    StringSimilarity.registerAll(spark)
    import spark.implicits._
    val rows = Seq(("martha", "marhta"), ("DIXON", "DICKSONX"), ("", ""), ("same", "same"))
      .toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")).as("jw"),
        call_function("jaro_sim", col("a"), col("b")).as("j"))
      .collect()
    rows.map(_.getDouble(0)).zip(Seq(
      jw("martha", "marhta"), jw("DIXON", "DICKSONX"), 0.0, 1.0))
      .foreach { case (got, want) => got shouldBe want +- 1e-12 }
    // nulls propagate (StaticInvoke propagateNull)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }
}
