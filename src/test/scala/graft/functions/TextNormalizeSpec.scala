package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** unicode_nfc / unicode_nfkc: composition semantics, the no-op fast
  * path, and null propagation through the codegen StaticInvoke. The
  * NFC side is additionally hash-checked against DuckDB's
  * nfc_normalize by the d38 oracle; NFKC has no DuckDB twin, so its
  * ligature/width folds are pinned here. */
class TextNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("NFC composes combining sequences; NFKC additionally folds compatibility forms") {
    TextNormalize.registerAll(spark)
    import spark.implicits._
    val df = Seq(
      "e\u0301",          // e + combining acute -> é (1 char after NFC)
      "\uFB01n",          // fi-ligature: NFC-invariant, NFKC -> "fin"
      "\uFF21BC",         // full-width A: NFKC -> "ABC"
      "plain ascii").toDF("s")
      .select(col("s"),
        call_function("unicode_nfc", col("s")).as("nfc"),
        call_function("unicode_nfkc", col("s")).as("nfkc"))
      .collect()
    assert(df(0).getString(1) == "\u00E9" && df(0).getString(2) == "\u00E9")
    assert(df(1).getString(1) == "\uFB01n" && df(1).getString(2) == "fin")
    assert(df(2).getString(1) == "\uFF21BC" && df(2).getString(2) == "ABC")
    assert(df(3).getString(1) == "plain ascii" && df(3).getString(2) == "plain ascii")
  }

  test("already-normalized input returns the same UTF8String (no realloc) and nulls propagate") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("already nfc")
    assert(TextNormalizeRuntime.nfc(u) eq u)
    TextNormalize.registerAll(spark)
    import spark.implicits._
    val n = Seq(Option.empty[String]).toDF("s")
      .select(call_function("unicode_nfc", col("s"))).collect()
    assert(n.head.isNullAt(0))
  }
}
