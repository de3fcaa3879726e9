package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as codegen-native expressions — the canonical
  * first step of text dedup keys (visually identical strings with
  * different codepoint sequences MUST hash equal before any exact or
  * near dedup): `unicode_nfc` (canonical composition, DuckDB's
  * `nfc_normalize` twin) and `unicode_nfkc` (compatibility composition —
  * folds ligatures, full-width forms, superscripts; the aggressive
  * variant tokenizer pipelines use). StaticInvoke: called straight from
  * generated code, no UDF boxing; the fast path (already-normalized
  * ASCII/NFC text, the overwhelming majority of a real corpus) is
  * `Normalizer.isNormalized` — a scan, no allocation. */
object TextNormalizeRuntime {
  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)

  private def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

object TextNormalize {

  private def invoke(method: String, args: Seq[Expression]): Expression =
    StaticInvoke(TextNormalizeRuntime.getClass, StringType, method, args,
      inputTypes = Seq(StringType),
      propagateNull = true, returnNullable = false)

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "unicode_nfc" -> { es =>
      require(es.length == 1, s"unicode_nfc requires 1 argument, got ${es.length}")
      invoke("nfc", es)
    },
    "unicode_nfkc" -> { es =>
      require(es.length == 1, s"unicode_nfkc requires 1 argument, got ${es.length}")
      invoke("nfkc", es)
    })

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
