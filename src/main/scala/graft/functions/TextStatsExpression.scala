package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** text_stats(text) → struct(n_tokens int, stop_cnt int, punct_cnt int)
  * in ONE fused pass over the string (kernel:
  * [[graft.text.TextStatsKernel]]).
  *
  * The composable form — `size(split(text, "\\s+"))` for tokens, a second
  * split+filter for stopwords, `regexp_count` for punctuation — walks the
  * document up to four times and materializes two full word arrays per
  * row; at 100 TB of documents the tokenizer IS the scan cost. Callers
  * that need several of the stats in one projection (d01's token stats,
  * d02's quality score) share a single kernel call via whole-stage
  * codegen subexpression elimination, because equal `TextStats` instances
  * are equal case classes.
  *
  * The stopword list is a constructor argument (not a child expression):
  * it must be compile-time constant for the byte-comparison tables, and
  * keeping it in the case class makes two calls with the same list CSE
  * while different lists stay distinct. */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${other.catalogString}")
  }

  @transient private lazy val stopsBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    graft.text.TextStatsKernel.stats(input.asInstanceOf[UTF8String], stopsBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("textStatsStops", stopsBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.TextStatsKernel.stats($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}

/** canonical_text(text) → string: whitespace-collapsed + lowercased in
  * one fused pass ([[graft.text.TextStatsKernel.canonicalText]]); the
  * codegen form of `lower(regexp_replace(text, "\\s+", " "))` used under
  * content fingerprints. */
case class CanonicalText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonical_text requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.text.TextStatsKernel.canonicalText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextStatsKernel.canonicalText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "canonical_text"
}

/** lang_profile(text) → struct(_1.._N int hit-counts, _(N+1) string
  * guess) in one fused pass — the codegen replacement for the
  * tuple-returning language-ID UDF (no UTF8String→String conversion, no
  * lowercase copy, no split array; see
  * [[graft.text.TextStatsKernel.langProfile]] for the case-fold
  * equivalence argument). Field names mirror the Scala-tuple encoder
  * (`_1`…) so existing `p._1` accessors keep working. */
case class LangProfile(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StructType(
    langs.indices.map(i => StructField(s"_${i + 1}", IntegerType, nullable = false)) :+
      StructField(s"_${langs.length + 1}", StringType, nullable = false))
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_profile requires a string argument, got ${other.catalogString}")
  }

  @transient private lazy val groupsBytes: Array[Array[Array[Byte]]] =
    langs.map(_._2.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray).toArray
  @transient private lazy val nameStrings: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray

  override def nullSafeEval(input: Any): Any =
    graft.text.TextStatsKernel.langProfile(
      input.asInstanceOf[UTF8String], groupsBytes, nameStrings)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val groupsRef = ctx.addReferenceObj("langGroups", groupsBytes, "byte[][][]")
    val namesRef = ctx.addReferenceObj("langNames", nameStrings,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.TextStatsKernel.langProfile($c, $groupsRef, $namesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lang_profile"
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("stop_cnt", IntegerType, nullable = false),
    StructField("punct_cnt", IntegerType, nullable = false)))

  /** SQL builder: text_stats(text[, stop1, stop2, ...]); no stopword
    * arguments = the default list. Extra arguments must be foldable
    * strings (the kernel's comparison tables are built at plan time). */
  def builder(es: Seq[Expression]): Expression = {
    require(es.nonEmpty, s"text_stats requires at least 1 argument, got ${es.length}")
    val stops = es.drop(1).map { e =>
      require(e.foldable && e.dataType == StringType,
        "text_stats stopword arguments must be string literals")
      val v = e.eval(null) // CAST(NULL AS STRING) is foldable+string but evals null
      require(v != null, "text_stats stopword arguments must be string literals")
      v.asInstanceOf[UTF8String].toString
    }
    TextStats(es.head,
      if (stops.isEmpty) graft.text.TextFunctions.DefaultStopwords else stops)
  }
}
