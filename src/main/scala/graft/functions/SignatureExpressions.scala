package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sig(text) → array<bigint>: the 64-permutation MinHash
  * signature in one native pass (kernel:
  * [[graft.dedup.SignatureKernel]]) — bit-identical to the Scala-UDF
  * formulation it replaces, without the UTF8String→String conversion,
  * regex split, or per-word String allocation. The signature stage is
  * the map-side CPU cost of every MinHash dedup pipeline; at 100 TB it
  * IS the scan. */
case class MinhashSig(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      graft.dedup.SignatureKernel.minhashSig(
        input.asInstanceOf[UTF8String], numHashes, shingleSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.dedup.SignatureKernel.minhashSig($c, $numHashes, $shingleSize));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** shingles(text, n) → array<string>: the distinct word n-gram shingles
  * in first-seen order — bit-identical to the Scala-UDF formulation over
  * [[graft.dedup.Dedup.shingles]] (property-pinned in
  * `SignatureKernelSpec`), minus the UTF8String→String conversion, regex
  * split, per-slice mkString, and result re-encoding. Used on every
  * full-corpus shingle-explode path (decontamination, inverted-index /
  * prefix joins), where the per-row UDF round-trip was the last
  * interpreted stage in an otherwise codegen'd pipeline. */
case class Shingles(child: Expression, shingleSize: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.dedup.SignatureKernel.shinglesData(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.SignatureKernel.shinglesData($c, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** simhash64(text) → bigint: per-bit majority vote over the word-bigram
  * shingle hashes, fused into one native pass; bit-identical to the
  * Scala-UDF form (see [[graft.dedup.SignatureKernel]]). */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true // NULL in -> NULL out (nullSafeEval)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      graft.dedup.SignatureKernel.simhash64(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SignatureKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
