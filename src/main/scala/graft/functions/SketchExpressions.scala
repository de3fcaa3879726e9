package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of Spark's `count_min_sketch` aggregate: the built-in
  * aggregate produces the serialized sketch, but Spark ships no SQL
  * function to READ one — this expression closes the loop.
  *
  *   count_min_sketch(key, eps, conf, seed)  → binary   (built-in agg)
  *   cms_estimate(sketchBinary, key)         → bigint   (this)
  *
  * Key hashing mirrors `CountMinSketchAgg.update` exactly: integral
  * types probe through the long path, strings through their UTF-8
  * bytes, binary as-is — so estimates are the ones the aggregate's own
  * adds produced. The deserialized sketch is cached per byte-array
  * reference: in the intended plan shape (a one-row sketch aggregate
  * broadcast against a key table) every probe row carries the SAME
  * array instance per partition, so deserialization happens once per
  * task, not per row. CodegenFallback is fine at that position — the
  * probe side is a post-aggregate key table, orders of magnitude
  * smaller than the fact stream the sketch summarized.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate first argument must be BINARY, got ${left.dataType.sql}")
    else right.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate key must be integral, string, or binary, got ${t.sql}")
    }
  }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(cachedBytes eq bytes)) {
      cachedSketch = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    right.dataType match {
      case ByteType    => cachedSketch.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Byte].toLong))
      case ShortType   => cachedSketch.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Short].toLong))
      case IntegerType => cachedSketch.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Int].toLong))
      case LongType    => cachedSketch.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Long]))
      case StringType  => cachedSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
      case BinaryType  => cachedSketch.estimateCount(item.asInstanceOf[Array[Byte]])
      case t => throw new IllegalStateException(s"unsupported key type $t")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cms_estimate" -> {
      case Seq(sk, key) => CmsEstimate(sk, key)
      case es => throw new IllegalArgumentException(
        s"cms_estimate requires exactly 2 arguments, got ${es.length}")
    })

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
