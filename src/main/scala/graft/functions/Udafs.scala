package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed user-defined aggregates (the UDAF surface of SURVEY.md §2.C).
  *
  * `SumOfSquaresLong` is deliberately integer-exact so it is associative
  * and oracle-checkable: partial aggregation across any partitioning
  * yields identical results (the reason to avoid float UDAF accumulators
  * at scale).
  */
object Udafs {

  /** sum(x²) over a long input, exact. */
  object SumOfSquaresLong extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b + a * a
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("sum_sq", udaf(SumOfSquaresLong))
  }
}
