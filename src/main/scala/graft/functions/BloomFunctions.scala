package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface over Spark's native runtime-filter Bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the exact pair
  * Catalyst's InjectRuntimeFilter rule plants for shuffle-join pruning,
  * here exposed for EXPLICIT semi-join prefilters in pipeline operators).
  *
  *   bloom_agg(xxhash64(key) [, estimatedItems [, numBits]])  → binary
  *   bloom_might_contain(filterBinary, xxhash64(key))         → boolean
  *
  * Both sides hash with the public `xxhash64` (seed 42), matching what
  * the aggregate expects (a LongType child). The aggregate is a real
  * distributed partial/merge aggregate; the probe is codegen'd and
  * NULL-safe (NULL key → NULL, never a false drop of the row by the
  * caller's outer predicate semantics). Used by
  * [[graft.dedup.Dedup.contaminationPairsBloom]].
  */
object BloomFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_agg" -> {
      case Seq(h)       => new BloomFilterAggregate(h)
      case Seq(h, n)    => new BloomFilterAggregate(h, n)
      case Seq(h, n, b) => new BloomFilterAggregate(h, n, b)
      case es => throw new IllegalArgumentException(
        s"bloom_agg requires 1-3 arguments, got ${es.length}")
    },
    "bloom_might_contain" -> {
      case Seq(f, v) => BloomFilterMightContain(f, v)
      case es => throw new IllegalArgumentException(
        s"bloom_might_contain requires exactly 2 arguments, got ${es.length}")
    })

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
