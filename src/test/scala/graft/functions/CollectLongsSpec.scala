package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** The primitive-buffer collect aggregates must be drop-in replacements
  * for `collect_list(struct(…))`: same multiset of elements per group
  * (arrival order differs only the way collect_list's own partial order
  * does — callers are order-insensitive by contract), nulls KEPT (the
  * struct wrapper they replace keeps null fields), and the buffer must
  * survive the partial→merge serialization boundary unchanged. */
class CollectLongsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def rows(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i % 7, if (i % 11 == 0) None else Some(i.toLong),
        if (i % 13 == 0) None else Some((i * 31).toLong))
    }.toDF("g", "a", "b")
  }

  test("collect_longs == unwrapped collect_list(struct(a)), nulls kept, partition-invariant") {
    val df = rows(500)
    // reference: collect_list over the struct wrapper, then unwrap
    val refDf = df.groupBy("g").agg(collect_list(struct(col("a"))).as("xs"))
      .select(col("g"), sort_array(expr("transform(xs, e -> e.a)")).as("xs"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Any](1))).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(CollectLongs.collectLongs(col("a")).as("xs"))
        .select(col("g"), sort_array(col("xs")).as("xs"))
        .orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Any](1))).toSeq
      assert(got == refDf, s"collect_longs diverged at $parts partitions")
    }
    // nulls are kept: group sizes must equal row counts, not non-null counts
    val sizes = df.groupBy("g").agg(CollectLongs.collectLongs(col("a")).as("xs"))
      .select(col("g"), size(col("xs")).as("n")).orderBy("g")
      .collect().map(r => r.getInt(1)).toSeq
    val expected = df.groupBy("g").count().orderBy("g")
      .collect().map(_.getLong(1).toInt).toSeq
    assert(sizes == expected, "null inputs were dropped")
  }

  test("collect_long_pairs == collect_list(struct(a, b)), nulls kept, field names honored") {
    val df = rows(500)
    def canon(d: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
      d.groupBy("g").agg(c.as("xs"))
        .select(col("g"),
          sort_array(expr("transform(xs, e -> struct(e.a, e.b))")).as("xs"))
        .orderBy("g").collect()
        .map(r => (r.getInt(0), r.getSeq[org.apache.spark.sql.Row](1))).toSeq
    val ref = canon(df, collect_list(struct(col("a"), col("b"))))
    for (parts <- Seq(1, 7, 32)) {
      val got = canon(df.repartition(parts),
        CollectLongs.collectLongPairs(col("a"), col("b"), "a", "b"))
      assert(got == ref, s"collect_long_pairs diverged at $parts partitions")
    }
    // schema carries the requested field names
    val sch = df.groupBy("g")
      .agg(CollectLongs.collectLongPairs(col("a"), col("b"), "id", "sim").as("xs"))
      .schema("xs").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sch.fieldNames.toSeq == Seq("id", "sim"))
  }

  test("serialize/deserialize round-trips values and the null bitmap") {
    val buf = new LongsBuffer(2)
    buf.append(5L); buf.appendNull(); buf.append(-9L); buf.append(Long.MaxValue)
    val back = LongsBuffer.deserialize(buf.serialize())
    assert(back.size == 4)
    assert(!back.isNullAt(0) && back.values(0) == 5L)
    assert(back.isNullAt(1))
    assert(!back.isNullAt(2) && back.values(2) == -9L)
    assert(back.values(3) == Long.MaxValue)
    // no-null buffer serializes without a bitmap and round-trips
    val plain = new LongsBuffer(); plain.append(1L); plain.append(2L)
    val p2 = LongsBuffer.deserialize(plain.serialize())
    assert(p2.size == 2 && p2.values(0) == 1L && p2.values(1) == 2L && p2.nulls == null)
  }
}
