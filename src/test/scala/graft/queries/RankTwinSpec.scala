package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.zeek.SharedSpark

/** The r6 verdict demoted the single-task global-window forms of q114
  * (three unpartitioned ntile windows) and d47 (orderBy().limit(n/3) cut
  * rows) to test-only oracles: these tests run the OLD exact forms and
  * assert the shipping GlobalRank-based variants agree row-for-row at
  * test SF. The d49 test plants a hot bigram and proves the df-cap
  * prunes it (bounded self-join fan-out) while reporting the pruned-key
  * count.
  */
class RankTwinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q114: GlobalRank ntile arithmetic agrees with the ntile-window form") {
    val got = graft.SparkEntry.queries("q114_rfm")(spark, sf).collect()
    val expected = EventQueries.rfmBase(spark, sf)
      .withColumn("r_seg", ntile(5).over(Window.orderBy(desc("recency"), col("user_id"))))
      .withColumn("f_seg", ntile(5).over(Window.orderBy(desc("frequency"), col("user_id"))))
      .withColumn("m_seg", ntile(5).over(Window.orderBy(desc("monetary"), col("user_id"))))
      .select(col("user_id"), col("recency"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        col("r_seg"), col("f_seg"), col("m_seg"),
        concat(col("r_seg"), lit("-"), col("f_seg"), lit("-"), col("m_seg")).as("segment"))
      .orderBy(col("user_id")).collect()
    assert(got.length == expected.length && got.length > 0)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }

  test("d47: GlobalRank tercile buckets agree with the cut-row form") {
    val got = graft.SparkEntry.queries("d47_ppl_buckets")(spark, sf).collect()
    val scores = CurationQueries.pplScores(spark, sf)
    val nDocs = scores.count()
    def cut(k: Long, a: String, b: String) =
      scores.orderBy(col("nk"), col("doc_id")).limit(k.toInt)
        .agg(max(struct(col("nk"), col("doc_id"))).as("c"))
        .select(col("c.nk").as(a), col("c.doc_id").as(b))
    val k1 = math.ceil(nDocs / 3.0).toLong
    val k2 = math.ceil(nDocs * 2 / 3.0).toLong
    val expected = scores
      .crossJoin(broadcast(cut(k1, "c1nk", "c1id")))
      .crossJoin(broadcast(cut(k2, "c2nk", "c2id")))
      .select(col("doc_id"), col("avg_logprob"),
        when(col("nk") < col("c1nk") ||
          (col("nk") === col("c1nk") && col("doc_id") <= col("c1id")), "head")
          .when(col("nk") < col("c2nk") ||
            (col("nk") === col("c2nk") && col("doc_id") <= col("c2id")), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id")).collect()
    assert(got.length == expected.length && got.length > 0)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }

  test("d49: a planted hot bigram is pruned by the df-cap and reported") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d49cap").toFile
    dir.deleteOnExit()
    // 120 docs all sharing the bigram "hot bigram" (df = 120 > maxDf =
    // 100); every other bigram is unique (df = 1). Without the cap the
    // self-join would produce 120*119/2 = 7140 candidate rows from the
    // hot posting list alone; with it the join input is EMPTY.
    val docs = (0 until 120)
      .map(i => (i.toLong, s"hot bigram u$i"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val out = graft.SparkEntry.queries("d49_dedup_sweep")(spark, dir.getAbsolutePath)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 0L, "hot-bigram pairs must be pruned")
      assert(r.getAs[Long]("n_docs") == 0L)
      assert(r.getAs[Long]("n_pruned_keys") == 1L, "the hot key must be counted")
    }
  }

  test("withGlobalIndexAndCount returns the exact row count with the ordinals") {
    val df = spark.range(12345).select((col("id") * 31 % 997).as("k"), col("id").as("t"))
    val (idx, n) = graft.operators.GlobalRank
      .withGlobalIndexAndCount(df, "idx", col("k"), col("t"))
    assert(n == 12345L)
    val stats = idx.agg(min("idx"), max("idx"), countDistinct("idx")).collect()(0)
    assert(stats.getLong(0) == 0L && stats.getLong(1) == 12344L && stats.getLong(2) == 12345L)
  }
}
