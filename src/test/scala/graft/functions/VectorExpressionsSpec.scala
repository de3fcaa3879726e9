package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.zeek.SharedSpark

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("cosine_sim / dot_product / l2_distance match the composable formulation") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(2.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT cosine_sim(a, b) AS c, dot_product(a, b) AS d, l2_distance(a, b) AS l FROM vecs").collect()

    val dot0 = 1.0 * 4 + 2.0 * 5 + 3.0 * 6
    assert(math.abs(rows(0).getDouble(0) - dot0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    assert(rows(0).getDouble(1) == dot0)
    assert(rows(1).getDouble(0) == 0.0) // orthogonal
    assert(rows(2).getDouble(0) == 1.0) // parallel
    assert(math.abs(rows(2).getDouble(2) - 1.0) < 1e-12)

    // against the zip_with/aggregate formulation on real embeddings
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val both = emb.crossJoin(emb.select(col("embedding").as("e2"), col("vec_id").as("v2")).limit(5))
      .select(
        call_function("cosine_sim", col("embedding"), col("e2")).as("fast"),
        graft.ann.Ann.cosine(col("embedding"), col("e2")).as("slow"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("float_l2sq: bit-identical to a scalar Array[Float] loop, in both eval modes") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    // float subtract/multiply, double accumulate — the EXACT arithmetic
    // of the scalar loop the IVF assignment UDF used; a double-precision
    // subtract differs in ulps and could flip a near-tie argmin
    def scalar(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val rnd = new scala.util.Random(41L)
    val rows = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    df.createOrReplaceTempView("fl2")
    // codegen path (projection) — exact equality, not tolerance
    val got = spark.sql("SELECT float_l2sq(a, b) FROM fl2").collect().map(_.getDouble(0))
    got.zip(rows).foreach { case (g, (a, b)) => assert(g == scalar(a, b)) }
    // interpreted path (literal fold at analysis time would use eval)
    val one = spark.sql(
      "SELECT float_l2sq(CAST(array(1.5, 2.25) AS ARRAY<FLOAT>), CAST(array(0.25, -1.0) AS ARRAY<FLOAT>))")
      .collect()(0).getDouble(0)
    assert(one == (1.5f - 0.25f) * (1.5f - 0.25f) + (2.25f + 1.0f) * (2.25f + 1.0f))
    // dimension mismatch → NULL; non-float elements → analysis error
    assert(spark.sql(
      "SELECT float_l2sq(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(1.0, 2.0) AS ARRAY<FLOAT>))")
      .collect()(0).isNullAt(0))
    val err = intercept[Exception](spark.sql("SELECT float_l2sq(array(1.0), array(2.0))").collect())
    assert(err.getMessage.contains("float_l2sq requires array<float>"))
  }

  test("expressions participate in whole-stage codegen (no fallback)") {
    VectorExpressions.registerAll(spark)
    graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("cg_emb")
    val df = spark.sql("SELECT cosine_sim(embedding, embedding) AS c FROM cg_emb")
    // the project containing the expression must sit inside a
    // WholeStageCodegen span (the `*(n)` marker)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(1200))
    // and the generated code computes the right thing (self-cosine = 1)
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("TWO instances in one generated function compile (fresh local names)") {
    // regression: fixed local names (`i`, `s`, `dot`) collide when two
    // instances land in the same generated method ("Redefinition of
    // local variable") and Janino silently drops the whole projection
    // to interpreted mode. Generating the projection DIRECTLY (instead
    // of through an executed plan) turns that silent fallback into a
    // thrown CompileException, so this test FAILS on regression.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.{ArrayType, LongType, FloatType}
    val la = BoundReference(0, ArrayType(LongType), nullable = true)
    val lb = BoundReference(1, ArrayType(LongType), nullable = true)
    val fa = BoundReference(2, ArrayType(FloatType), nullable = true)
    val fb = BoundReference(3, ArrayType(FloatType), nullable = true)
    GenerateMutableProjection.generate(Seq(
      LongDot(la, lb), LongDot(lb, la), LongL2Sq(la, lb), LongL2Sq(lb, la),
      CosineSim(fa, fb), CosineSim(fb, fa), DotProduct(fa, fb),
      DotProduct(fb, fa), L2Distance(fa, fb), L2Distance(fb, fa)))
    // and end-to-end: one projection mixing every scorer twice
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(1L, 2L), Array(3L, 4L)))
      .toDF("a", "b", "qa", "qb").createOrReplaceTempView("two_vecs")
    val r = spark.sql(
      """SELECT long_dot(qa, qb) + long_dot(qb, qa) AS d2,
        |  long_l2sq(qa, qb) + long_l2sq(qb, qa) AS l2,
        |  dot_product(a, b) + dot_product(b, a) AS dp,
        |  l2_distance(a, b) + l2_distance(b, a) AS ld,
        |  cosine_sim(a, b) + cosine_sim(b, a) AS cs
        |FROM two_vecs""".stripMargin).collect().head
    assert(r.getLong(0) == 22L && r.getLong(1) == 16L)
    assert(math.abs(r.getDouble(2) - 22.0) < 1e-9)
  }

  test("zero-norm input yields NULL") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    df.createOrReplaceTempView("zv")
    assert(spark.sql("SELECT cosine_sim(a, b) AS c FROM zv").collect().head.isNullAt(0))
  }

  test("mixed array<float>/array<double> inputs use per-side getters") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("mixed_vecs")
    val r = spark.sql(
      "SELECT dot_product(a, b) AS d, cosine_sim(a, b) AS c FROM mixed_vecs").collect().head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("non-float element types are an analysis error, not garbage numbers") {
    import spark.implicits._
    VectorExpressions.registerAll(spark)
    Seq((Array(1, 2, 3), Array(4, 5, 6))).toDF("a", "b")
      .createOrReplaceTempView("int_vecs")
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(a, b) FROM int_vecs").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }
}
