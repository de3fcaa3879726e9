package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.zeek.SharedSpark

/** [[HyperplaneSig]] replaced the per-row ScalaUDF closures that
  * computed LSH signatures (round-15 rewrite of the corpus-side hot
  * path of e03/e07 and every lshTopK caller). Its contract is
  * BIT-IDENTICAL output to those closures — their results are
  * verification-pinned at four scale factors — so this spec keeps the
  * retired closures alive AS TEST ORACLES and drives the expression
  * through both engines (interpreted `eval` and whole-stage codegen).
  */
class LshSignatureSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** The retired [[graft.ann.Ann.lshSignature]] closure, verbatim. */
  private def udfFloat(v: Seq[Float], nBits: Int, dims: Int): Int = {
    val planes = Array.tabulate(nBits, dims)((p, d) => graft.ann.Ann.planeWeight(p, d))
    var sig = 0; var p = 0
    while (p < planes.length) {
      val row = planes(p); var s = 0.0; var d = 0
      val n = math.min(row.length, v.length)
      while (d < n) { s += v(d) * row(d); d += 1 }
      if (s > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** The retired [[graft.ann.Ann.lshSignatureQuantized]] closure, verbatim. */
  private def udfQuant(v: Seq[Float], nBits: Int, dims: Int): Int = {
    val planes = Array.tabulate(nBits, dims)((p, d) =>
      if (graft.ann.Ann.planeWeight(p, d) > 0) 1L else -1L)
    var sig = 0; var p = 0
    while (p < planes.length) {
      val row = planes(p); var s = 0L; var d = 0
      val n = math.min(row.length, v.length)
      while (d < n) { s += row(d) * math.floor(v(d).toDouble * 1024.0).toLong; d += 1 }
      if (s > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Mixed-magnitude vectors that exercise near-zero accumulations (the
    * case where any arithmetic deviation flips a sign bit), plus short
    * (< dims) and long (> dims) vectors for the min(dims, length) bound. */
  private def testVectors: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(1723L)
    val random = (1 to 120).map(_ => Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f))
    val tiny = (1 to 40).map(_ => Array.fill(64)((rnd.nextFloat() - 0.5f) * 1e-4f))
    val short = (1 to 20).map(_ => Array.fill(1 + rnd.nextInt(63))(rnd.nextFloat() - 0.5f))
    val long = (1 to 20).map(_ => Array.fill(65 + rnd.nextInt(64))(rnd.nextFloat() - 0.5f))
    val edges = Seq(Array.empty[Float], Array(0f), Array(Float.NaN, 1f, -1f),
      Array.fill(64)(0f), Array.fill(64)(Float.MaxValue / 2))
    random ++ tiny ++ short ++ long ++ edges
  }

  test("hyperplane_sig: bit-identical to the retired ScalaUDF closures, both engines") {
    import spark.implicits._
    val vecs = testVectors
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    for ((nBits, dims) <- Seq((12, 64), (16, 64), (8, 64), (30, 7), (1, 64))) {
      // codegen engine: through a DataFrame projection
      val got = df.select(col("i"),
          graft.ann.Ann.lshSignature(col("v"), nBits, dims).as("f"),
          graft.ann.Ann.lshSignatureQuantized(col("v"), nBits, dims).as("q"))
        .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
      // interpreted engine: direct Expression.eval on a Literal
      for ((v, i) <- vecs.zipWithIndex) {
        val lit = Literal.create(v, ArrayType(FloatType, containsNull = false))
        val evalF = HyperplaneSig(lit, nBits, dims, quantized = false).eval(null)
        val evalQ = HyperplaneSig(lit, nBits, dims, quantized = true).eval(null)
        val expF = udfFloat(v.toSeq, nBits, dims)
        val expQ = udfQuant(v.toSeq, nBits, dims)
        assert(got(i)._1 == expF, s"codegen float nBits=$nBits dims=$dims vec#$i")
        assert(got(i)._2 == expQ, s"codegen quant nBits=$nBits dims=$dims vec#$i")
        assert(evalF == expF, s"eval float nBits=$nBits dims=$dims vec#$i")
        assert(evalQ == expQ, s"eval quant nBits=$nBits dims=$dims vec#$i")
      }
    }
  }

  test("hyperplane_sig on real embeddings matches the retired closures") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = emb.select(col("vec_id"), col("embedding"),
        graft.ann.Ann.lshSignature(col("embedding")).as("f"),
        graft.ann.Ann.lshSignatureQuantized(col("embedding")).as("q"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(r.getInt(2) == udfFloat(v, 12, 64), s"vec_id=${r.getLong(0)}")
      assert(r.getInt(3) == udfQuant(v, 8, 64), s"vec_id=${r.getLong(0)}")
    }
  }

  test("hyperplane_sig: NULL in → NULL out; double vectors coerce like the UDFs did") {
    import spark.implicits._
    val df = Seq((1, Some(Array(1f, 2f))), (2, None))
      .toDF("i", "v")
    val out = df.select(col("i"), graft.ann.Ann.lshSignatureQuantized(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out(1) != null)
    assert(out(2) == null)
    // array<double> input coerces through an analyzer-inserted cast —
    // the retired Seq[Float] ScalaUDFs accepted double corpora the same
    // way, and the vector API documents double[] as first-class; the
    // signature equals the closure applied to the float-cast values
    val dv = Array.fill(64)((new scala.util.Random(7L).nextDouble() - 0.5) * 2)
    val got = Seq((1, dv)).toDF("i", "v")
      .select(graft.ann.Ann.lshSignature(col("v")).as("f"),
        graft.ann.Ann.lshSignatureQuantized(col("v")).as("q"))
      .collect().head
    val fv = dv.map(_.toFloat)
    assert(got.getInt(0) == udfFloat(fv.toSeq, 12, 64))
    assert(got.getInt(1) == udfQuant(fv.toSeq, 8, 64))
  }

  test("signature projection is whole-stage codegen, no UDF (e03 corpus-side plan)") {
    // the round-15 rewrite's contract (same pin as the round-14 IVF
    // assignment): the one-pass-over-every-vector signature stage of
    // lshTopK must not carry an interpreted ScalaUDF hop
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = graft.ann.Ann.lshTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, nBits = 8)
    df.collect() // finalize AQE — codegen markers only exist on executed stages
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan.take(1500))
    assert(plan.contains("hyperplane_sig"), plan.take(1500))
    val sigLine = plan.linesIterator.find(_.contains("hyperplane_sig")).get
    assert(sigLine.contains("*("), sigLine.take(300))
  }

  test("hyperplane_sig planning cost is constant — no unrolled nBits×dims tree") {
    // the design HyperplaneSig replaced-by-construction: unrolling the
    // plane matrix into an expression TREE (one node per plane×dim) made
    // a representative lshTopK spend ~3 s in analysis/optimization alone
    // before the first task ran. That pathology regresses silently — the
    // plan still executes, correctness specs still pass — so pin the
    // SHAPE: the signature must stay a single expression node holding
    // its matrix as data, and the whole optimized plan's expression-node
    // count must grow only by lshTopK's intended per-probe literals
    // (1 + nBits Hamming-1 probes, a few nodes each), never by ~dims
    // nodes per bit.
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def exprNodes(nBits: Int): Int = {
      val df = graft.ann.Ann.lshTopK(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 3, nBits = nBits)
      df.queryExecution.optimizedPlan
        .collect { case p => p.expressions.map(e => e.collect { case _ => 1 }.sum).sum }
        .sum
    }
    val small = exprNodes(4)
    val big = exprNodes(24)
    // 20 extra probe buckets × a generous 8 nodes each (xor + literal +
    // alias overhead); an unrolled tree would add ≥ 20 × 64 × 2 = 2560
    assert(big - small <= 20 * 8, s"plan grew $small -> $big with nBits 4 -> 24")
    assert(big < 600, s"absolute optimized-plan expression budget blown: $big")
    // and the signature is ONE node: its only subtree is the input column
    val sigs = {
      val df = graft.ann.Ann.lshTopK(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 3, nBits = 16)
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.flatMap(_.collect { case h: HyperplaneSig => h })
      }.flatten
    }
    assert(sigs.nonEmpty)
    sigs.foreach(h => assert(h.children.size == 1, h.treeString.take(200)))
  }
}
