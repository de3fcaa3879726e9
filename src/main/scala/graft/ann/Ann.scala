package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.dedup.Dedup.mix64

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one pass, no corpus shuffle. The baseline
  *    and the verifier for the approximate path.
  *  - [[lshTopK]]: random-hyperplane LSH — each vector gets a `nBits`
  *    signature; queries probe only their bucket (plus Hamming-1 neighbors
  *    for recall). At 100 TB the corpus is hashed once (map-only), stored
  *    bucketed, and each query touches ~corpus/2^nBits vectors.
  *
  * Dot products: the composable `zip_with` + `aggregate` form is kept
  * only for tiny/driver-side shapes — Spark does NOT codegen
  * higher-order functions (they evaluate interpreted, allocating an
  * intermediate array per call; the round-12 sf10 sweep measured the
  * difference on e07b's candidate scoring). Corpus-size hot paths go
  * through the fused native expressions ([[graft.functions.CosineSim]],
  * `long_dot`) — one inline loop inside whole-stage codegen, identical
  * sequential double fold, bit-identical values.
  */
object Ann {

  /** Sequential-fold dot product of two float-array columns, in double
    * precision (deterministic: same fold order everywhere). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, z) => acc + z)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass cosine via the native [[graft.functions.CosineSim]]
    * expression (registered on demand): one array walk, no intermediate
    * allocation — the hot-path scorer for corpus-scale scans.
    *
    * Zero-norm semantics (intended, differs from the naive
    * `dot/(norm*norm)` form): CosineSim returns NULL for a zero-norm
    * input, so `cos >= threshold` filters such pairs OUT. The naive
    * form yields NaN, which Spark's total ordering compares GREATER
    * than any threshold, silently admitting meaningless pairs.
    * Cosine of a zero vector is undefined; dropping is correct, and
    * the hash-checked oracles agree because the corpus contains no
    * zero-norm vectors at any verified SF (checked through sf10). */
  private def fastCosine(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column = {
    graft.functions.VectorExpressions.registerAll(spark)
    call_function("cosine_sim", a, b)
  }

  /** Pin an expensive kernel column to one evaluation per row — see
    * [[graft.functions.EvalOnce]]. Used on every projection whose value
    * a later filter (written or optimizer-inferred) would otherwise
    * substitute and re-evaluate: the encode/cell/signature kernels are
    * the map-side cost of these operators, and the duplicated-filter
    * shape literally doubles them. Values are bit-identical. */
  private def once(c: Column): Column = graft.functions.EvalOnce(c)

  /** Exact top-k by cosine for each query vector. `queries` and `corpus`
    * both carry (idCol, vecCol); queries are assumed small → broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", fastCosine(corpus.sparkSession)(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Exact maximum-inner-product top-k (MIPS) — retrieval/recommender
    * scoring over unnormalized embeddings, where magnitude matters and
    * cosine is the wrong metric. Same broadcast shape as
    * [[bruteForceTopK]]: queries broadcast, corpus never shuffles, fused
    * codegen scorer. The scale path is the classic norm-augmentation
    * reduction (append sqrt(M²−‖x‖²) to each corpus vector, 0 to each
    * query) that turns MIPS into the cosine LSH problem [[lshTopK]]
    * already solves. */
  def bruteForceTopKDot(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.registerAll(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", call_function("dot_product", col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dot", "rank")
  }

  /** Deterministic random-hyperplane component: plane p, dimension d →
    * pseudo-random ±1 weight (seed-free, stable across runs/JVMs).
    * private[graft]: the oracle twin embeds the same weights as SQL
    * literals, so both engines hash one source of truth. */
  private[graft] def planeWeight(p: Int, d: Int): Double =
    if (((mix64(p.toLong * 1000003L + d) >>> 17) & 1L) == 1L) 1.0 else -1.0

  /** `nBits`-bit hyperplane signature as an int column — ONE native
    * codegen expression ([[graft.functions.HyperplaneSig]]). History of
    * this hot path (it is the corpus-side one-pass-per-vector stage of
    * every LSH caller, including headline e03): first a per-row ScalaUDF
    * (interpreted hop, fences whole-stage codegen); an unrolled
    * nBits×dims element_at tree was rejected because Catalyst planning
    * dominated (measured 3s per query at sf0.1); the expression's
    * doGenCode loop over the plane reference object has constant
    * planning cost AND codegen, with arithmetic bit-identical to the
    * retired UDF (float element × double ±1 weight, sequential double
    * accumulate). */
  def lshSignature(vec: Column, nBits: Int = 12, dims: Int = 64): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.HyperplaneSig(
        org.apache.spark.sql.graft.GraftSql.expression(floatVec(vec)),
        nBits, dims, quantized = false))

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine ≥ threshold, found via hyperplane-bucket self-join with
    * Hamming-1 multi-probe (high-cosine pairs agree on most hyperplane
    * signs, so they collide with high probability). The corpus-scale
    * path: each vector lands in 1 + nBits buckets; the n² pair space
    * never materializes. */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 0, dims: Int = 64): DataFrame =
    cosineNearDupsWith(corpus, idCol, vecCol, threshold, nBits,
      lshSignature(_, _, dims))

  /** [[cosineNearDups]] with the integer-quantized signature
    * ([[lshSignatureQuantized]]) — the fully hash-checkable LSH PAIR
    * pipeline: e07b's oracle rebuilds signature, banded probes, pair
    * join, and cosine in SQL from the same plane literals, the role
    * e03b plays for the top-k path. */
  def cosineNearDupsQuantized(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 0, dims: Int = 64): DataFrame =
    cosineNearDupsWith(corpus, idCol, vecCol, threshold, nBits,
      lshSignatureQuantized(_, _, dims))

  /** Occupancy-driven LSH signature width: the smallest width in
    * [16, 30] whose bucket count 2^width keeps expected per-bucket
    * occupancy ≤ `targetOccupancy` — i.e. ceil(n / targetOccupancy) ≤
    * 2^width. Integer-exact (no float log near power-of-two
    * boundaries). This is the round-13 sizing lesson AS CODE: a fixed
    * small width is quadratic in disguise (sf10's 200k vectors at 8
    * bits → ~7·10⁸ candidate pairs, 74 GB of spill); the floor of 16
    * costs nothing at small corpora (the signature is an int either
    * way; sparsely-occupied buckets just make the self-join cheaper)
    * and keeps signatures IDENTICAL across every verified SF — n must
    * exceed targetOccupancy·2^16 = 262,144 vectors (the decade above
    * sf10's 200,003) before the width grows, which is exactly when the
    * static-16 oracle twin hands off to topology bytediff. */
  def lshBitsFor(n: Long, targetOccupancy: Int = 4): Int = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val buckets = (math.max(n, 1L) + targetOccupancy - 1) / targetOccupancy
    var b = 16
    while (b < 30 && (1L << b) < buckets) b += 1
    b
  }

  /** Shared LSH pair pipeline. nBits sizing is the scale contract:
    * candidate pairs ≈ N²·(1+nBits)/2^(nBits+1), so 2^nBits must grow
    * with the corpus — nBits ≤ 0 (the default) derives the width from
    * the corpus count via [[lshBitsFor]] (one cheap column-pruned
    * count job); an explicit nBits pins it. Raising nBits trades
    * recall on LOW-cosine pairs (high-cosine pairs keep
    * near-identical signatures at any width); callers that must
    * verify on nonzero rows at small SF plant constant exact-duplicate
    * mutants (e07's pattern). */
  private def cosineNearDupsWith(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits0: Int, sigOfBits: (Column, Int) => Column): DataFrame = {
    val nBits = if (nBits0 > 0) nBits0 else lshBitsFor(corpus.count())
    val sigOf: Column => Column = sigOfBits(_, nBits)
    // Scale shape (the d06 bare-id lesson, applied to the vector side —
    // rewritten after the round-12 sf10 sweep caught the old form):
    // the bucket self-join ships (id, bucket) rows ONLY — the previous
    // form carried the vector payload through the 1+nBits probe
    // explosion (9× the corpus vector bytes through the shuffle) and
    // scored cosine per probe COLLISION with the interpreted
    // zip_with+aggregate fold, then max-aggregated the duplicate
    // scores away. Now: distinct candidate pairs first (bare ids),
    // vectors rejoin once per side, and the fused native cosine scores
    // each pair exactly once inside whole-stage codegen. Same pair
    // set, same cosine value (identical sequential double fold), so
    // results are bit-identical; the work drops from O(collisions)
    // interpreted folds to O(pairs) fused loops.
    val ids = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sig = ids.withColumn("s", once(sigOf(col("v")))).select(col("id"), col("s"))
    // left side: exact bucket; right side: exact + Hamming-1 probes
    val probes = (0 until nBits).map(b => lit(1 << b))
    val probed = sig.select(col("id"), explode(
      array((lit(0) +: probes).map(m => col("s").bitwiseXOR(m)): _*)).as("bucket"))
    val exact = sig.select(col("id"), col("s").as("bucket"))
    val cand = exact.as("x").join(probed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    cand
      .join(ids.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(ids.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .withColumn("cos", once(fastCosine(corpus.sparkSession)(col("va"), col("vb"))))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Exact embedding-cosine near-duplicate pairs: every (a, b), a < b,
    * with cosine ≥ threshold. All-pairs by construction (quadratic — the
    * oracle-checkable ground truth, same role as the exact n-gram
    * Jaccard); [[cosineNearDups]] is the sub-quadratic scale path. The
    * self-join is a blocked nested loop over broadcast batches; the
    * fused native cosine keeps the inner loop allocation-free. */
  def cosineNearDupsExact(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val x = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val y = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    x.join(y, col("a") < col("b"))
      .withColumn("cos", once(fastCosine(corpus.sparkSession)(col("va"), col("vb"))))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus with the
    * integer-exact k-means ([[graft.ann.KMeans.lloydAssignments]]), then
    * WITHIN each cluster drop every vector that has a lower-id neighbor
    * at cosine ≥ `threshold` (greedy id-ordered keep — deterministic,
    * order-free). Returns every row as (idCol, cluster, kept).
    *
    * Scale design (100 TB): the pair space is bounded by the clustering —
    * pairs form per-cluster after one hash shuffle on the cluster id, so
    * the cost is Σ|cluster|², never n². The operating recipe (per the
    * SemDeDup setup) is k ∝ corpus size, holding |cluster| ≈ constant;
    * the k-means step itself is map-only assignment + a k·d-cell partial
    * aggregate per round. A skewed giant cluster is the [[cosineNearDups]]
    * LSH problem — chain the two (cluster first, LSH inside oversized
    * clusters) when cluster caps are needed. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 4, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val assigned = graft.ann.KMeans.lloydAssignments(corpus, idCol, vecCol, k, iters)
      .select(col(idCol).as("__id"), col("cluster"))
    val withC = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .join(assigned, "__id")
    val x = withC.select(col("cluster").as("cl"), col("__id").as("a"), col("__v").as("va"))
    val y = withC.select(col("cluster").as("cl2"), col("__id").as("b"), col("__v").as("vb"))
    val dup = x.join(y, col("cl") === col("cl2") && col("b") < col("a"))
      .filter(fastCosine(spark)(col("va"), col("vb")) >= threshold)
      .select(col("a").as("__id")).distinct()
    withC.join(dup.withColumn("__dup", lit(true)), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        col("__dup").isNull.as("kept"))
  }

  /** IVF (inverted-file) ANN index: a coarse k-means quantizer
    * partitions the corpus into `nLists` cells; a query scores only the
    * `nProbe` cells whose centroids are nearest. The complement to the
    * hyperplane-LSH path: recall is tuned by nProbe instead of bit
    * width, and cell sizes adapt to the data distribution.
    *
    * Training runs Lloyd's iterations on a deterministic sample
    * COLLECTED TO THE DRIVER — at corpus scale the quantizer is always
    * trained on a bounded sample (FAISS-style); only assignment (one
    * map-side argmin pass) and the per-cell probe join are distributed.
    * Deterministic: sample by id order, centroids seeded from evenly
    * spaced sample points, fixed iteration count — same index every
    * run. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, sampleCap: Int = 4096, iters: Int = 8): Array[Array[Float]] =
    lloyd(collectSample(corpus, idCol, vecCol, sampleCap, "ivf"), nLists, iters)

  /** Deterministic bounded training sample: id-ordered, nulls excluded
    * (assignment-time filtering stays in the distributed operators);
    * element reads are width-agnostic so float[] and double[] corpora
    * both train, matching the rest of the vector API. */
  private def collectSample(corpus: DataFrame, idCol: String, vecCol: String,
      sampleCap: Int, who: String): Array[Array[Float]] = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .limit(sampleCap).collect()
      .map(_.getSeq[Number](1).map(_.floatValue).toArray)
    require(sample.nonEmpty, s"$who: empty corpus")
    sample
  }

  /** Deterministic Lloyd's: evenly spaced seeds over the (id-ordered)
    * sample, fixed iteration count, empty cells keep their centroid —
    * the same index every run. */
  private def lloyd(sample: Array[Array[Float]], nLists: Int,
      iters: Int): Array[Array[Float]] = {
    val k = math.min(nLists, sample.length)
    val dims = sample.head.length
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < dims) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else Array.tabulate(dims)(d => (sums(c)(d) / counts(c)).toFloat)
      }
    }
    centroids
  }

  private def nearestCentroid(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      var d2 = 0.0
      var d = 0
      val n = math.min(v.length, cv.length)
      while (d < n) { val diff = v(d) - cv(d); d2 += diff * diff; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Approximate top-k via the IVF index: corpus vectors are assigned to
    * their nearest cell (one map-side pass, shuffle on cell id only);
    * each query joins against its `nProbe` nearest cells. At 100 TB the
    * assignment is computed once and persisted as a bucketed/partitioned
    * layout, and every query touches ~nProbe/nLists of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.VectorExpressions.registerAll(spark)
    val cs = ivfCentroids(corpus, idCol, vecCol, nLists)
    // The centroid table enters the plan as array<float> LITERALS and the
    // corpus-side assignment runs entirely inside whole-stage codegen:
    // nLists fused float_l2sq loops + array_min/array_position argmin
    // (first minimum = lowest cell, the same tie rule as a scalar
    // strict-< scan). The ScalaUDF closures over a broadcast this
    // replaces were the ANN family's last interpreted per-row hop.
    // float_l2sq keeps the UDF's float subtract/multiply arithmetic, so
    // every assignment — including near-ties — is bit-identical. One
    // DELIBERATE behavior change vs the retired UDF: a corpus vector
    // whose dimension differs from the centroids' gets float_l2sq =
    // NULL and is DROPPED below (isNotNull), where the UDF assigned it
    // via min-truncated distances. Dropping is the more correct
    // semantics (a malformed vector has no meaningful nearest cell and
    // would otherwise pollute its bucket's candidates); verified
    // corpora are fixed-dims so no verified output moves.
    def d2(v: Column, c: Int): Column =
      call_function("float_l2sq", v, typedlit(cs(c).toSeq))
    val cellOf: Column => Column = { v =>
      val ds = array(cs.indices.map(c => d2(v, c)): _*)
      (array_position(ds, array_min(ds)) - 1L).cast("int")
    }
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", once(cellOf(col("cv"))))
      .filter(col("cell").isNotNull)
    // Probe list = nProbe nearest centroids: sort_array over (d2, cell)
    // structs ≡ the scalar sortBy(_._2) (stable, ties → lower cell).
    // sort_array is not codegen'd, but it runs once per QUERY row — the
    // broadcast-small side — never over the corpus.
    val probesOf: Column => Column = { v =>
      val pd = array(cs.indices.map(c =>
        struct(d2(v, c).as("d2"), lit(c).as("cell"))): _*)
      slice(sort_array(pd), 1, nProbe)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("p", explode(probesOf(col("qv"))))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", fastCosine(spark)(col("qv"), col("cv")))
    // no distinct needed: each corpus vector lives in exactly one cell and
    // a query's nProbe probe cells are distinct, so every (query, neighbor)
    // candidate appears at most once — the ranking window is the only shuffle
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.select("query_id", "neighbor_id", "cos")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ---- product quantization (the compression half of IVF-PQ) -----------

  /** PQ codebooks: the dimension space split into `m` contiguous
    * subspaces, each learning `ksub` centroids by Lloyd's iterations on
    * the same deterministic bounded driver sample as [[ivfCentroids]]
    * (FAISS-style — a PQ codebook is ALWAYS trained on a sample; only
    * encoding and scoring are distributed). Returns [m][ksub][subDim]. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, ksub: Int = 8, sampleCap: Int = 4096,
      iters: Int = 8): Array[Array[Array[Float]]] =
    pqTrain(collectSample(corpus, idCol, vecCol, sampleCap, "pq"), m, ksub, iters)

  /** Per-subspace Lloyd's over a training sample → [m][ksub][subDim]. */
  private def pqTrain(sample: Array[Array[Float]], m: Int, ksub: Int,
      iters: Int): Array[Array[Array[Float]]] = {
    val dims = sample.head.length
    require(dims % m == 0, s"pq: $dims dims not divisible into $m subspaces")
    val subDim = dims / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      lloyd(sub, ksub, iters)
    }
  }

  /** Approximate L2 top-k via PQ asymmetric-distance (ADC) scoring.
    * The corpus is ENCODED once map-side — m small codes per vector
    * instead of `dims` floats, the ~32× memory collapse that lets a
    * 100 TB corpus's index fit a serving tier — and each query
    * precomputes its m×ksub distance table so scoring a candidate is m
    * table lookups, not a dims-length loop. Broadcast shape mirrors
    * [[bruteForceTopK]]: queries (with their tables) broadcast, the
    * corpus never shuffles; the ranking window is the only shuffle.
    * Ranked by approximate distance ASCENDING (L2, not cosine).
    * Verified in PipelineSpec: recall against exact-L2 brute force and
    * the self-distance ≡ quantization-error invariant. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, ksub: Int = 8): DataFrame = {
    val books = pqCodebooks(corpus, idCol, vecCol, m, ksub)
    // Native kernel expressions over the FLATTENED trained codebook (a
    // few KB serialized with the plan — replaces both the ScalaUDF
    // closures and the explicit sparkContext.broadcast they captured);
    // arithmetic is encodeCodes/distTable's, bit-for-bit (PqKernelSpec).
    // Kernel strides come from the TRAINED shape, not the requested
    // ksub: lloyd caps centroids at the sample size, so a corpus
    // smaller than ksub trains fewer codes per subspace — the closures
    // iterated cs.length and handled that; a declared-ksub stride would
    // index past the flattened array.
    // clear failure over an opaque IndexOutOfBounds: an empty corpus (or
    // a degenerate sample that trained zero-length sub-books) must not
    // silently derive a wrong kernel stride
    require(books.nonEmpty && books(0).nonEmpty && books(0)(0).nonEmpty,
      "pq: empty corpus/codebook — cannot derive kernel strides")
    val subDim = books(0)(0).length
    val ksubA = books(0).length
    val flat = books.flatten.flatten
    val encode = kernelCol(new AnnKernels.PqEncodeKernel(flat, null, m, ksubA, subDim)) _
    val table = kernelCol(new AnnKernels.PqTableKernel(flat, null, m, ksubA, subDim)) _
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("codes", once(encode(col("cv"))))
      .filter(col("codes").isNotNull)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("tab", once(table(col("qv"))))
      .filter(col("tab").isNotNull)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcCol(col("tab"), col("codes"), longMode = false))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    scored.select("query_id", "neighbor_id", "adist")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Column wrappers for the ANN kernel expressions (see
    * [[graft.functions.AnnKernelExpr]] — native, codegen-participating,
    * zero per-row boxing; these retired the PQ/IVF-PQ/SQ8 family's
    * per-row ScalaUDF closures).
    *
    * [[floatVec]] keeps the vector API's width contract: the retired
    * Seq[Float] ScalaUDFs coerced array<double> corpora via an
    * analyzer-inserted cast, so the wrappers cast to array<float>
    * explicitly (the kernels are float-strict by design — a silent
    * wrong-width read would produce garbage). For float inputs
    * SimplifyCasts elides the no-op, leaving plans — and therefore the
    * verified byte-identity — unchanged. */
  private def floatVec(v: Column): Column =
    v.cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = true))
  private def kernelCol(k: graft.functions.AnnKernel)(v: Column): Column =
    org.apache.spark.sql.graft.GraftSql.column(graft.functions.AnnKernelExpr(
      org.apache.spark.sql.graft.GraftSql.expression(floatVec(v)), k))
  private def kernelCol2(k: graft.functions.AnnKernel2)(v: Column, cell: Column): Column =
    org.apache.spark.sql.graft.GraftSql.column(graft.functions.AnnKernelExpr2(
      org.apache.spark.sql.graft.GraftSql.expression(floatVec(v)),
      org.apache.spark.sql.graft.GraftSql.expression(cell), k))
  private def adcCol(tab: Column, codes: Column, longMode: Boolean): Column =
    org.apache.spark.sql.graft.GraftSql.column(graft.functions.AdcSum(
      org.apache.spark.sql.graft.GraftSql.expression(tab),
      org.apache.spark.sql.graft.GraftSql.expression(codes), longMode))

  /** Exact-L2 re-rank of a (query_id, neighbor_id) candidate pool:
    * vectors are re-fetched for the pool alone (at scale: point lookups
    * against the id-bucketed corpus), queries broadcast. */
  private def exactReRank(pool: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.registerAll(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("l2"), col("neighbor_id"))
    pool.join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("l2", call_function("l2_distance", col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "l2")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** PQ with exact re-ranking — the standard serving pattern: ADC
    * ranks `candidates` per query from codes alone (cheap table
    * lookups over the whole corpus), then ONLY those candidates are
    * scored with the true L2 distance and re-ranked. At 100 TB the
    * exact pass touches `candidates` vectors per query instead of the
    * corpus — the part ADC approximation quality stops mattering for,
    * since it only has to get the true neighbors into the candidate
    * pool (recall@pool ≫ recall@k; measured in PipelineSpec). */
  def pqTopKRefined(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 16, ksub: Int = 32,
      candidates: Int = 50): DataFrame =
    exactReRank(
      pqTopK(corpus, queries, idCol, vecCol, candidates, m, ksub)
        .select(col("query_id"), col("neighbor_id")),
      queries, corpus, idCol, vecCol, k)

  /** The full FAISS-style IVF-PQ index: a coarse quantizer routes each
    * vector to a cell, and the RESIDUAL (vector − cell centroid) is
    * product-quantized — residuals are centered near zero, so the same
    * codebook bits buy far more precision than on raw vectors. Queries
    * probe their `nProbe` nearest cells, scoring each cell's members by
    * ADC against a per-cell residual table; the exact re-rank touches
    * only `candidates` vectors per query.
    *
    * Scale shape: both trainings run on one bounded driver sample;
    * assignment + residual encoding are one map-side pass (the corpus
    * stores cell + m codes — at 100 TB that IS the index); the probe
    * join shuffles queries to cells, never the corpus; ranking windows
    * carry only (ids, distance). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      m: Int = 16, ksub: Int = 32, candidates: Int = 50): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.VectorExpressions.registerAll(spark)
    val sample = collectSample(corpus, idCol, vecCol, 4096, "ivfpq")
    val cents = lloyd(sample, nLists, 8)
    val books = pqTrain(sample.map { v =>
      val c = cents(nearestCentroid(v, cents))
      Array.tabulate(v.length)(d => v(d) - c(d))
    }, m, ksub, 8)
    // Native kernels over the flattened trained state (PqKernelSpec pins
    // them bit-identical to the retired closures). The closures' struct
    // values are DECOMPOSED: cell and codes are two expressions on the
    // corpus row; the query side explodes its probe list first and
    // builds one cell's residual table per exploded row — same rows,
    // same tables, no struct-returning closure.
    // Trained-shape strides, not the requested nLists/ksub: lloyd caps
    // both at the sample size (see pqTopK's note) — a declared-size
    // stride would read past the flattened arrays on tiny corpora.
    val dims = cents(0).length
    val subDim = books(0)(0).length
    val nListsA = cents.length
    val ksubA = books(0).length
    val centsFlat = cents.flatten
    val booksFlat = books.flatten.flatten
    val cellOf = kernelCol(new AnnKernels.IvfCellKernel(centsFlat, null, nListsA, dims)) _
    val codesOf = kernelCol2(new AnnKernels.IvfPqCodesKernel(
      centsFlat, null, booksFlat, null, m, ksubA, subDim, dims)) _
    val probeOf = kernelCol(new AnnKernels.IvfProbeKernel(centsFlat, nListsA, dims, nProbe)) _
    val tableOf = kernelCol2(new AnnKernels.IvfPqTableKernel(
      centsFlat, null, booksFlat, null, m, ksubA, subDim, dims)) _
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", once(cellOf(col("cv"))))
      .withColumn("codes", once(codesOf(col("cv"), col("cell"))))
      .filter(col("codes").isNotNull)
      .select("neighbor_id", "cell", "codes")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(probeOf(col("qv"))))
      .withColumn("tab", once(tableOf(col("qv"), col("cell"))))
      .filter(col("tab").isNotNull)
      .select("query_id", "cell", "tab")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcCol(col("tab"), col("codes"), longMode = false))
    // candidate pool by ADC — the ranking shuffle carries only
    // (ids, adist); the exact re-rank re-fetches vectors for the pool alone
    val wa = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    val pool = scored.select(col("query_id"), col("neighbor_id"), col("adist"))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= candidates)
      .select("query_id", "neighbor_id")
    exactReRank(pool, queries, corpus, idCol, vecCol, k)
  }

  /** Deterministic data-independent PQ sub-centroid element for the
    * oracle-checkable twin: subspace s, code c, LOCAL dim d → integer in
    * [-512, 512). Seed-free and stable, like [[planeWeight]]; the DuckDB
    * twin embeds the same integers as SQL literals. */
  private[graft] def pqFixedCentroid(s: Int, c: Int, d: Int): Long =
    ((mix64((s.toLong * 131L + c) * 8209L + d * 37L) >>> 16) % 1024L) - 512L

  /** Integer-exact PQ ADC pipeline over the FIXED codebook: elements
    * quantize as floor(v·1024) (exact — ×1024 is a power of two), every
    * distance is BIGINT arithmetic, ties break on the lowest code /
    * neighbor id — so ANY engine reproduces encode, tables, ADC sums and
    * ranking bit-for-bit. [[pqTopK]] keeps the trained-float production
    * codebook; this twin exists so the whole PQ machinery is
    * hash-checkable against the DuckDB oracle (same role as
    * [[lshTopKQuantized]] for LSH). */
  def pqTopKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, ksub: Int = 8, dims: Int = 64): DataFrame = {
    require(dims % m == 0, s"pq: $dims dims not divisible into $m subspaces")
    val subDim = dims / m
    // Native kernels in LONG mode over the fixed integer codebook —
    // bit-for-bit the retired closures' floor(v·1024) arithmetic
    // (PqKernelSpec), and the oracle twin's SQL rebuild is unchanged.
    val booksFlat: Array[Long] =
      Array.tabulate(m * ksub * subDim)(i =>
        pqFixedCentroid(i / (ksub * subDim), (i / subDim) % ksub, i % subDim))
    val encode = kernelCol(new AnnKernels.PqEncodeKernel(null, booksFlat, m, ksub, subDim)) _
    val table = kernelCol(new AnnKernels.PqTableKernel(null, booksFlat, m, ksub, subDim)) _
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("codes", once(encode(col("cv"))))
      .filter(col("codes").isNotNull)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("tab", once(table(col("qv"))))
      .filter(col("tab").isNotNull)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcCol(col("tab"), col("codes"), longMode = true))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    scored.select("query_id", "neighbor_id", "adist")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic data-independent coarse-quantizer centroid element for
    * the IVF-PQ oracle twin: cell c, dim d → integer in [-512, 512).
    * Seed-free and stable (same contract as [[pqFixedCentroid]]); the
    * DuckDB twin embeds the same integers as SQL literals. */
  private[graft] def ivfFixedCentroid(c: Int, d: Int): Long =
    ((mix64((c.toLong * 257L + d) * 9241L) >>> 16) % 1024L) - 512L

  /** Deterministic RESIDUAL-codebook element (distinct hash stream from
    * [[pqFixedCentroid]]): subspace s, code c, LOCAL dim d → [-512, 512). */
  private[graft] def ivfPqResidualCentroid(s: Int, c: Int, d: Int): Long =
    ((mix64((s.toLong * 149L + c) * 12289L + d * 53L) >>> 16) % 1024L) - 512L

  /** Integer-exact IVF-PQ twin over FIXED coarse centroids + FIXED
    * residual codebooks — the composed-index counterpart of
    * [[pqTopKQuantized]] (e12b) and the hash-checkable oracle for
    * [[ivfPqTopK]]'s machinery: floor(v·1024) quantization, BIGINT
    * coarse assignment (ties → lowest cell), BIGINT residual encode
    * (ties → lowest code), full-probe per-cell ADC tables, candidate
    * pool by (adist, id), then an integer-exact L2 re-rank of the pool —
    * every stage reproducible bit-for-bit by any engine. Full probe is
    * deliberate: it exercises the per-cell residual geometry (each
    * query's table differs per cell) while keeping the oracle free of
    * probe-selection ties. Scale shape is [[ivfPqTopK]]'s: encode is
    * map-only, the probe join broadcasts query tables, ranking shuffles
    * carry (ids, distance) only. */
  def ivfPqTopKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 8, m: Int = 4, ksub: Int = 8,
      dims: Int = 64, candidates: Int = 25): DataFrame = {
    require(dims % m == 0, s"ivfpq: $dims dims not divisible into $m subspaces")
    val subDim = dims / m
    // Native kernels in LONG mode over the fixed integer centroids and
    // residual codebooks — bit-for-bit the retired closures' arithmetic
    // (PqKernelSpec); the oracle twin's SQL rebuild is unchanged. The
    // closures' struct values are decomposed exactly like [[ivfPqTopK]]:
    // cell + codes as two corpus-side expressions, and the full probe as
    // explode(0..nLists-1) with one per-cell residual table each.
    val centsFlat: Array[Long] =
      Array.tabulate(nLists * dims)(i => ivfFixedCentroid(i / dims, i % dims))
    val booksFlat: Array[Long] =
      Array.tabulate(m * ksub * subDim)(i =>
        ivfPqResidualCentroid(i / (ksub * subDim), (i / subDim) % ksub, i % subDim))
    val cellOf = kernelCol(new AnnKernels.IvfCellKernel(null, centsFlat, nLists, dims)) _
    val codesOf = kernelCol2(new AnnKernels.IvfPqCodesKernel(
      null, centsFlat, null, booksFlat, m, ksub, subDim, dims)) _
    val tableOf = kernelCol2(new AnnKernels.IvfPqTableKernel(
      null, centsFlat, null, booksFlat, m, ksub, subDim, dims)) _
    val quantOf = kernelCol(new AnnKernels.QuantizeKernel(1024.0, Long.MinValue, Long.MaxValue, dims)) _
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", once(cellOf(col("cv"))))
      .withColumn("codes", once(codesOf(col("cv"), col("cell"))))
      .filter(col("codes").isNotNull)
      .select("neighbor_id", "cell", "codes")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(sequence(lit(0), lit(nLists - 1))))
      .withColumn("tab", once(tableOf(col("qv"), col("cell"))))
      .filter(col("tab").isNotNull)
      .select("query_id", "cell", "tab")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcCol(col("tab"), col("codes"), longMode = true))
    val wa = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    val pool = scored.select(col("query_id"), col("neighbor_id"), col("adist"))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= candidates)
      .select("query_id", "neighbor_id")
    // integer-exact re-rank of the pool in the quantized domain: the
    // pool is (queries × candidates)-bounded, so it BROADCASTS onto the
    // corpus vectors — the corpus never shuffles for the re-fetch.
    // long_l2sq is the fused codegen distance; both sides carry exactly
    // `dims` elements (same QuantizeKernel), so its equal-length
    // contract always holds here.
    graft.functions.VectorExpressions.registerAll(corpus.sparkSession)
    val cq = corpus.select(col(idCol).as("neighbor_id"), quantOf(col(vecCol)).as("cqv"))
    val qq = queries.select(col(idCol).as("query_id"), quantOf(col(vecCol)).as("qqv"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    cq.join(broadcast(pool), Seq("neighbor_id")).join(broadcast(qq), Seq("query_id"))
      .withColumn("d2", call_function("long_l2sq", col("qqv"), col("cqv")))
      .select("query_id", "neighbor_id", "d2")
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
  }

  /** Scalar-quantized (SQ8) top-k: every element maps to an int8 code
    * with the FIXED scale floor(v·256) clamped to [-128, 127] — a 4×
    * memory cut with near-exact recall when embeddings live in ±0.5
    * (normalized-vector territory), and the simplest of the
    * quantized-index family (vs PQ's codebooks). Distances are integer
    * L2 in the code domain — every step is exact integer arithmetic on
    * a DATA-INDEPENDENT scale, so unlike trained-codebook PQ the whole
    * operator hash-checks against the DuckDB oracle directly (e14).
    * Broadcast shape as [[bruteForceTopK]]; ranked by quantized L2
    * ascending. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // Native kernels: QuantizeKernel is the retired `enc` closure
    // (clamped floor(v·256), every element — dims = 0: sq8 has no
    // trained dimensionality to enforce) and LongL2SqMin the retired
    // `d2` (shorter-length truncation, NOT long_l2sq's NULL-on-mismatch
    // — a NULL would rank first in the ascending window). Both
    // bit-identical by PqKernelSpec.
    val enc = kernelCol(new AnnKernels.QuantizeKernel(256.0, -128L, 127L, 0)) _
    def d2(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.GraftSql.column(graft.functions.LongL2SqMin(
        org.apache.spark.sql.graft.GraftSql.expression(a),
        org.apache.spark.sql.graft.GraftSql.expression(b)))
    val c = corpus.select(col(idCol).as("neighbor_id"), once(enc(col(vecCol))).as("c8"))
      .filter(col("c8").isNotNull)
    val q = queries.select(col(idCol).as("query_id"), once(enc(col(vecCol))).as("q8"))
      .filter(col("q8").isNotNull)
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", d2(col("q8"), col("c8")))
      .select("query_id", "neighbor_id", "d2")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: probe the query's bucket and all Hamming-1
    * buckets (multi-probe for recall). Returns the same shape as
    * [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 12, dims: Int = 64): DataFrame =
    bucketTopK(corpus, queries, idCol, vecCol, k, nBits,
      lshSignature(_, nBits, dims))

  /** Integer-quantized hyperplane signature: element d contributes
    * `floor(v(d) * 1024)` — an exact integer — times the deterministic
    * ±1 plane weight; the bit is the sign of the integer sum. Every step
    * is integer arithmetic, so ANY engine reproduces the signature
    * bit-exactly (the float variant's near-zero dot products could flip
    * a sign under a different summation order). [[lshSignature]] remains
    * the production scorer; this variant exists so the whole LSH
    * pipeline — signature, banding, Hamming-1 multiprobe, cosine top-k —
    * is hash-checkable against the DuckDB oracle, which embeds the same
    * plane weights as SQL literals. */
  def lshSignatureQuantized(vec: Column, nBits: Int = 8, dims: Int = 64): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.HyperplaneSig(
        org.apache.spark.sql.graft.GraftSql.expression(floatVec(vec)),
        nBits, dims, quantized = true))

  /** [[lshTopK]] with the integer-quantized signature — the
    * oracle-checkable LSH path. */
  def lshTopKQuantized(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 8, dims: Int = 64): DataFrame =
    bucketTopK(corpus, queries, idCol, vecCol, k, nBits,
      lshSignatureQuantized(_, nBits, dims))

  /** Shared bucket-probe top-k: corpus hashed once map-side, queries
    * probe their bucket plus all Hamming-1 neighbors, candidates scored
    * by exact cosine, ranked per query. */
  private def bucketTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int,
      sigOf: Column => Column): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", once(sigOf(col("cv"))))
    val probes = (0 until nBits).map(b => lit(1 << b))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qsig", sigOf(col("qv")))
      .withColumn("bucket", explode(array((lit(0) +: probes).map(m => expr("qsig").bitwiseXOR(m)): _*)))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", fastCosine(corpus.sparkSession)(col("qv"), col("cv")))
    // no distinct needed: a corpus vector's bucket is its signature (exactly
    // one), and a query's 1 + nBits probe buckets are distinct XORs of qsig,
    // so every (query, neighbor) candidate appears at most once — dropping
    // the dedup saves a full shuffle+aggregate before the ranking window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.select("query_id", "neighbor_id", "cos")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
