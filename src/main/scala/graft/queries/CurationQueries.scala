package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextFunctions

/** Corpus-curation operators beyond the PipelineQueries inventory:
  * frequency-based boilerplate removal, corpus-relative perplexity
  * bucketing (the CCNet head/middle/tail split), and classifier
  * calibration — the quality-audit loop a 100 TB curation run closes
  * before committing to a filter threshold.
  *
  * Every query here is hash-checked: the arithmetic stays in exactly-
  * defined IEEE ops or DECIMAL-cast sums (the d21 rule), so the DuckDB
  * twins recompute bit-identical values.
  */
object CurationQueries {

  /** d18's paragraph construction (10-token windows — the synthetic
    * corpus has no newlines), keyed by md5 so every downstream shuffle
    * compares fixed 32-char keys instead of kilobyte texts. */
  private def paragraphs(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, CAST(ceil(size(toks) / 10.0) AS INT) - 1), " +
          "i -> array_join(slice(toks, i * 10 + 1, 10), ' '))")).as(Seq("idx", "para")))
      .withColumn("pkey", md5(col("para")))

  /** d47's per-document unigram-LM scores (`nk` = -avg_logprob, so
    * ascending nk is best-first). Exposed for RankTwinSpec's cut-row
    * oracle. */
  private[graft] def pplScores(s: SparkSession, d: String): DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val n = tk.agg(count(lit(1)).as("n_tokens"))
    val tf = tk.groupBy("term").agg(count(lit(1)).as("tf"))
    tk.join(broadcast(tf), "term").crossJoin(broadcast(n))
      .withColumn("lp", log(col("tf") * lit(1.0) / col("n_tokens")).cast(DecimalType(18, 6)))
      .groupBy("doc_id")
      .agg(sum(col("lp")).as("slp"), count(lit(1)).as("n_toks"))
      // INTEGER-EXACT half-up round of slp/n_toks (d26's pattern): slp
      // is DECIMAL(18,6) so slp·10⁶ is an exact long, and ties cannot
      // exist in integer space. The sf10 sweep caught doc 197
      // (slp = −212.8646, n = 52 → EXACTLY −4.09355) where Spark's
      // shortest-decimal HALF_UP and DuckDB's binary round-of-double
      // disagree on the 4dp tie. + 0.0 canonicalizes −0.0.
      .select(col("doc_id"),
        ((expr("CASE WHEN slp >= 0 THEN 1 ELSE -1 END") *
          floor((abs(col("slp") * lit(1000000)).cast(LongType) +
            lit(50L) * col("n_toks")) / (lit(100L) * col("n_toks")))
          ).cast(DoubleType) / lit(10000.0) + lit(0.0)).as("avg_logprob"))
      .withColumn("nk", -col("avg_logprob")) // ascending nk = best-first
  }

  /** Shared body of d49 and its d49s sliced twin (the dXXs one-body
    * no-drift guarantee, see PipelineQueries). */
  private def d49Body(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val maxDf = 100
    val thresholds = Seq(0.3, 0.5, 0.7).toDF("threshold")
    val bg = docs
      .withColumn("ws", split(col("text"), "\\s+"))
      .select(col("doc_id"), when(size(col("ws")) < 2,
          array(array_join(col("ws"), " ")))
        .otherwise(array_distinct(expr(
          "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")))
        .as("bgs"))
    val sizes = bg.select(col("doc_id"), size(col("bgs")).as("n"))
    // cut: the exploded bigram stream backs the df counts AND the kept
    // join; kept backs both self-join sides; the thresholded pairs back
    // the pair counts and both doc-set projections
    val e = graft.operators.Lineage.cut(
      bg.select(col("doc_id"), explode(col("bgs")).as("s")))
    val dfc = e.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val nPruned = dfc.filter(col("df") > maxDf)
      .agg(count(lit(1)).as("n_pruned_keys"))
    val kept = graft.operators.Lineage.cut(e.join(
      dfc.filter(col("df") <= maxDf && col("df") > 1).select(col("s")), "s"))
    val co = kept.as("x").join(kept.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    val jacc = co
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("j", col("common") * lit(1.0) / (col("na") + col("nb") - col("common")))
    val pairs = graft.operators.Lineage.cut(jacc.crossJoin(thresholds)
      .filter(col("j") >= col("threshold")))
    val nPairs = pairs.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val nDocs = pairs.select(col("threshold"), col("a").as("doc"))
      .union(pairs.select(col("threshold"), col("b")))
      .groupBy(col("threshold")).agg(countDistinct(col("doc")).as("n_docs"))
    thresholds
      .join(nPairs, Seq("threshold"), "left").join(nDocs, Seq("threshold"), "left")
      .crossJoin(broadcast(nPruned))
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("n_pruned_keys"))
      .orderBy(col("threshold"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CCNet/RefinedWeb-style boilerplate removal: a paragraph occurring
    // in >= 3 DISTINCT documents is boilerplate (nav bars, license
    // headers, cookie banners) and is dropped from every document —
    // unlike d18's dedup, which keeps the first occurrence. Scale shape:
    // the frequency count shuffles (pkey, doc_id) pairs only — never
    // text; the boilerplate key set is tiny by construction (only keys
    // crossing the threshold) and BROADCASTS into a map-side anti join,
    // so the paragraph table is never shuffled for the prune itself.
    "d46_boilerplate_prune" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val paras = paragraphs(docs)
      val boiler = paras.groupBy(col("pkey"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 3).select(col("pkey"))
      val kept = paras.join(broadcast(boiler), Seq("pkey"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          expr("array_join(transform(array_sort(collect_list(struct(idx, para))), x -> x.para), ' | ')")
            .as("clean_text"))
      docs.select(col("doc_id"),
          ceil(size(split(col("text"), "\\s+")) / 10.0).cast(LongType).as("n_paras"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_paras"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // CCNet head/middle/tail perplexity bucketing: rank documents by the
    // corpus's own unigram LM score (d21's exactly-associative decimal
    // sum) and split into terciles. Tercile assignment comes from
    // GlobalRank ordinals (range-partitioned parallel sort + P-bounded
    // offsets; the size pass reuses the range shuffle) — there is no
    // orderBy().limit(n/3) funnel and no separate count() job, both r6
    // scale findings. Bucketing is then map-side rank arithmetic. The
    // old cut-row form survives as the RankTwinSpec test oracle.
    "d47_ppl_buckets" -> ((s, d) => {
      val (ranked, n) = graft.operators.GlobalRank
        .withGlobalIndexAndCount(pplScores(s, d), "__idx", col("nk"), col("doc_id"))
      val k1 = math.ceil(n / 3.0).toLong
      val k2 = math.ceil(n * 2 / 3.0).toLong
      ranked.select(col("doc_id"), col("avg_logprob"),
          when(col("__idx") < k1, "head")
            .when(col("__idx") < k2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // dedup threshold sweep: exact bigram-Jaccard pair / touched-doc
    // counts at 0.3 / 0.5 / 0.7 — the sensitivity table that picks a
    // near-dup threshold before committing a 100 TB dedup pass. The
    // heavy inverted-index self-join runs ONCE and inherits d08's df-cap:
    // shingles hitting more than maxDf documents are non-discriminative
    // boilerplate whose posting lists explode the self-join
    // quadratically (one hot bigram in a million docs = 10^12 join
    // rows), so they are pruned BEFORE the join and the sweep reports
    // how many keys it dropped (`n_pruned_keys`) to stay honest about
    // the approximation. df = 1 keys cannot co-occur and are dropped for
    // free. The three thresholds fan out over the (tiny) co-occurrence
    // output. Same shingle semantics as d08/d09 (distinct bigrams;
    // single-token docs use the whole text), so the sweep is consistent
    // with the operators it tunes.
    "d49_dedup_sweep" -> ((s, d) => d49Body(s, Tables.documents(s, d))),

    // sliced oracle twin of d49 (the dXXs pattern; one shared body, one
    // derived oracle): the sweep's inverted-index self-join oracle OOMs
    // at sf10's 500k docs; the doc_id < 25000 slice is inside the
    // oracle-proven sf1 scale.
    "d49s_dedup_sweep_sliced" -> ((s, d) => d49Body(s,
      Tables.documents(s, d).filter(col("doc_id") < PipelineQueries.SliceBound))),

    // embedding drift between corpus halves (even vs odd vec_ids) per
    // label: the monitoring probe an embedding pipeline runs across
    // snapshots. Integer-exact the whole way (the e03b rule): vectors
    // quantize to floor(v·1024) longs, per-(label, half, dim) SUMS stay
    // integers (order-independent), and the cosine between the two sum
    // vectors is scale-invariant so counts and the 1024 cancel —
    // sqrt/divide touch doubles only at the final scalar. The sa·sb
    // product sums run in DECIMAL(38,0) (the q125 rule) mirrored by
    // HUGEINT casts in the oracle: BIGINT sums would silently wrap in
    // Spark past ~10^6 vectors per half while DuckDB promotes to
    // HUGEINT — ADVICE r6. One shuffle to the (label, half, dim) grid;
    // the 2×64-row-per-label join is trivially broadcast.
    "e23_embedding_drift" -> ((s, d) => {
      val q = Tables.embeddings(s, d)
        .select(col("label"), (col("vec_id") % 2).cast(IntegerType).as("half"),
          posexplode(col("embedding")))
        .withColumn("qv", floor(col("col").cast(DoubleType) * 1024).cast(LongType))
        .groupBy(col("label"), col("half"), col("pos"))
        .agg(sum(col("qv")).as("sv"))
      val counts = Tables.embeddings(s, d)
        .groupBy(col("label"), (col("vec_id") % 2).cast(IntegerType).as("half"))
        .agg(count(lit(1)).as("n"))
      val a = q.filter(col("half") === 0).select(col("label"), col("pos"), col("sv").as("sa"))
      val b = q.filter(col("half") === 1).select(col("label"), col("pos"), col("sv").as("sb"))
      val saD = col("sa").cast(DecimalType(38, 0))
      val sbD = col("sb").cast(DecimalType(38, 0))
      val dot = a.join(b, Seq("label", "pos"))
        .groupBy(col("label"))
        .agg(sum(saD * sbD).as("num"),
          sum(saD * saD).as("da"),
          sum(sbD * sbD).as("db"))
      dot
        .join(counts.filter(col("half") === 0).select(col("label"), col("n").as("n_a")), "label")
        .join(counts.filter(col("half") === 1).select(col("label"), col("n").as("n_b")), "label")
        .select(col("label"), col("n_a"), col("n_b"),
          // + 0.0 canonicalizes -0.0: half-mean cosines hover near zero
          // by construction, and DuckDB's round preserves the sign bit
          (round(col("num").cast(DoubleType) /
            (sqrt(col("da").cast(DoubleType)) * sqrt(col("db").cast(DoubleType))), 6) + lit(0.0))
            .as("cos_shift"))
        .orderBy(col("label"))
    }),

    // corpus snapshot diff — the CDC-for-corpora shape: two ingest
    // snapshots compared by content fingerprint in ONE doc_id-keyed full
    // outer join (co-partitioned; never a text comparison — md5 keys
    // only), rows classified added/removed/changed/unchanged and rolled
    // up per source. Snapshot B is a deterministic simulation over the
    // same table (every 7th doc edited, every 11th dropped, every 13th
    // spawning a new doc), reproduced identically in the oracle.
    "d50_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.select(col("doc_id"), col("source"), md5(col("text")).as("fp_a"))
      val bBase = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), col("source"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [edited]")))
            .otherwise(col("text"))).as("fp_b"))
      val bNew = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("source"),
          md5(concat(col("text"), lit(" [new]"))).as("fp_b"))
      val b = bBase.union(bNew)
      a.withColumnRenamed("source", "src_a")
        .join(b.withColumnRenamed("source", "src_b"), Seq("doc_id"), "full")
        .select(coalesce(col("src_a"), col("src_b")).as("source"),
          when(col("fp_b").isNull, "removed")
            .when(col("fp_a").isNull, "added")
            .when(col("fp_a") === col("fp_b"), "unchanged")
            .otherwise("changed").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("status"))
    }),

    // cluster-quality audit: label purity of the e19 k-means clusters —
    // the evaluation a pipeline runs before trusting cluster-granular
    // operations (SemDeDup pruning, cluster-balanced sampling). Builds
    // on the integer-exact Lloyd's machinery, so the WHOLE
    // cluster-then-evaluate pipeline hash-checks; the contingency table
    // is k×|labels| (tiny), all heavy work is e19's one-shuffle rounds.
    // simplified (centroid-based) silhouette per cluster — the
    // label-free companion to e24's purity: a = squared-L2 to the own
    // final centroid, b = min over the other centroids, s = (b−a)/max.
    // a/b are integer-exact off the e19 Lloyd's machinery (assignment
    // stays MAP-ONLY — the distance array adds k BIGINTs per row, no
    // join); the per-row ratio is one identical double expression
    // cast to DECIMAL(18,9) pre-sum (the d21 rule), so the per-cluster
    // means hash-check. Full silhouette would pair all points (n²);
    // the centroid form is the standard large-corpus proxy.
    "e35_silhouette" -> ((s, d) => {
      val ab = graft.ann.KMeans.lloydSilhouetteInputs(Tables.embeddings(s, d),
        "vec_id", "embedding", k = 4, iters = 3)
      ab.withColumn("sil",
          when(greatest(col("a"), col("b")) === 0, lit(0.0))
            .otherwise((col("b") - col("a")) * lit(1.0) / greatest(col("a"), col("b")))
            .cast(DecimalType(18, 9)))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("sil")).cast(DoubleType) / count(lit(1)), 6) + lit(0.0)).as("mean_sil"))
        .orderBy(col("cluster"))
    }),

    "e24_cluster_purity" -> ((s, d) => {
      val ct = graft.ann.KMeans.lloydAssignments(Tables.embeddings(s, d),
          "vec_id", "embedding", k = 4, iters = 3)
        .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(desc("cnt"), col("label"))
      val top = ct.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("cluster"), col("label").as("top_label"))
      ct.groupBy(col("cluster"))
        .agg(sum(col("cnt")).as("n"), max(col("cnt")).as("mx"))
        .join(top, "cluster")
        .select(col("cluster"), col("n"), col("top_label"),
          round(col("mx") * lit(1.0) / col("n"), 6).as("purity"))
        .orderBy(col("cluster"))
    }),

    // LSH probe-radius sweep — the ANN twin of d49's threshold sweep:
    // recall@5 and candidate cost at Hamming radius 0 vs 1, the table
    // that picks a multiprobe budget before a 100 TB ANN run. Fully
    // integer-exact signatures (e03b machinery) + exact cosine ranking,
    // so the ENTIRE sweep — signatures, probe buckets per radius,
    // candidate join, ranking, recall against brute-force truth —
    // hash-checks. Corpus hashed once map-side; the query×mask probe
    // table broadcasts.
    "e25_lsh_radius_sweep" -> ((s, d) => {
      import s.implicits._
      graft.functions.VectorExpressions.registerAll(s)
      val emb = Tables.embeddings(s, d)
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .withColumn("bucket", graft.ann.Ann.lshSignatureQuantized(col("cv")))
      val masks = (Seq((0, 0)) ++ (0 until 8).map(b => (1, 1 << b))).toDF("mradius", "m")
      val radii = Seq(0, 1).toDF("radius")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qsig", graft.ann.Ann.lshSignatureQuantized(col("qv")))
        .crossJoin(radii).join(masks, col("mradius") <= col("radius"))
        .withColumn("bucket", expr("qsig").bitwiseXOR(col("m")))
        .select("radius", "query_id", "qv", "bucket")
      // cut: the bucket-candidate scan backs the top-5 ranking AND the
      // per-radius candidate counts
      val cand = graft.operators.Lineage.cut(c.join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", expr("cosine_sim(qv, cv)")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("radius"), col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val top = cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("radius", "query_id", "neighbor_id")
      val truth = graft.ann.Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      // query-set size enters the plan as a broadcast 1-row aggregate
      // (the d11 precedent) — no driver-side count() job
      val nq = emb.filter(col("vec_id") < 5)
        .agg(count(lit(1)).cast(DoubleType).as("nq"))
      val hits = top.join(truth, Seq("query_id", "neighbor_id"))
        .groupBy(col("radius")).agg(count(lit(1)).as("hits"))
      cand.groupBy(col("radius")).agg(count(lit(1)).as("n_cand"))
        .join(hits, Seq("radius"), "left")
        .crossJoin(broadcast(nq))
        .select(col("radius"), col("n_cand"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)) * lit(1.0) / (lit(5) * col("nq")), 4)
            .as("recall_at_5"))
        .orderBy(col("radius"))
    }),

    // Flesch-Kincaid readability — the standard quality feature the
    // engine's scorer family (d02/d23/d45) still lacked. Sentences =
    // [.!?]+ runs (min 1), syllables = [aeiouy]+ vowel groups — both
    // pure regex counts in the java.util.regex ∩ RE2 shared dialect, so
    // the oracle recomputes the identical counts. Map-only, no shuffle
    // before the final ORDER BY.
    "d51_readability" -> ((s, d) => {
      val words = size(split(trim(col("text")), "\\s+")).cast(DoubleType)
      val sentences = greatest(
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1)).cast(DoubleType)
      val syllables = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .cast(DoubleType)
      Tables.documents(s, d).select(
        col("doc_id"),
        words.cast(LongType).as("n_words"),
        sentences.cast(LongType).as("n_sentences"),
        syllables.cast(LongType).as("n_syllables"),
        // + 0.0 canonicalizes -0.0 per the round-6 audit rule (grades
        // can straddle zero for terse low-syllable docs)
        (round(lit(0.39) * (words / sentences) + lit(11.8) * (syllables / words) - lit(15.59), 4)
          + lit(0.0)).as("fk_grade"))
        .orderBy(col("doc_id"))
    }),

    // top principal component of the embedding gram matrix — the
    // whitening/rotation primitive (PCA step) an ANN pipeline fits
    // before product quantization. Integer-exact end to end: quantized
    // gram cells are BIGINT sums (one d²-key shuffle, the e18 shape),
    // the gram is renormalized by a power-of-two integer division
    // (offset to keep the operand positive — Spark's `div` truncates
    // while DuckDB's `//` floors, and they only agree for non-negative
    // operands), and THREE unrolled power-iteration matvecs stay in
    // BIGINT (magnitudes bounded by construction: ≤64·2e3·1.6e10 ≈
    // 2e15). Doubles appear only in the final per-row normalization;
    // d=64, so every matvec table is broadcast-sized — the scale cost
    // is the one gram shuffle.
    "e26_top_eigvec" -> ((s, d) => {
      val qv = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
      // cut: the Gram-matrix aggregation backs x1 and both matvec rounds
      val cells = graft.operators.Lineage.cut(qv
        .select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
        .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
        .groupBy(col("i"), col("j")).agg(sum(col("qi") * col("qj")).as("g0"))
        .withColumn("g", expr("(g0 + 1099511627776) div 1048576 - 1048576"))
        .select("i", "j", "g"))
      val x1 = cells.groupBy(col("i").as("p")).agg(sum(col("g")).as("x")) // x0 = all ones
      def matvec(x: DataFrame) = cells
        .join(broadcast(x.withColumnRenamed("p", "j")), "j")
        .groupBy(col("i").as("p")).agg(sum(col("g") * col("x")).as("x"))
      val x3 = graft.operators.Lineage.cut(matvec(matvec(x1)))
      val norm = x3.agg(
        sum(col("x").cast(DecimalType(19, 0)) * col("x").cast(DecimalType(19, 0))).as("n2"))
        .select(sqrt(col("n2").cast(DoubleType)).as("norm"))
      x3.crossJoin(broadcast(norm))
        .select(col("p").as("pos"),
          (round(col("x").cast(DoubleType) / col("norm"), 4) + lit(0.0)).as("component"))
        .orderBy(col("pos"))
    }),

    // temporal n-gram novelty — the memorization/staleness proxy a
    // curation run scores ingest batches with: the fraction of a doc's
    // word-5-grams whose FIRST corpus occurrence (by (doc_id, idx)
    // order) is in that doc. One md5-keyed shuffle (fixed-width keys,
    // the d18 rule); novelty is a per-doc ratio of counts.
    "d52_ngram_novelty" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), "\\s+"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 4), i -> array_join(slice(toks, i, 5), ' '))"))
          .as(Seq("idx", "gram")))
        .withColumn("gkey", md5(col("gram")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("gkey")).orderBy(col("doc_id"), col("idx"))
      grams.withColumn("first", row_number().over(w) === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel") * lit(1.0) / col("n_grams"), 4).as("novelty"))
        .orderBy(col("doc_id"))
    }),

    // Johnson-Lindenstrauss ±1 random projection 64 → 16 dims — the
    // embedding-compression primitive upstream of cheap filtering (and
    // the third compression axis next to PQ codes and SQ8). Projection
    // planes come from the same deterministic ±1 source as the LSH
    // family (`Ann.planeWeight`), inputs quantize to floor(v·1024)
    // longs, so every projected coordinate is an exact integer — the
    // whole transform hash-checks. Planes broadcast; one (vec, k)
    // aggregate.
    "e27_jl_projection" -> ((s, d) => {
      import s.implicits._
      val planes = (for (k <- 0 until 16; dim <- 0 until 64)
        yield (k, dim, if (graft.ann.Ann.planeWeight(k, dim) > 0) 1L else -1L))
        .toDF("k", "dim", "w")
      Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id"), posexplode(expr(
          "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))"))
          .as(Seq("dim", "qd")))
        .join(broadcast(planes), "dim")
        .groupBy(col("vec_id"), col("k"))
        .agg(sum(col("w") * col("qd")).as("proj"))
        .orderBy(col("vec_id"), col("k"))
    }),

    // per-source length-distribution clipping — the relative cousin of
    // d45's absolute Gopher rules: drop documents outside their OWN
    // source's [p5, p95] token-length band (a source of tweets and a
    // source of books need different cutoffs). Percentiles are EXACT
    // but never sort documents: the corpus aggregates to the per-source
    // LENGTH HISTOGRAM first (one map-combined shuffle; keys =
    // (source, distinct length) — thousands of cells however many
    // documents exist), the per-source window then cumulates over that
    // tiny histogram, and the bound VALUE is the smallest length whose
    // cumulative count reaches ceil(p·n) — identical to the rank-row
    // definition the oracle uses (a row-sorting window here would be
    // one task per source over every document at 100 TB, the d12/q134
    // class). Bounds broadcast back onto the corpus.
    "d57_length_trim" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(expr("filter(split(text, '\\\\s+'), w -> w <> '')")).cast(LongType).as("n_toks"))
      val hist = t.groupBy(col("source"), col("n_toks")).agg(count(lit(1)).as("cnt"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_toks"))
      val cum = hist
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      val bounds = cum
        .withColumn("lo_rn", ceil(col("n") * 0.05))
        .withColumn("hi_rn", ceil(col("n") * 0.95))
        .groupBy(col("source"))
        .agg(min(when(col("cum") >= col("lo_rn"), col("n_toks"))).as("lo_val"),
          min(when(col("cum") >= col("hi_rn"), col("n_toks"))).as("hi_val"))
      t.join(broadcast(bounds), Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_toks") >= col("lo_val") && col("n_toks") <= col("hi_val"), 1L)
            .otherwise(0L)).as("n_kept"),
          min(col("lo_val")).as("lo_val"), min(col("hi_val")).as("hi_val"))
        .orderBy(col("source"))
    }),

    // classifier calibration (reliability diagram): bin d23's predicted
    // keep-probability into deciles and compare against the rule-based
    // quality label — the audit that decides whether a trained filter's
    // scores can be thresholded directly or need recalibration. Map-only
    // feature pass + one 10-row aggregate; mean-p sums DECIMAL-cast
    // probabilities (exact, associative).
    "d48_calibration" -> ((s, d) => {
      val z = TextFunctions.classifierLogit(col("text"))
      val p = round(TextFunctions.hardSigmoid(z), 6)
      Tables.documents(s, d)
        .select(
          least(floor(p * 10).cast(IntegerType), lit(9)).as("bin"),
          p.cast(DecimalType(18, 6)).as("p"),
          (TextFunctions.qualityScore(col("text")) >= 0.36).cast(IntegerType).as("label"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("p")).cast(DoubleType) / count(lit(1)), 6).as("mean_p"),
          round(sum(col("label")) * lit(1.0) / count(lit(1)), 6).as("frac_pos"))
        .orderBy(col("bin"))
    }),

    // quality-filter agreement matrix — before committing to ONE filter
    // at 100 TB, measure how the three house signals disagree: the d45
    // Gopher rule mask, the d02 heuristic score at the d14 threshold,
    // and the d23 linear classifier at p >= 0.5. The 8-cell contingency
    // (with corpus fractions) is the meta-audit that finds filters
    // which silently gate disjoint corpus slices. One map-side pass
    // computes all three verdicts; the only shuffle is the 8-row
    // aggregate; the total rides a 1-row broadcast.
    "d70_filter_agreement" -> ((s, d) => {
      val flags = Tables.documents(s, d)
        .withColumn("ws", split(trim(col("text")), "\\s+"))
        .withColumn("n_words", size(col("ws")))
        .withColumn("sum_len",
          expr("aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x)"))
        .withColumn("alpha_words",
          expr("size(filter(ws, w -> w rlike '[A-Za-z]'))"))
        .withColumn("symbol_words",
          expr("size(filter(ws, w -> w rlike '^[^A-Za-z0-9]+$'))"))
        .select(
          (col("n_words").between(50, 100000) &&
            (col("sum_len").cast(DoubleType) / col("n_words")).between(3.0, 10.0) &&
            col("symbol_words").cast(DoubleType) / col("n_words") < 0.1 &&
            col("alpha_words").cast(DoubleType) / col("n_words") > 0.8).as("gopher"),
          (TextFunctions.qualityScore(col("text")) >= 0.35).as("heuristic"),
          (TextFunctions.hardSigmoid(TextFunctions.classifierLogit(col("text"))) >= 0.5)
            .as("classifier"))
      val cells = flags.groupBy(col("gopher"), col("heuristic"), col("classifier"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = cells.agg(sum(col("n_docs")).as("total"))
      cells.crossJoin(broadcast(tot))
        .select(col("gopher"), col("heuristic"), col("classifier"), col("n_docs"),
          round(col("n_docs") * lit(1.0) / col("total"), 4).as("frac"))
        .orderBy(col("gopher"), col("heuristic"), col("classifier"))
    }),

    // population stability index between corpus halves over the d02
    // quality-score distribution — the "did my corpus quality shift?"
    // monitor (the industry-standard drift scalar next to q124's
    // chi-square, reading DISTRIBUTION movement rather than test
    // significance). Halves = doc_id parity; bins = fixed-width deciles
    // of the score. Per-bin PSI terms (p_a−p_b)·ln(p_a/p_b) pass
    // through DECIMAL(18,9) (the q133 ln-ulp rule); bins empty on
    // either side report NULL (the practitioners' add-epsilon knob is
    // a policy choice this report should surface, not hide). Scale:
    // one map-side score + bin, one partial-aggregated count shuffle,
    // a 1-row broadcast of the totals.
    "d69_quality_psi" -> ((s, d) => {
      val scored = Tables.documents(s, d).select(
        least(floor(TextFunctions.qualityScore(col("text")) * 10), lit(9L))
          .cast(LongType).as("bin"),
        (col("doc_id") % 2 === 0).as("is_a"))
      val per = scored.groupBy(col("bin")).agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      val tot = per.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      def D(c: Column) = c.cast(DoubleType)
      per.crossJoin(broadcast(tot))
        .select(col("bin"), col("ca"), col("cb"),
          when(col("ca") > 0 && col("cb") > 0,
            ((D(col("ca")) / col("na") - D(col("cb")) / col("nb")) *
              log((D(col("ca")) / col("na")) / (D(col("cb")) / col("nb"))))
              .cast(DecimalType(18, 9)).cast(DoubleType)).as("psi_term"))
        .orderBy(col("bin"))
    }))

  private val boilerCtes =
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
      |p AS (SELECT doc_id, unnest(list_transform(
      |        range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT)),
      |        i -> {'idx': CAST(i AS INT),
      |              'para': array_to_string(ws[(i*10+1):(i*10+10)], ' ')})) AS u
      |      FROM t),
      |px AS (SELECT doc_id, u.idx AS idx, u.para AS para, md5(u.para) AS pkey FROM p),
      |bp AS (SELECT pkey FROM px GROUP BY pkey HAVING count(DISTINCT doc_id) >= 3),
      |kept AS (SELECT * FROM px WHERE pkey NOT IN (SELECT pkey FROM bp)),
      |agg AS (SELECT doc_id, count(*) AS n_kept,
      |          string_agg(para, ' | ' ORDER BY idx) AS clean_text
      |        FROM kept GROUP BY doc_id)""".stripMargin

  /** e25's oracle body (a standalone SELECT) — exposed so e45's
    * index-family comparison can embed it as a subquery. */
  private[queries] def e25OracleSql: String =
    s"""WITH planes(p, d, wt) AS (VALUES ${PipelineQueries.lshPlanesValues(8, 64)}),
       |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |un AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS d, e[CAST(t.i AS INT)] AS v
       |       FROM emb, range(1, 65) t(i)),
       |bits AS (SELECT un.vec_id, planes.p,
       |    CASE WHEN sum(planes.wt * CAST(floor(un.v * 1024) AS BIGINT)) > 0 THEN 1 ELSE 0 END AS b
       |  FROM un JOIN planes ON un.d = planes.d GROUP BY un.vec_id, planes.p),
       |sig AS (SELECT vec_id, CAST(sum(b << p) AS INT) AS s FROM bits GROUP BY vec_id),
       |corpus AS (SELECT emb.vec_id AS neighbor_id, emb.e AS cv, sig.s AS bucket
       |           FROM emb JOIN sig ON emb.vec_id = sig.vec_id),
       |masks(mradius, m) AS (VALUES (0,0),(1,1),(1,2),(1,4),(1,8),(1,16),(1,32),(1,64),(1,128)),
       |radii(radius) AS (VALUES (0),(1)),
       |q AS (SELECT r.radius, emb.vec_id AS query_id, emb.e AS qe, xor(sig.s, masks.m) AS bucket
       |      FROM emb JOIN sig ON emb.vec_id = sig.vec_id
       |      CROSS JOIN radii r JOIN masks ON masks.mradius <= r.radius
       |      WHERE emb.vec_id < 5),
       |cand AS (SELECT q.radius, q.query_id, corpus.neighbor_id,
       |           list_cosine_similarity(q.qe, corpus.cv) AS cos
       |         FROM q JOIN corpus ON q.bucket = corpus.bucket
       |         WHERE q.query_id <> corpus.neighbor_id),
       |top AS (SELECT radius, query_id, neighbor_id FROM cand
       |        QUALIFY row_number() OVER (PARTITION BY radius, query_id
       |                                   ORDER BY cos DESC, neighbor_id) <= 5),
       |bf AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id) AS rk
       |       FROM emb a JOIN emb b ON a.vec_id <> b.vec_id WHERE a.vec_id < 5),
       |tr AS (SELECT query_id, neighbor_id FROM bf WHERE rk <= 5),
       |hits AS (SELECT t.radius, count(*) AS hits FROM top t
       |         JOIN tr ON t.query_id = tr.query_id AND t.neighbor_id = tr.neighbor_id
       |         GROUP BY t.radius),
       |nc AS (SELECT radius, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY radius),
       |nq AS (SELECT count(*) AS n_queries FROM emb WHERE vec_id < 5)
       |SELECT nc.radius, nc.n_cand,
       |  CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
       |  round(coalesce(hits.hits, 0) * 1.0 / (5 * nq.n_queries), 4) AS recall_at_5
       |FROM nc LEFT JOIN hits ON nc.radius = hits.radius CROSS JOIN nq
       |ORDER BY nc.radius""".stripMargin

  /** d49s sliced-twin oracle DERIVED from d49's own SQL (the dXXs
    * mechanism — see PipelineQueries). */
  lazy val oracle: Map[String, String] = oracleBase +
    ("d49s_dedup_sweep_sliced" -> TwinSql.subst("d49s_dedup_sweep_sliced",
      oracleBase("d49_dedup_sweep"), "FROM documents",
      s"FROM (SELECT * FROM documents WHERE doc_id < ${PipelineQueries.SliceBound})"))

  private val oracleBase: Map[String, String] = Map(
    "d57_length_trim" ->
      """WITH t AS (SELECT doc_id, source,
        |             CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS BIGINT) AS n_toks
        |           FROM documents),
        |r AS (SELECT doc_id, source, n_toks,
        |        row_number() OVER (PARTITION BY source ORDER BY n_toks, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY source) AS n
        |      FROM t),
        |b AS (SELECT source,
        |        min(CASE WHEN rn = CAST(ceil(n * 0.05) AS INT) THEN n_toks END) AS lo_val,
        |        min(CASE WHEN rn = CAST(ceil(n * 0.95) AS INT) THEN n_toks END) AS hi_val
        |      FROM r GROUP BY source)
        |SELECT t.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN t.n_toks >= b.lo_val AND t.n_toks <= b.hi_val
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  min(b.lo_val) AS lo_val, min(b.hi_val) AS hi_val
        |FROM t JOIN b ON t.source = b.source
        |GROUP BY t.source ORDER BY t.source""".stripMargin,

    "d46_boilerplate_prune" ->
      s"""$boilerCtes
         |SELECT t.doc_id, CAST(ceil(len(t.ws) / 10.0) AS BIGINT) AS n_paras,
         |  coalesce(agg.n_kept, 0) AS n_kept, coalesce(agg.clean_text, '') AS clean_text
         |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id ORDER BY t.doc_id""".stripMargin,

    "d47_ppl_buckets" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents),
        |tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        |n AS (SELECT count(*) AS n_tokens FROM tk),
        |tf AS (SELECT term, count(*) AS tf FROM tk GROUP BY term),
        |lp AS (SELECT tk.doc_id, CAST(ln(tf.tf * 1.0 / n.n_tokens) AS DECIMAL(18,6)) AS lp
        |       FROM tk JOIN tf USING (term) CROSS JOIN n),
        |s AS (SELECT doc_id,
        |        CAST((CASE WHEN sum(lp) >= 0 THEN 1 ELSE -1 END) *
        |             ((abs(CAST(sum(lp) * 1000000 AS BIGINT)) + 50 * count(*)) // (100 * count(*)))
        |          AS DOUBLE) / 10000.0 + 0.0 AS avg_logprob
        |      FROM lp GROUP BY doc_id),
        |o AS (SELECT doc_id, avg_logprob,
        |        row_number() OVER (ORDER BY -avg_logprob, doc_id) AS rn FROM s),
        |k AS (SELECT CAST(ceil(count(*) / 3.0) AS BIGINT) AS k1,
        |        CAST(ceil(count(*) * 2 / 3.0) AS BIGINT) AS k2 FROM s)
        |SELECT o.doc_id, o.avg_logprob,
        |  CASE WHEN o.rn <= k.k1 THEN 'head'
        |       WHEN o.rn <= k.k2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM o CROSS JOIN k ORDER BY doc_id""".stripMargin,

    "d49_dedup_sweep" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
        |bg AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) END AS bgs FROM w),
        |e AS (SELECT doc_id, unnest(bgs) AS s FROM bg),
        |sizes AS (SELECT doc_id, len(bgs) AS n FROM bg),
        |dfc AS (SELECT s, count(*) AS df FROM e GROUP BY s),
        |pruned AS (SELECT count(*) AS n_pruned_keys FROM dfc WHERE df > 100),
        |kept AS (SELECT e.doc_id, e.s FROM e JOIN dfc USING (s)
        |         WHERE dfc.df <= 100 AND dfc.df > 1),
        |co AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
        |       FROM kept x JOIN kept y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        |jc AS (SELECT a, b, common * 1.0 / (sa.n + sb.n - common) AS j
        |       FROM co JOIN sizes sa ON co.a = sa.doc_id JOIN sizes sb ON co.b = sb.doc_id),
        |th AS (SELECT unnest([CAST(0.3 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.7 AS DOUBLE)]) AS threshold),
        |p AS (SELECT th.threshold, jc.a, jc.b FROM jc CROSS JOIN th WHERE jc.j >= th.threshold),
        |np AS (SELECT threshold, count(*) AS n_pairs FROM p GROUP BY threshold),
        |nd AS (SELECT threshold, count(DISTINCT doc) AS n_docs FROM
        |         (SELECT threshold, a AS doc FROM p UNION ALL SELECT threshold, b FROM p)
        |       GROUP BY threshold)
        |SELECT th.threshold, coalesce(np.n_pairs, 0) AS n_pairs, coalesce(nd.n_docs, 0) AS n_docs,
        |  pruned.n_pruned_keys
        |FROM th LEFT JOIN np ON th.threshold = np.threshold
        |        LEFT JOIN nd ON th.threshold = nd.threshold
        |        CROSS JOIN pruned
        |ORDER BY th.threshold""".stripMargin,

    "e23_embedding_drift" ->
      """WITH q AS (SELECT label, CAST(vec_id % 2 AS INT) AS half, CAST(t.i AS INT) - 1 AS pos,
        |             CAST(floor(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1024) AS BIGINT) AS qv
        |           FROM embeddings, range(1, 65) t(i)),
        |s AS (SELECT label, half, pos, sum(qv) AS sv FROM q GROUP BY label, half, pos),
        |c AS (SELECT label, CAST(vec_id % 2 AS INT) AS half, count(*) AS n
        |      FROM embeddings GROUP BY 1, 2),
        |dot AS (SELECT a.label,
        |          sum(CAST(a.sv AS HUGEINT) * b.sv) AS num,
        |          sum(CAST(a.sv AS HUGEINT) * a.sv) AS da,
        |          sum(CAST(b.sv AS HUGEINT) * b.sv) AS db
        |        FROM s a JOIN s b ON a.label = b.label AND a.pos = b.pos
        |        WHERE a.half = 0 AND b.half = 1 GROUP BY a.label)
        |SELECT dot.label, ca.n AS n_a, cb.n AS n_b,
        |  round(CAST(num AS DOUBLE) / (sqrt(CAST(da AS DOUBLE)) * sqrt(CAST(db AS DOUBLE))), 6) + 0.0 AS cos_shift
        |FROM dot JOIN c ca ON dot.label = ca.label AND ca.half = 0
        |         JOIN c cb ON dot.label = cb.label AND cb.half = 1
        |ORDER BY dot.label""".stripMargin,

    "d50_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, source, md5(text) AS fp_a FROM documents),
        |bb AS (SELECT doc_id, source,
        |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]' ELSE text END) AS fp_b
        |       FROM documents WHERE doc_id % 11 <> 0),
        |bn AS (SELECT doc_id + 1000000 AS doc_id, source, md5(text || ' [new]') AS fp_b
        |       FROM documents WHERE doc_id % 13 = 0),
        |b AS (SELECT * FROM bb UNION ALL SELECT * FROM bn),
        |j AS (SELECT coalesce(a.source, b.source) AS source,
        |        CASE WHEN b.fp_b IS NULL THEN 'removed'
        |             WHEN a.fp_a IS NULL THEN 'added'
        |             WHEN a.fp_a = b.fp_b THEN 'unchanged'
        |             ELSE 'changed' END AS status
        |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT source, status, count(*) AS n
        |FROM j GROUP BY source, status ORDER BY source, status""".stripMargin,

    "d51_readability" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS w,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS sen,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS syl
        | FROM documents)
        |SELECT doc_id,
        |  CAST(w AS BIGINT) AS n_words,
        |  CAST(sen AS BIGINT) AS n_sentences,
        |  CAST(syl AS BIGINT) AS n_syllables,
        |  round(0.39 * (w / sen) + 11.8 * (syl / w) - 15.59, 4) + 0.0 AS fk_grade
        |FROM f ORDER BY doc_id""".stripMargin,

    "d52_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |        i -> {'idx': CAST(i AS INT), 'gram': array_to_string(ws[i:i+4], ' ')})) AS u
        |      FROM t WHERE len(ws) >= 5),
        |k AS (SELECT doc_id, u.idx AS idx, md5(u.gram) AS gkey FROM g),
        |f AS (SELECT doc_id,
        |        row_number() OVER (PARTITION BY gkey ORDER BY doc_id, idx) = 1 AS first
        |      FROM k)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN first THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN first THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS novelty
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "e27_jl_projection" ->
      s"""WITH planes(k, dim, w) AS (VALUES ${PipelineQueries.lshPlanesValues(16, 64)}),
         |q AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS dim,
         |        CAST(floor(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1024) AS BIGINT) AS qd
         |      FROM embeddings, range(1, 65) t(i) WHERE vec_id < 20)
         |SELECT q.vec_id, planes.k, CAST(sum(planes.w * q.qd) AS BIGINT) AS proj
         |FROM q JOIN planes ON q.dim = planes.dim
         |GROUP BY q.vec_id, planes.k ORDER BY q.vec_id, planes.k""".stripMargin,

    "e26_top_eigvec" ->
      """WITH qv AS (SELECT vec_id,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |                       v -> CAST(floor(v * 1024) AS BIGINT)) AS q
        |      FROM embeddings),
        |cells0 AS (SELECT CAST(ti.i - 1 AS INT) AS i, CAST(tj.i - 1 AS INT) AS j,
        |             sum(q[CAST(ti.i AS INT)] * q[CAST(tj.i AS INT)]) AS g0
        |           FROM qv, range(1, 65) ti(i), range(1, 65) tj(i) GROUP BY 1, 2),
        |cells AS (SELECT i, j, (g0 + 1099511627776) // 1048576 - 1048576 AS g FROM cells0),
        |x1 AS (SELECT i AS p, sum(g) AS x FROM cells GROUP BY i),
        |x2 AS (SELECT c.i AS p, sum(c.g * x1.x) AS x FROM cells c JOIN x1 ON c.j = x1.p GROUP BY c.i),
        |x3 AS (SELECT c.i AS p, sum(c.g * x2.x) AS x FROM cells c JOIN x2 ON c.j = x2.p GROUP BY c.i),
        |nrm AS (SELECT sqrt(CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE)) AS norm
        |        FROM x3)
        |SELECT x3.p AS pos, round(CAST(x3.x AS DOUBLE) / nrm.norm, 4) + 0.0 AS component
        |FROM x3 CROSS JOIN nrm ORDER BY pos""".stripMargin,

    "e25_lsh_radius_sweep" -> e25OracleSql,

    "e35_silhouette" ->
      s"""${PipelineQueries.kmeansCtes(4, 3, 64)},
         |alld AS (SELECT q.id, c.cid,
         |    list_sum(list_transform(range(1, 65),
         |      ii -> (q.qv[CAST(ii AS INT)] - c.cv[CAST(ii AS INT)]) * (q.qv[CAST(ii AS INT)] - c.cv[CAST(ii AS INT)]))) AS dist
         |  FROM q, c3 c),
         |ab AS (SELECT alld.id, af.cid AS cluster,
         |         max(CASE WHEN alld.cid = af.cid THEN alld.dist END) AS a,
         |         min(CASE WHEN alld.cid <> af.cid THEN alld.dist END) AS b
         |       FROM alld JOIN afinal af ON alld.id = af.id
         |       GROUP BY alld.id, af.cid),
         |sil AS (SELECT cluster,
         |          CAST(CASE WHEN greatest(a, b) = 0 THEN 0.0
         |               ELSE (b - a) * 1.0 / greatest(a, b) END AS DECIMAL(18,9)) AS s
         |        FROM ab)
         |SELECT cluster, count(*) AS n,
         |  round(CAST(sum(s) AS DOUBLE) / count(*), 6) + 0.0 AS mean_sil
         |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin,

    "e24_cluster_purity" ->
      s"""${PipelineQueries.kmeansCtes(4, 3, 64)},
         |j AS (SELECT a.cid AS cluster, e.label
         |      FROM afinal a JOIN embeddings e ON a.id = e.vec_id),
         |ct AS (SELECT cluster, label, count(*) AS cnt FROM j GROUP BY 1, 2),
         |agg AS (SELECT cluster, CAST(sum(cnt) AS BIGINT) AS n, max(cnt) AS mx
         |        FROM ct GROUP BY cluster),
         |top AS (SELECT cluster, label AS top_label FROM ct
         |        QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY cnt DESC, label) = 1)
         |SELECT agg.cluster, agg.n, top.top_label,
         |  round(agg.mx * 1.0 / agg.n, 6) AS purity
         |FROM agg JOIN top ON agg.cluster = top.cluster
         |ORDER BY agg.cluster""".stripMargin,

    "d48_calibration" ->
      s"""WITH f AS (SELECT doc_id, text,
         |  len(string_split_regex(text, '\\s+')) AS n,
         |  len(list_filter(string_split_regex(text, '\\s+'), w -> w IN (${PipelineQueries.stopList}))) AS stop_cnt,
         |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_cnt,
         |  length(text) AS tlen
         | FROM documents),
         |z AS (SELECT doc_id, text,
         |  -1.2 + stop_cnt * 1.0 / greatest(n, 1) * 3.5
         |       - punct_cnt * 1.0 / greatest(tlen, 1) * 8.0
         |       + least(n, 200) * 1.0 / 200.0 * 2.0 AS zv
         | FROM f),
         |pr AS (SELECT doc_id,
         |  round(least(greatest(zv * 0.25 + 0.5, 0.0), 1.0), 6) AS p,
         |  CASE WHEN ${PipelineQueries.qualitySql("text")} >= 0.36 THEN 1 ELSE 0 END AS label
         | FROM z)
         |SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, count(*) AS n,
         |  round(CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_p,
         |  round(sum(label) * 1.0 / count(*), 6) AS frac_pos
         |FROM pr GROUP BY 1 ORDER BY bin""".stripMargin,

    "d70_filter_agreement" ->
      s"""WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
         |m AS (SELECT doc_id, text,
         |        len(ws) AS n_words,
         |        list_sum(list_transform(ws, x -> length(x))) AS sum_len,
         |        len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
         |        len(list_filter(ws, x -> regexp_matches(x, '^[^A-Za-z0-9]+$$'))) AS symbol_words,
         |        len(string_split_regex(text, '\\s+')) AS n,
         |        len(list_filter(string_split_regex(text, '\\s+'), x -> x IN (${PipelineQueries.stopList}))) AS stop_cnt,
         |        length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_cnt,
         |        length(text) AS tlen
         |      FROM w),
         |f AS (SELECT
         |    (n_words BETWEEN 50 AND 100000
         |      AND CAST(sum_len AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
         |      AND CAST(symbol_words AS DOUBLE) / n_words < 0.1
         |      AND CAST(alpha_words AS DOUBLE) / n_words > 0.8) AS gopher,
         |    (${PipelineQueries.qualitySql("text")} >= 0.35) AS heuristic,
         |    (least(greatest((-1.2 + stop_cnt * 1.0 / greatest(n, 1) * 3.5
         |       - punct_cnt * 1.0 / greatest(tlen, 1) * 8.0
         |       + least(n, 200) * 1.0 / 200.0 * 2.0) * 0.25 + 0.5, 0.0), 1.0) >= 0.5)
         |      AS classifier
         |  FROM m),
         |cells AS (SELECT gopher, heuristic, classifier, count(*) AS n_docs
         |          FROM f GROUP BY 1, 2, 3),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM cells)
         |SELECT gopher, heuristic, classifier, n_docs,
         |  round(n_docs * 1.0 / total, 4) AS frac
         |FROM cells CROSS JOIN tot
         |ORDER BY gopher, heuristic, classifier""".stripMargin,

    "d69_quality_psi" ->
      s"""WITH scored AS (SELECT
         |    least(CAST(floor(${PipelineQueries.qualitySql("text")} * 10) AS BIGINT), 9) AS bin,
         |    (doc_id % 2 = 0) AS is_a
         |  FROM documents),
         |per AS (SELECT bin,
         |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM scored GROUP BY bin),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM per)
         |SELECT bin, ca, cb,
         |  CASE WHEN ca > 0 AND cb > 0 THEN
         |    CAST(CAST((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) *
         |      ln((CAST(ca AS DOUBLE) / na) / (CAST(cb AS DOUBLE) / nb))
         |      AS DECIMAL(18,9)) AS DOUBLE) END AS psi_term
         |FROM per CROSS JOIN tot ORDER BY bin""".stripMargin)
}
