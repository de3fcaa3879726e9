package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph- and corpus-mining operators: k-core density filtering, kNN
  * graph construction over embeddings, and windowed co-occurrence
  * statistics (the GloVe/word2vec preprocessing primitive).
  *
  * Every query hash-checks: graph rounds and co-occurrence counts are
  * pure integer arithmetic, kNN scoring runs on floor(v·1024) quantized
  * vectors (the e03b rule), and the only doubles are final scalars
  * computed by identical expressions in both engines.
  */
object MiningQueries {

  /** Fused codegen integer dot (see [[graft.functions.LongDot]]) — one
    * inline loop instead of the allocating non-codegen
    * `aggregate(zip_with(...))` chain; bit-identical 64-bit sums.
    * `ldot(s)(q, q)` is the squared norm. */
  private def ldot(s: SparkSession)(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VectorExpressions.longDot(s)(a, b)

  /** All-pairs kNN graph via LSH multiprobe buckets — the construction
    * primitive under SemDeDup clustering, HNSW-style graph indexes and
    * graph-based label propagation. Differs from the query-serving ANN
    * family (e02/e03/e08/e12): every corpus vector is both probe and
    * candidate, and the output is a directed top-k adjacency list.
    *
    * Scale design (100 TB): the corpus is signed map-side ONCE (integer
    * LSH signature); the probe side expands to the 9 Hamming-≤1 buckets
    * and the candidate join is a bucket equi-join — never an all-pairs
    * product. Candidate volume is bounded by the REAL per-bucket
    * occupancy cap in [[knnCandidatesQuantized]]; the top-k window
    * partitions on the probe id, so no global sort exists anywhere. Scoring is integer-exact: quantized dot + norms, with
    * the double cosine used for RANKING only (identical expression both
    * engines). Factored out so specs can drive planted corpora. */
  private[graft] def knnGraphQuantized(emb: DataFrame, topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
    knnCandidatesQuantized(emb)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select(col("vec_id"), col("rk").cast(LongType).as("rk"),
        col("neighbor_id"), col("qdot"))
  }

  /** The candidate stage of [[knnGraphQuantized]]: LSH multiprobe
    * bucket pairs scored with the quantized dot + cosine — shared by
    * the kNN graph (top-k overall) and triplet mining (per-label
    * argmax). Returns (vec_id, neighbor_id, qdot, cosq).
    *
    * `bucketCap` bounds candidate-side bucket occupancy (deterministic:
    * lowest neighbor ids kept): a degenerate corpus where one signature
    * absorbs millions of vectors would otherwise make the bucket join
    * quadratic in that bucket — the d06 hot-bucket rule. The default
    * never triggers at test SFs (occupancy ≈ N/256), so the capped and
    * uncapped graphs agree; the oracle replays the same cap. */
  private[graft] def knnCandidatesQuantized(emb: DataFrame,
      bucketCap: Int = 4096): DataFrame =
    knnCandidatesBetween(emb, emb, bucketCap)

  /** The generalized candidate stage: PROBE vectors multiprobe the
    * bucketed CORPUS vectors (same machinery as
    * [[knnCandidatesQuantized]], which is the probe = corpus case).
    * The split is what makes e43's incremental maintenance honest at
    * scale: a new-batch update probes with the batch only, so bucket
    * traffic is proportional to the BATCH, never the corpus. The
    * bucket cap bounds occupancy within the given corpus side. */
  private[graft] def knnCandidatesBetween(probeEmb: DataFrame,
      corpusEmb: DataFrame, bucketCap: Int = 4096): DataFrame = {
    val spark = probeEmb.sparkSession
    import spark.implicits._
    // n2 > 0 guard: a zero quantized vector has no direction — its cosine
    // is 0/0 = NaN, and NaN sorts GREATEST in Spark, so an unguarded zero
    // vector would rank as everyone's top neighbor. Dropped at prep time
    // (both sides); the oracles carry the same WHERE n2 > 0.
    // q/sig/n2 are EvalOnce-pinned: the n2 > 0 predicate (and the
    // inferred isnotnull(bucket) join constraint) were being pushed
    // below these projections, re-running the transform+dot+signature
    // per row inside the Filter — ~2× the prep stage's per-vector cost
    // across the whole kNN-graph family. Values are identical.
    def prep(df: DataFrame) = df.select(col("vec_id"), col("embedding"),
        graft.functions.EvalOnce(
          expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))")).as("q"))
      .withColumn("sig", graft.functions.EvalOnce(
        graft.ann.Ann.lshSignatureQuantized(col("embedding"))))
      .withColumn("n2", graft.functions.EvalOnce(ldot(spark)(col("q"), col("q"))))
      .filter(col("n2") > 0)
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("neighbor_id"))
    val corpus = prep(corpusEmb).select(col("vec_id").as("neighbor_id"), col("q").as("cq"),
        col("n2").as("cn2"), col("sig").as("bucket"))
      .withColumn("brn", row_number().over(bw)).filter(col("brn") <= bucketCap)
      .drop("brn")
    val masks = (Seq(0) ++ (0 until 8).map(1 << _)).toDF("m")
    // probes carry the quantized vector through the ×9 expansion: the
    // pair score needs both vectors anyway, and re-fetching them after
    // the bucket match would shuffle the same bytes plus a join
    val probes = prep(probeEmb)
      .select(col("vec_id"), col("q").as("qq"), col("n2").as("qn2"), col("sig"))
      .crossJoin(broadcast(masks))
      .withColumn("bucket", col("sig").bitwiseXOR(col("m")))
      .select(col("vec_id"), col("qq"), col("qn2"), col("bucket"))
    // each (probe, candidate) pair matches through AT MOST one mask
    // (the 9 probe buckets are distinct), so no dedup is needed
    corpus.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("qdot", ldot(spark)(col("qq"), col("cq")))
      .withColumn("cosq", col("qdot").cast(DoubleType) /
        (sqrt(col("qn2").cast(DoubleType)) * sqrt(col("cn2").cast(DoubleType))))
      .select(col("vec_id"), col("neighbor_id"), col("qdot"), col("cosq"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-core of the part co-purchase graph (parts sharing an order are
    // adjacent): 4 peel rounds at degree >= 90 — at sf0.01 the cascade
    // is genuinely multi-round (1745 -> 1534 -> 1221 -> 527 survivors).
    // The co-purchase expansion is bounded per basket (<= C(13,2) pairs
    // per order); the peel itself is KCore's aggregate+semi-join rounds.
    // Output covers EVERY node (flag + final degree), so the result is
    // never empty regardless of how far the cascade runs at a given SF.
    "q128_kcore" -> ((s, d) => q128Body(Tables.lineitem(s, d))),

    // sliced twin (the q77s pattern: the co-purchase graph restricted
    // to l_suppkey < SuppSliceBound — the graph is what shrinks,
    // identically on both engines); oracle derived from q128's own SQL
    "q128s_kcore_sliced" -> ((s, d) => q128Body(slicedLineitem(s, d))),

    // Adamic-Adar link prediction over the co-purchase graph — "what
    // else belongs in this basket": for a query set of source nodes
    // (p_partkey < 100 — the e25/e27 bounded-query-set framing),
    // candidate links (a, b) are scored Σ 1/ln(deg(z)) over common
    // neighbors z, existing edges anti-joined away, top-50 by score.
    // Scale shape: wedges enumerate ONLY from the query-side adjacency
    // (|Q|·deg wedge roots, never Σ deg² over the whole graph); wedge
    // centers above a degree cap are pruned BEFORE expansion (hubs are
    // exactly the centers Adamic-Adar down-weights toward zero anyway);
    // each 1/ln(deg) term is cast to DECIMAL(18,9) pre-sum (the d21
    // rule: identical per-row doubles, then an exact associative sum).
    "q133_link_prediction" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // cut: the self-join backs both union directions AND the
      // existing-edge anti join (q137 rule)
      val e = graft.operators.Lineage.cut(
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct())
      val sym = e.select(col("pa").as("s"), col("pb").as("t"))
        .union(e.select(col("pb"), col("pa")))
      val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("dg"))
      val za = sym.select(col("s").as("z"), col("t").as("a"))
        .filter(col("a") < 100)
        .join(deg.select(col("s").as("z"), col("dg")), Seq("z"))
        .filter(col("dg") <= 500)
      val zb = sym.select(col("s").as("z"), col("t").as("b"))
      val wedges = za.join(zb, Seq("z")).filter(col("a") < col("b"))
      val term = (lit(1.0) / log(col("dg"))).cast(DecimalType(18, 9))
      val scores = wedges.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_common"), sum(term).as("aa"))
      scores.join(e.withColumnRenamed("pa", "a").withColumnRenamed("pb", "b"),
          Seq("a", "b"), "left_anti")
        .select(col("a"), col("b"), col("n_common"),
          col("aa").cast(DoubleType).as("aa_score"))
        .orderBy(col("aa_score").desc, col("a"), col("b")).limit(50)
    }),

    // local clustering coefficient (Watts-Strogatz) for a probe set of
    // nodes over the co-purchase graph — the per-node sibling of q77's
    // global triangle count (community density around a node; the
    // "are my neighbors each other's neighbors?" audit). lcc =
    // 2·tri/(deg·(deg−1)) over exact BIGINT wedge/triangle counts; the
    // division is the only double, written identically in the oracle.
    // Scale shape: wedges generate ONLY around the bounded probe set
    // (50 ids) under a q133-style hub cap (500 — mirrored exactly in
    // the oracle), so wedge volume is |probes|·cap² regardless of
    // graph size; wedge closure is an equi-join on the canonical
    // (a, b) edge key; degrees are one partial-aggregated count.
    "q144_local_clustering" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct()
      localClustering(e, probeMax = 50L, degCap = 500L).orderBy(col("node"))
    }),

    // kNN-graph recall report — e36's tuning-table pattern applied to
    // the GRAPH index family: for a fixed probe set, how many of the
    // exact top-3 neighbors does the e28 LSH graph hold, and how many
    // does one e40 NN-descent round recover? The index-quality readout
    // that decides whether to spend another refinement round. Scale
    // shape: the exact stage broadcasts the 8 probes over ONE linear
    // corpus pass (per-probe top-3 windows — never an all-pairs
    // product); the refined candidates come from the probes' own edges
    // plus one two-hop join (≤ k² per probe); hit counts are integer
    // intersections, and the recalls are one identical division.
    "e42_graph_recall" -> ((s, d) => e42Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e42s_graph_recall_sliced" -> ((s, d) => e42Body(slicedEmb(s, d))),

    // incremental kNN-graph maintenance — fold a NEW vector batch
    // (vec_id % 10 == 0) into the existing e28 graph over the OLD
    // corpus without a rebuild (the d29 incremental-near-dups pattern
    // applied to the graph index). New nodes rank their full candidate
    // set; affected old nodes (≥ 1 new-batch bucket hit) merge their
    // EXISTING top-3 with the new-batch candidates only — top-3 of
    // (old top-3 ∪ new candidates) provably equals the full-rebuild
    // top-3, so the whole delta hash-checks against a rebuild oracle
    // (the spec pins the equivalence). Scale shape: both candidate
    // stages are [[knnCandidatesBetween]] with the NEW BATCH on one
    // side, so bucket traffic is proportional to the batch; untouched
    // old nodes never appear. (The per-bucket cap applies per side —
    // at a cap-binding occupancy the delta is a documented superset.)
    "e43_incremental_knn" -> ((s, d) => e43Body(Tables.embeddings(s, d))),

    // sliced twin (the e28s pattern): same shared body on vec_id <
    // VecSliceBound, oracle derived from e43's own SQL — the
    // graph-MAINTENANCE rows' sf10 oracle representative (e43/e44 full
    // rows stay dual-topology bytediff there).
    "e43s_incremental_knn_sliced" -> ((s, d) => e43Body(slicedEmb(s, d))),

    // kNN-graph DELETION maintenance — e43's counterpart for removals
    // (the GDPR/right-to-erasure path an index at scale must serve):
    // drop a tombstoned batch (vec_id % 17 == 0) and repair ONLY the
    // nodes that pointed at a deleted vector. Unaffected nodes keep
    // their edges unchanged (removals can't improve a survivor's rank
    // — the spec pins that), so repair cost is proportional to the
    // tombstones' in-degree, never the corpus. Affected probes re-rank
    // against the remaining corpus through the same bucketed candidate
    // stage; is_new_edge marks replacement edges. The oracle is the
    // remaining-corpus rebuild restricted to affected nodes.
    "e44_knn_deletion" -> ((s, d) => e44Body(Tables.embeddings(s, d))),

    // sliced twin — see e43s
    "e44s_knn_deletion_sliced" -> ((s, d) => e44Body(slicedEmb(s, d))),

    // unified index-family tuning table — e25's LSH radius sweep and
    // e36's IVF nprobe sweep in ONE comparable report (family, param,
    // candidates scanned, hits, recall@5): the table an ANN deployment
    // reads to pick its index family and operating point. Pure
    // composition: both arms are the existing hash-checked sweeps, so
    // the union hash-checks too (the oracle embeds both oracle bodies
    // as subqueries). Costs exactly the two sweeps it reuses.
    "e45_index_sweep" -> ((s, d) => {
      val lsh = CurationQueries.queries("e25_lsh_radius_sweep")(s, d)
        .select(lit("lsh").as("family"), col("radius").cast(LongType).as("param"),
          col("n_cand").cast(LongType).as("n_cand"),
          col("hits").cast(LongType).as("hits"), col("recall_at_5"))
      val ivf = queries("e36_ivf_nprobe_sweep")(s, d)
        .select(lit("ivf").as("family"), col("nprobe").cast(LongType).as("param"),
          col("total_cand").cast(LongType).as("n_cand"),
          col("hits").cast(LongType).as("hits"), col("recall_at_5"))
      lsh.union(ivf).orderBy(col("family"), col("param"))
    }),

    // embedding-space health — the "is my embedding space collapsing"
    // monitor an ANN deployment watches between retrainings: the LSH
    // signature histogram's occupancy (of the 256 possible 8-bit
    // buckets), max bucket load, and Shannon entropy (≈ 8 bits =
    // healthy spread; → 0 = representation collapse, which silently
    // turns every bucketed index quadratic). Entropy terms pass through
    // DECIMAL(18,6) pre-sum (the m05 rule) so the scalar hash-checks.
    // One map-side signature pass, a ≤256-row histogram shuffle, one
    // 1-row broadcast.
    "e46_embedding_space_health" -> ((s, d) => {
      val h = Tables.embeddings(s, d)
        .select(graft.ann.Ann.lshSignatureQuantized(col("embedding")).as("sig"))
        .groupBy(col("sig")).agg(count(lit(1)).as("c"))
      val tot = h.agg(sum(col("c")).as("n_vectors"),
        count(lit(1)).as("n_occupied"), max(col("c")).as("max_bucket"))
      h.crossJoin(broadcast(tot))
        .withColumn("t", (col("c") * lit(1.0) / col("n_vectors") *
          log2(col("c") * lit(1.0) / col("n_vectors"))).cast(DecimalType(18, 6)))
        .groupBy(col("n_vectors"), col("n_occupied"), col("max_bucket"))
        .agg((-sum(col("t"))).cast(DoubleType).as("entropy"))
        .withColumn("balance", round(col("entropy") / 8.0, 6))
        .select(col("n_vectors"), col("n_occupied"), col("max_bucket"),
          col("entropy"), col("balance"))
    }),

    // NN-descent with REVERSE neighbors — the full Dong et al. trick
    // e40's forward-only round approximates: a node's candidates are
    // its general neighbors (out-edges ∪ IN-edges) and THEIR general
    // neighbors; reverse edges recover asymmetric misses (v found u but
    // u never found v). Same integer-exact rescoring and per-node
    // top-3; is_new marks edges neither LSH nor rank held before. Scale
    // shape: symmetrization doubles the edge list (still O(N·k) rows),
    // the two-hop join is bounded by (2k)² per node, everything keys on
    // node ids. The spec pins that the reverse-aware candidate set is a
    // superset of e40's, so its best neighbor is never worse.
    "e47_nn_descent_reverse" -> ((s, d) => e47Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e47s_nn_descent_reverse_sliced" -> ((s, d) => e47Body(slicedEmb(s, d))),

    // kNN graph over the embeddings corpus, k = 3, LSH multiprobe
    // candidates, integer-exact scoring (see knnGraphQuantized).
    "e28_knn_graph" -> ((s, d) => e28Body(Tables.embeddings(s, d))),

    // ---- sliced oracle twins of the kNN-graph family (the dXXs twin
    // pattern from PipelineQueries, applied to the embeddings side):
    // e28/e29/e39's DuckDB oracles OOM at sf10's 200k vectors, leaving
    // those rows dual-topology bytediff there. The twins run the SAME
    // operator bodies (one shared builder per pair — the Spark-side
    // no-drift guarantee matching the derived oracle) on vec_id <
    // VecSliceBound (inside the oracle-proven sf1 scale; the whole
    // corpus at SF ≤ 0.1) — sf10 semantics evidence the full rows
    // cannot carry.
    "e28s_knn_graph_sliced" -> ((s, d) => e28Body(slicedEmb(s, d))),
    "e29s_label_prop_sliced" -> ((s, d) => e29Body(slicedEmb(s, d))),
    "e39s_hubness_sliced" -> ((s, d) => e39Body(slicedEmb(s, d))),

    // semi-supervised label propagation over the e28 kNN graph — the
    // label-spreading step that turns a small labeled seed set into
    // corpus-wide weak labels (classifier bootstrapping, cluster
    // naming). Nodes with vec_id % 3 == 0 are "unlabeled"; two rounds
    // of majority vote over labeled kNN neighbors (count desc, label
    // asc tie-break — deterministic), newly labeled nodes vote in the
    // next round. Scale shape: each round is one edge join + one
    // (node, label) aggregate + a per-node window — the labeled set
    // only grows, rounds are bounded, no driver state. Every vote is
    // an integer count, so the whole spread hash-checks on top of the
    // already-exact kNN graph.
    "e29_label_prop" -> ((s, d) => e29Body(Tables.embeddings(s, d))),

    // greedy beam search over the e28 kNN graph — the NSW/HNSW-style
    // graph-ANN SERVING pattern (the third index family next to
    // bucketed LSH and IVF cells): start every query at a fixed entry
    // node, expand graph neighbors for 3 rounds keeping a beam of 4
    // per query, answer = top-3 visited by quantized cosine. Scale
    // shape: each round is one frontier-edge equi-join + an anti-join
    // against the visited set + a beam window PARTITIONED per query —
    // work per round is O(frontier × out-degree), independent of
    // corpus size; scoring reuses the integer-exact machinery, so the
    // whole walk (and its miss/hit pattern) hash-checks.
    "e31_graph_search" -> ((s, d) => e31Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e31s_graph_search_sliced" -> ((s, d) => e31Body(slicedEmb(s, d))),

    // hard positive/negative triplet mining — the metric-learning data
    // generator (contrastive/triplet-loss training): for every anchor,
    // the most-similar SAME-label neighbor (hard positive) and the
    // most-similar DIFFERENT-label neighbor (hard negative) from the
    // e28 LSH candidate set. Scale shape: candidates come from the
    // bucketed multiprobe join (never all-pairs); the two label joins
    // key on the vector id (corpus-sized sides — no broadcast hint, the
    // co-partitioned shuffle join is the honest 100 TB plan); the two
    // per-class argmaxes are vec_id-partitioned windows. Anchors with
    // no same/different-label candidate in their buckets emit NULLs —
    // the miss rate IS the probe-budget signal.
    "e30_triplet_mining" -> ((s, d) => e30Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e30s_triplet_mining_sliced" -> ((s, d) => e30Body(slicedEmb(s, d))),

    // a-priori frequent itemsets (triples) over document word sets —
    // the co-occurrence pattern miner (taxonomy hints, template
    // detection, co-topic analysis). Classic a-priori pruning, shaped
    // for scale: infrequent ITEMS are dropped first (broadcast
    // frequent-item set shrinks every basket before any pair work),
    // candidate triples extend only FREQUENT pairs, and both remaining
    // sub-pairs of each candidate are a-priori-checked against the
    // broadcast frequent-pair set BEFORE the support count — the
    // candidate space is bounded by the frequent-pair table, never by
    // the raw basket expansion. Supports are integer counts against
    // relative thresholds (compare mirrored exactly in the oracle).
    "d54_frequent_itemsets" -> ((s, d) =>
      frequentTriples(
        Tables.documents(s, d).select(col("doc_id"),
          explode(expr("array_distinct(filter(split(text, '\\\\s+'), w -> w <> ''))")).as("w")),
        minItem = 0.25, minSet = 0.45)
        .orderBy(col("w1"), col("w2"), col("w3"))),

    // DAU / WAU engagement stickiness — the product-analytics staple.
    // Daily actives are one (day, user) distinct aggregate; the weekly
    // active set reuses it: each active (user, day) projects forward
    // into the 7 days it keeps the user "weekly active" for (map-only
    // ×7 explode of DISTINCT user-days, not raw events), then one
    // distinct count per day. The ratio is one exact IEEE division of
    // two BIGINTs. Only full windows report (day >= first day + 6), so
    // the series has no ramp-up artifacts.
    "q131_stickiness" -> ((s, d) =>
      stickiness(eventsTus(s, d)
          .select(expr("tus div 86400000000").as("day"), col("user_id")))
        .orderBy(col("day"))),

    // document continuation detection — the crawl-pipeline reassembly
    // probe: doc A's LAST k-token gram equals doc B's FIRST k-token
    // gram ⟹ B plausibly continues A (split pages, chunked uploads).
    // k = 3 here (the short synthetic docs never share longer
    // boundaries; production corpora use k ≈ 10 — the knob, not the
    // shape). One md5-keyed equi-join of two map-only gram projections;
    // both sides inherit the d49 df-cap (a boilerplate opener/closer
    // gram would make the join quadratic in its frequency), with the
    // pruned key count reported so the probe stays honest.
    "d55_continuation_pairs" -> ((s, d) =>
      continuationPairs(Tables.documents(s, d), k = 3, maxDf = 50)
        .orderBy(col("a"), col("b"))),

    // cross-source duplicate matrix — "which ingest feeds copy each
    // other": per content fingerprint (bag-of-words here — the word-SET
    // md5, the coarse dedup granularity that catches reshuffled copies;
    // exact-text md5 is the same query with a different key), per-source
    // copy counts; the (source_a, source_b) pair contribution is
    // ARITHMETIC (n_a·n_b cross-source, C(n,2) within-source) over the
    // tiny per-fingerprint source histogram — document pairs are NEVER
    // expanded, so a fingerprint with a million copies costs one row
    // per source, not 10^12 join rows. One fingerprint shuffle, one
    // per-fp self-join over ≤|sources| rows, one final roll-up.
    "d56_dup_matrix" -> ((s, d) =>
      dupMatrix(Tables.documents(s, d)
          .select(md5(expr(
            "array_join(array_sort(array_distinct(filter(split(text, '\\\\s+'), w -> w <> ''))), ' ')"))
            .as("fp"), col("source")))
        .orderBy(col("src_a"), col("src_b"))),

    // IVF index health diagnostics — FAISS's imbalance factor over the
    // coarse cells: per-cell occupancy plus nLists·Σc²/N² (1.0 =
    // perfectly balanced; → nLists as one cell absorbs everything) —
    // the "is my partitioning still good" check an ANN serving tier
    // runs after every ingest batch. Coarse assignment is fully
    // DECLARATIVE (no UDF): quantized dims join the broadcast centroid
    // table, one (vec, cell) distance aggregate, argmin by a
    // vec-partitioned window with the strict-<-lowest-cell tie rule —
    // the same assignment e13b's encode performs, so the oracle replays
    // it from the same centroid literals. Imbalance divides twice
    // (never forms N² in integers) so no product overflows at corpus
    // scale.
    "e32_index_health" -> ((s, d) => {
      val nLists = 16
      val d2 = ivfCoarseD2(s, Tables.embeddings(s, d), nLists)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d2"), col("cell"))
      val assign = d2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      // cut: the occupancy table backs the imbalance stats AND the report
      // — without it the whole coarse assignment replays twice
      val occ = graft.operators.Lineage.cut(
        assign.groupBy(col("cell")).agg(count(lit(1)).as("occupancy")))
      val stats = occ.agg(count(lit(1)).as("n_used"),
          sum(col("occupancy")).as("n"),
          sum(col("occupancy") * col("occupancy")).as("ss"))
        .select(col("n_used"),
          ((lit(nLists) * col("ss")).cast(DoubleType) /
            col("n").cast(DoubleType) / col("n").cast(DoubleType)).as("imbalance"))
      occ.crossJoin(broadcast(stats))
        .select(col("cell"), col("occupancy"), col("n_used"), col("imbalance"))
        .orderBy(col("cell"))
    }),

    // IVF nprobe recall/cost sweep — e25's tuning table for the OTHER
    // index family: at nprobe = 1/2/4 of 16 fixed cells, how much
    // recall@5 does each probe level buy and at what candidate cost?
    // The e08b/e32 fixed-centroid machinery keeps the whole sweep
    // integer-exact (coarse assignment ties → lowest cell, quantized
    // cosine ranking, id tie-breaks), so recall AND cost hash-check.
    // Scale shape: the k·d centroid table broadcasts; corpus assignment
    // is the e32 map-side explode + one partial-aggregated shuffle; the
    // probe join keys on the cell; the brute-force truth broadcasts the
    // 8 queries (e02's shape) — the corpus never shuffles for scoring.
    "e36_ivf_nprobe_sweep" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val q = emb.select(col("vec_id"),
          expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
        .withColumn("n2", ldot(s)(col("q"), col("q")))
      // cut: the coarse-quantizer distances back the corpus assignment
      // AND the query-cell ranking
      val d2 = graft.operators.Lineage.cut(ivfCoarseD2(s, emb, nLists = 16))
      val aw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d2"), col("cell"))
      val assign = d2.withColumn("rn", row_number().over(aw)).filter(col("rn") === 1)
        .select(col("vec_id").as("cid"), col("cell"))
      val qcells = d2.filter(col("vec_id") < 8)
        .withColumn("cr", row_number().over(aw)).filter(col("cr") <= 4)
        .select(col("vec_id").as("qid"), col("cell"), col("cr"))
      val probes = Seq(1, 2, 4).toDF("nprobe")
      // cut: the candidate table backs the top-5 scoring AND the
      // per-nprobe candidate counts
      val cand = graft.operators.Lineage.cut(
        qcells.join(broadcast(probes), col("cr") <= col("nprobe"))
          .join(assign, Seq("cell"))
          .select(col("nprobe"), col("qid"), col("cid")))
      val qside = q.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("q").as("qa"), col("n2").as("na"))
      def score(df: DataFrame) = df
        .join(q.select(col("vec_id").as("cid"), col("q").as("qb"), col("n2").as("nb")), Seq("cid"))
        .withColumn("qdot", ldot(s)(col("qa"), col("qb")))
        .withColumn("cosq", col("qdot").cast(DoubleType) /
          (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
      val tw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("nprobe"), col("qid")).orderBy(col("cosq").desc, col("cid"))
      val top5 = score(cand.join(broadcast(qside), Seq("qid")))
        .withColumn("rk", row_number().over(tw)).filter(col("rk") <= 5)
        .select(col("nprobe"), col("qid"), col("cid"))
      val bw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cosq").desc, col("cid"))
      val exact = score(q.select(col("vec_id").as("cid")).crossJoin(broadcast(qside)))
        .withColumn("rk", row_number().over(bw)).filter(col("rk") <= 5)
        .select(col("qid"), col("cid"))
      val hits = top5.join(exact, Seq("qid", "cid"))
        .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
      val nc = cand.groupBy(col("nprobe")).agg(count(lit(1)).as("total_cand"))
      val nq = qcells.agg(countDistinct(col("qid")).as("n_queries"))
      nc.join(hits, Seq("nprobe"), "left").crossJoin(broadcast(nq))
        .select(col("nprobe"), col("total_cand"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)) * lit(1.0) /
            (lit(5) * col("n_queries")), 4).as("recall_at_5"))
        .orderBy(col("nprobe"))
    }),

    // neighborhood function N(seed, r) — distinct nodes within r hops,
    // the effective-diameter / spid primitive (HyperANF's exact twin).
    // Three rounds of reach-set expansion over the co-purchase graph
    // for a bounded seed set (pk < 100): each round is one equi-join on
    // the frontier key + one (seed, node) distinct — narrow int pairs
    // through every shuffle, counts grouped per seed. The 100 TB shape
    // swaps the exact (seed, node) set for KMV registers (q116's
    // aggregate family) merged per seed — same rounds, sketch-sized
    // state; this exact form is the oracle-checkable ground truth.
    "q137_neighborhood_function" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // cut: the co-purchase self-join is referenced by every expansion
      // round — materialize it once instead of re-deriving per round
      // (was ~100 planned parquet scans / 15 s at sf0.01)
      val e = graft.operators.Lineage.cut(
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct())
      val sym = e.select(col("pa").as("es"), col("pb").as("et"))
        .union(e.select(col("pb"), col("pa")))
      val seeds = sym.select(col("es")).distinct().filter(col("es") < 100)
      neighborhoodCounts(sym, seeds.select(col("es").as("seed")), rounds = 3)
        .orderBy(col("seed"), col("r"))
    }),

    // hubness report — the high-dimensional ANN pathology metric
    // (Radovanović et al. 2010): how often each vector appears in OTHER
    // vectors' top-k. Hubs distort retrieval (they crowd every result
    // list) and orphans are unreachable through the graph — both are
    // direct serving-quality signals for the e28/e31 graph index. Pure
    // composition: one in-degree aggregate over the kNN edges + a 1-row
    // broadcast of the distribution extremes.
    "e39_hubness" -> ((s, d) => e39Body(Tables.embeddings(s, d))),

    // degree assortativity (Newman 2002) — do hubs connect to hubs?
    // Pearson correlation of endpoint degrees over the directed edge
    // list, from decimal-exact moment sums (the q60/q101 rule: BIGINT
    // degrees, DECIMAL(38,0) product sums vs the oracle's HUGEINT,
    // doubles only in the final correlation). Negative assortativity =
    // hub-and-spoke (salting/hub caps matter); positive = core-periphery.
    // Two joins on the degree table + one 1-row moment aggregate.
    "q141_assortativity" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // cut: the self-join feeds both union directions (q137 rule)
      val e = graft.operators.Lineage.cut(
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct())
      val sym = e.select(col("pa").as("s0"), col("pb").as("t0"))
        .union(e.select(col("pb"), col("pa")))
      val deg = sym.groupBy(col("s0")).agg(count(lit(1)).as("dg"))
      val ed = sym
        .join(deg.select(col("s0"), col("dg").as("x")), Seq("s0"))
        .join(deg.select(col("s0").as("t0"), col("dg").as("y")), Seq("t0"))
        .select(col("x"), col("x").cast(DecimalType(19, 0)).as("px"),
          col("y"), col("y").cast(DecimalType(19, 0)).as("py"))
      val mrow = ed.agg(count(lit(1)).as("m"),
        sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
        sum(col("y")).cast(DecimalType(38, 0)).as("sy"),
        sum(col("px") * col("py")).cast(DecimalType(38, 0)).as("sxy"),
        sum(col("px") * col("px")).cast(DecimalType(38, 0)).as("sxx"),
        sum(col("py") * col("py")).cast(DecimalType(38, 0)).as("syy"))
      def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      mrow.select(col("m").as("n_edges_directed"),
        (round((D(col("m")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
          sqrt((D(col("m")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) *
               (D(col("m")) * D(col("syy")) - D(col("sy")) * D(col("sy")))), 4) +
          lit(0.0)).as("assortativity"))
    }),

    // mutual nearest neighbors over the kNN graph — the MNN matching
    // primitive (alignment, batch-effect pairing, and the strictest
    // near-dup signal: each is the other's single closest vector).
    // Pure composition on the shared candidate stage: rk = 1 rows
    // self-join on the reversed pair — two narrow (id, id) streams, an
    // equi-join on the pair key, nothing quadratic anywhere.
    "e38_mutual_nn" -> ((s, d) => e38Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e38s_mutual_nn_sliced" -> ((s, d) => e38Body(slicedEmb(s, d))),

    // degree-distribution profile of the co-purchase graph — the graph
    // sibling of d65's key-skew profile: the degree histogram (the
    // power-law readout that decides hub caps like q133's and bucket
    // caps like e28's) plus the scalar shape stats, attached d65-style.
    // Two partial-aggregated shuffles (degree, then histogram), a 1-row
    // broadcast — flat cost at any graph size.
    "q140_degree_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // cut: the self-join feeds both union directions (q137 rule)
      val e = graft.operators.Lineage.cut(
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct())
      val sym = e.select(col("pa").as("s0"), col("pb").as("t0"))
        .union(e.select(col("pb"), col("pa")))
      val deg = sym.groupBy(col("s0")).agg(count(lit(1)).as("deg"))
      val hist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
      val stats = deg.agg(count(lit(1)).as("n"), sum(col("deg")).as("sum_deg"),
        max(col("deg")).as("max_deg"))
      hist.crossJoin(broadcast(stats))
        .select(col("deg"), col("n_nodes"), col("n").as("n_nodes_total"),
          expr("sum_deg div 2").as("n_edges"), col("max_deg"),
          round(col("sum_deg") * lit(1.0) / col("n"), 4).as("avg_deg"))
        .orderBy(col("deg"))
    }),

    // HyperBall/HyperANF register propagation (Boldi & Vigna 2013) —
    // q137's TRUE 100 TB shape: instead of exact (seed, node) reach
    // sets, EVERY node carries a mergeable k-min-values register
    // (k = 32 md5 hashes), and each round merges each node's register
    // with its neighbors' (union, keep the k smallest). Per-round cost
    // is O(edges · k) with k CONSTANT — neighborhood sizes for ALL
    // nodes at once, which no exact formulation can do at scale. KMV
    // instead of HLL keeps it deterministic: collect_set is unordered
    // but array_sort canonicalizes, ties are impossible (md5 is
    // injective on these ids), and the (k−1)/kth-fraction estimate is
    // one identical double expression — so even the ESTIMATES
    // hash-check against the oracle's unrolled list-algebra replay.
    "q138_hyperball" -> ((s, d) => q138Body(Tables.lineitem(s, d))),

    // sliced twin — see q128s
    "q138s_hyperball_sliced" -> ((s, d) => q138Body(slicedLineitem(s, d))),

    // k-center / farthest-first clustering init (Gonzalez 1985 — the
    // deterministic k-means++ alternative and the 2-approximation for
    // k-center): greedily pick the point farthest from the chosen set.
    // Fully integer-exact on floor(v·1024) quantized vectors, so the
    // whole trajectory hash-checks. Scale shape: each of the k rounds
    // is a MAP-ONLY min-distance pass (centers ride as literals in the
    // expression — the e19 Lloyd's rule) + one global top-1, i.e. k
    // bounded driver actions of one row each (the e16/BPE precedent);
    // no state beyond k·d driver-held centers.
    "e33_kcenter_init" -> ((s, d) =>
      kcenterInit(s, Tables.embeddings(s, d), k = 6).orderBy(col("rank"))),

    // kNN-distance outlier scoring (Ramaswamy et al. — "distance to the
    // k-th neighbor"): every vector's 3rd-nearest candidate from the
    // SAME multiprobe LSH candidate stage the kNN graph uses, plus its
    // candidate count. Vectors with no (or <3) candidates surface with
    // NULL kth columns — exactly the isolated points a density audit
    // wants flagged. Output is ids + integer qdot only, so the whole
    // index-quality probe hash-checks; ranking uses the per-row double
    // cosine (identical expression both engines), never a float sum.
    "e34_knn_outliers" -> ((s, d) => e34Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e34s_knn_outliers_sliced" -> ((s, d) => e34Body(slicedEmb(s, d))),

    // Newman modularity of the e29 label-propagation communities over
    // the e28 kNN graph — the community-quality readout (is the
    // propagated labeling better than chance?). Per community c:
    // Q_c = l_c/m − (d_c/2m)², where l_c = intra-community undirected
    // edges, d_c = community degree sum, m = undirected edges among
    // labeled nodes — all exact BIGINTs; the only doubles are the two
    // final divisions, written parenthesis-for-parenthesis in the
    // oracle. Scale shape: the directed kNN edges canonicalize to
    // undirected pairs in one distinct, labels attach via two id-keyed
    // joins, and l_c/d_c/m are three partial-aggregated counts (m rides
    // as a 1-row broadcast) — nothing beyond the graph machinery that
    // already scales.
    "q143_modularity" -> ((s, d) => q143Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "q143s_modularity_sliced" -> ((s, d) => q143Body(slicedEmb(s, d))),

    // one NN-descent refinement round over the e28 kNN graph (Dong et
    // al. 2011 — the standard way large-scale kNN graphs converge
    // past what one LSH pass finds): candidates = current neighbors ∪
    // neighbors-of-neighbors, rescored with the integer-exact
    // quantized dot, new top-3 per node; is_new marks edges the LSH
    // pass missed. Scale shape: the two-hop expansion is an id-keyed
    // self-join bounded by k² per node (k = 3, never corpus-sized),
    // rescoring joins the quantized-vector table on each endpoint id,
    // and the final top-k is a per-node window — no all-pairs product
    // anywhere, per-round cost O(N·k²·d).
    "e40_nn_descent" -> ((s, d) => e40Body(Tables.embeddings(s, d))),

    // sliced twin — see e28s/e43s
    "e40s_nn_descent_sliced" -> ((s, d) => e40Body(slicedEmb(s, d))),

    // grid-density clustering (the DBSCAN/GriDBSCAN shape at corpus
    // scale): quantize the first two embedding dims to 128-wide grid
    // cells, call cells with ≥ 8 points "core", and connect core cells
    // through their 8-neighborhood by 3 rounds of min-label
    // propagation — points in non-core cells are noise. Everything is
    // integer (cell coords, counts, min-labels), so the whole
    // clustering hash-checks. Scale shape: cell assignment is map-only
    // arithmetic; the cell table is |occupied cells| ≪ N; adjacency is
    // a broadcast 9-offset explode + equi-join on the cell key (never
    // an inequality join); each round is one cell-keyed aggregate.
    "e41_grid_density" -> ((s, d) => {
      val pts = Tables.embeddings(s, d).select(col("vec_id"),
          expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1024) AS BIGINT)").as("q0"),
          expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1024) AS BIGINT)").as("q1"))
        .select(col("vec_id"),
          floor(col("q0") / lit(128.0)).as("gx"),
          floor(col("q1") / lit(128.0)).as("gy"))
      gridDensityClusters(pts, minPts = 8, rounds = 3)
        .orderBy(col("gx"), col("gy"))
    }),

    // windowed word co-occurrence + PMI — the GloVe/word2vec
    // preprocessing primitive (and the collocation detector feeding
    // phrase mining). Pair generation is MAP-ONLY: offsets 1..5 explode
    // from the token array per document (no positional self-join), the
    // single shuffle is the (w1, w2) count aggregate on symmetric
    // normalized keys. Unigram counts and the two scalar totals
    // broadcast into the final PMI projection; PMI itself is one double
    // expression over exact BIGINT counts, mirrored parenthesis-for-
    // parenthesis in the oracle (+ 0.0 canonicalizes -0.0: PMI of
    // independent pairs hovers near zero from below).
    "d53_cooccurrence_pmi" -> ((s, d) =>
      cooccurrencePmi(Tables.documents(s, d), minCount = 5)
        .orderBy(col("w1"), col("w2"))))

  /** e32/e36's coarse stage: integer squared-L2 from every vector to
    * every FIXED IVF centroid — (vec_id, cell, d2). The k·d centroid
    * table broadcasts; the per-dim explode is map-side and the only
    * shuffle is the (vec_id, cell) partial-aggregated sum. */
  private def ivfCoarseD2(s: SparkSession, emb: DataFrame, nLists: Int): DataFrame = {
    import s.implicits._
    val cents = (for (c <- 0 until nLists; dd <- 0 until 64)
      yield (c, dd, graft.ann.Ann.ivfFixedCentroid(c, dd))).toDF("dim_cell", "dim", "cv")
    val qv = emb.select(col("vec_id"),
      posexplode(expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))"))
        .as(Seq("dim", "qd")))
    qv.join(broadcast(cents), Seq("dim"))
      .groupBy(col("vec_id"), col("dim_cell").as("cell"))
      .agg(sum((col("qd") - col("cv")) * (col("qd") - col("cv"))).as("d2"))
  }

  /** q138's core: per-node KMV neighborhood registers after `rounds`
    * merge rounds, with the (k−1)/kth-hash-fraction cardinality
    * estimate (exact length below the k cap). `sym` needs directed
    * edge columns (es, et). Returns (node, n_reg, n_est). */
  private[queries] def hyperballEstimates(sym0: DataFrame, rounds: Int,
      k: Int): DataFrame = {
    // the edge list is static and every round joins it on et — cut it
    // DECLARED hash(et) once (Lineage.cutPartitionedBy) so each round
    // exchanges only the register vector, never the edges
    val sym = graft.operators.Lineage.cutPartitionedBy(sym0, Seq("et"))
    val nodes = sym.select(col("es").as("node")).distinct()
    // register element = the md5's leading 60 bits AS A BIGINT (the
    // d07b convention), not the 32-hex-char string: the estimator only
    // ever read those 60 bits (conv(substr(h, 1, 15))), and an 8-byte
    // long is ~5× smaller than the hex UTF8String in the unsafe row —
    // the register payload rides EVERY per-round edge join, so this is
    // the difference between a feasible and an ENOSPC sf10 run
    // (round 13: string registers spilled >74 GB on the 400M-edge-row
    // co-purchase graph). Numeric min-k over these longs equals UTF8
    // min-k over the hex strings they prefix (hex sorts lexicographic
    // = numeric); 60-bit collisions between distinct md5s are the only
    // semantic difference (~N²/2⁶¹ — absent at any tested SF, and both
    // engines compute the identical convention).
    var reg = nodes.select(col("node"),
      array(conv(substring(md5(col("node").cast(StringType)), 1, 15), 16, 10)
        .cast(LongType)).as("reg"))
    for (_ <- 1 to rounds) {
      val nbr = sym.join(reg, sym("et") === reg("node"))
        .select(sym("es").as("node"), col("reg"))
      // cut: round r's registers feed round r+1's neighbor join AND its
      // own union — each round would otherwise replay all earlier merges.
      // min_k_longs_merge == slice(array_sort(collect_set over exploded
      // elements), 1, k) bit for bit, but with ≤k-element state AND no
      // explode: collect_set shipped every node's full 32·degree
      // distinct register set through the exchange before truncating
      // (the q138 sf1 wall-clock hog; BASELINE round 10), and even the
      // bounded-state exploded form multiplied the aggregation input by
      // the register width — 5.8·10⁹ rows into the partial aggregate at
      // sf10, whose sort-based spill exhausted the disk (round 13).
      // Merging whole arrays keeps the input at edge-row cardinality.
      reg = graft.operators.Lineage.cut(reg.union(nbr)
        .groupBy(col("node"))
        .agg(graft.functions.KmvSketch.minKLongsMerge(col("reg"), k).as("reg")))
    }
    // md5 hex sorts uniformly; the kth smallest's 60-bit fraction
    // v/16^15 estimates the register's fill rate, so |N| ≈ (k−1)/frac
    // — one identical double expression both engines
    reg.select(col("node"), size(col("reg")).cast(LongType).as("n_reg"),
      round(when(size(col("reg")) < k, size(col("reg")).cast(DoubleType))
        .otherwise(lit((k - 1).toDouble) * pow(lit(16.0), lit(15)) /
          element_at(col("reg"), k).cast(DoubleType)), 4).as("n_est"))
  }

  /** q137's core: N(seed, r) for r = 1..rounds by multi-source BFS over
    * per-node seed BITMASKS. `sym` needs directed edge columns (es, et);
    * `seeds` a seed column (bigint).
    *
    * State is (node, grp, m): bit `seed & 63` of the mask for group
    * `seed >> 6` is set iff `node` is within r hops of `seed` — the
    * (seed, node) reach PAIR SET compressed 64:1 into bitmask rows. The
    * previous pair-set form re-expanded the ENTIRE reach set through the
    * edge join every round (round r's join output is |reach_r|·deg rows,
    * and reach saturates toward |seeds|·|nodes| on a small-world graph —
    * 121 s of task time / 9.3 s max task at sf0.1); here every edge
    * carries at most `ceil(seeds/64)` 24-byte mask rows per round
    * regardless of how many seeds reach it (guide §2.3: shuffle
    * metadata, not the pair explosion), and the per-round merge is a
    * map-combinable bit_or instead of a pair distinct. bit_or is
    * commutative/associative, so the masks — and the popcount-derived
    * counts — are deterministic and EXACTLY the old distinct-pair
    * counts: bit (g, b) of node n is set iff some ≤r-hop path
    * seed→…→n exists, the same predicate the pair set materialized.
    * Arithmetic is exact for ANY bigint seed (including negatives):
    * seed == (seed >> 6) * 64 + (seed & 63) in two's complement, and
    * bit tests use `& 1`, which is sign-extension-proof. */
  private[queries] def neighborhoodCounts(sym0: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    // static edge list, joined on es every round — declared hash(es)
    // cut (same rationale as hyperballEstimates/PageRank: only the
    // node-keyed mask state re-shuffles per round)
    val sym = graft.operators.Lineage.cutPartitionedBy(sym0, Seq("es"))
    var state = seeds.select(col("seed").as("node"),
      shiftright(col("seed"), 6).as("grp"),
      expr("shiftleft(1L, CAST(seed & 63 AS INT))").as("m"))
    val perRound = (1 to rounds).map { r =>
      val contrib = state.join(sym, state("node") === sym("es"))
        .select(col("et").as("node"), col("grp"), col("m"))
      // cut: round r's masks feed round r+1's expansion AND its own
      // count — without the cut each round re-executes every earlier one
      state = graft.operators.Lineage.cut(state.union(contrib)
        .groupBy(col("node"), col("grp")).agg(expr("bit_or(m)").as("m")))
      state.select(col("grp"),
          explode(expr("filter(sequence(0, 63), b -> (shiftright(m, b) & 1) = 1)")).as("b"))
        .select((shiftleft(col("grp"), 6) + col("b")).as("seed"))
        .groupBy(col("seed")).agg(count(lit(1)).as("n_reach"))
        .select(col("seed"), lit(r.toLong).as("r"), col("n_reach"))
    }
    perRound.reduce(_ union _)
  }

  /** e33's core: Gonzalez farthest-first picks over floor(v·1024)
    * quantized vectors; returns (rank, center_vec_id, dist2). */
  private[queries] def kcenterInit(s: SparkSession, embIn: DataFrame,
      k: Int): DataFrame = {
    val spark = s
    import spark.implicits._
    graft.functions.VectorExpressions.registerAll(s)
    val emb = embIn.select(col("vec_id"),
      expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
    def dist2To(c: Seq[Long]) = expr(
      s"long_l2sq(q, array(${c.mkString("L, ")}L))")
    val first = emb.orderBy(col("vec_id")).limit(1).collect()(0)
    var centers = Vector(first.getSeq[Long](1))
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, first.getLong(0), 0L))
    for (r <- 2 to k) {
      val next = emb
        .withColumn("md", centers.map(dist2To).reduce((a, b) => least(a, b)))
        .orderBy(col("md").desc, col("vec_id")).limit(1).collect()(0)
      centers :+= next.getSeq[Long](1)
      picks += ((r.toLong, next.getLong(0), next.getLong(2)))
    }
    picks.toSeq.toDF("rank", "center_vec_id", "dist2")
  }

  /** events with epoch-micros `tus` (EventQueries' dispatch, local copy
    * for this object's one events consumer). */
  private def eventsTus(s: SparkSession, d: String): DataFrame = {
    val df = Tables.events(s, d)
    val tus = df.schema("ts").dataType match {
      case LongType            => expr("ts div 1000")
      case _: TimestampNTZType => expr(
        "unix_date(cast(ts as date)) * 86400000000 + " +
          "(hour(ts) * 3600 + minute(ts) * 60) * CAST(1000000 AS BIGINT) + " +
          "cast(extract(SECOND FROM ts) * 1000000 AS BIGINT)")
      case _                   => expr("unix_micros(ts)")
    }
    df.withColumn("tus", tus)
  }

  /** e29's body: bounded-round majority-vote label propagation over a
    * directed edge list. `nodes` carries (vec_id, label) with NULL
    * label = unlabeled; `edges` carries (vec_id, neighbor_id). Factored
    * for planted-graph specs. */
  private[graft] def labelProp(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    val seeds = nodes.filter(col("label").isNotNull)
    var labeled = seeds.withColumn("rnd", lit(0))
    for (r <- 1 to rounds) {
      val unl = nodes.select(col("vec_id"))
        .join(labeled.select(col("vec_id")), Seq("vec_id"), "left_anti")
      val votes = unl.join(edges, Seq("vec_id"))
        .join(labeled.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("neighbor_id"))
        .groupBy(col("vec_id"), col("label")).agg(count(lit(1)).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("v").desc, col("label"))
      val newly = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label")).withColumn("rnd", lit(r))
      // cut: round r's labels feed round r+1's anti-join, vote join AND
      // the final left join — each round would otherwise replay all
      // earlier rounds' windows and joins per reference
      labeled = graft.operators.Lineage.cut(labeled.union(newly))
    }
    nodes.select(col("vec_id"))
      .join(labeled, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("rnd"), lit(-1)).as("assigned_round"))
  }

  /** q144's core: Watts-Strogatz local clustering coefficient for
    * probe nodes (id < `probeMax`) over canonical undirected edges
    * (pa < pb). Hubs past `degCap` report NULL n_tri/lcc (their wedge
    * space is the thing the cap exists to avoid). */
  private[graft] def localClustering(e0: DataFrame, probeMax: Long,
      degCap: Long): DataFrame = {
    // cut: the caller's edge derivation is read by both wedge sides and
    // the closing-edge probe; sym by the degree table and both wedge ends
    val e = graft.operators.Lineage.cut(e0)
    val sym = graft.operators.Lineage.cut(
      e.select(col("pa").as("z"), col("pb").as("t"))
        .union(e.select(col("pb"), col("pa"))))
    val deg = sym.groupBy(col("z")).agg(count(lit(1)).as("dg"))
    val centers = deg.filter(col("z") < probeMax && col("dg") >= 2 && col("dg") <= degCap)
    val za = sym.join(centers.select(col("z")), Seq("z"))
      .select(col("z"), col("t").as("wa"))
    val zb = sym.select(col("z"), col("t").as("wb"))
    val wedges = za.join(zb, Seq("z")).filter(col("wa") < col("wb"))
    val tri = wedges
      .join(e.select(col("pa").as("wa"), col("pb").as("wb")), Seq("wa", "wb"))
      .groupBy(col("z")).agg(count(lit(1)).as("n_tri"))
    deg.filter(col("z") < probeMax)
      .join(tri, Seq("z"), "left")
      .select(col("z").as("node"), col("dg").as("deg"),
        when(col("dg") >= 2 && col("dg") <= degCap,
          coalesce(col("n_tri"), lit(0L))).as("n_tri"))
      .withColumn("lcc",
        (col("n_tri") * 2).cast(DoubleType) / (col("deg") * (col("deg") - 1)))
  }

  /** q143's core: per-community Newman modularity terms over a
    * directed edge list (canonicalized to undirected internally) and a
    * (vec_id, label) community map — labeled nodes only contribute.
    * Returns (label, n_nodes, lc, dc, q_contrib). */
  private[graft] def modularityByCommunity(g: DataFrame, lbl: DataFrame): DataFrame = {
    val ue = g.select(least(col("vec_id"), col("neighbor_id")).as("a"),
      greatest(col("vec_id"), col("neighbor_id")).as("b")).distinct()
    // cut: the labeled edge table feeds the m scalar, the within-community
    // count, and both degree projections — one materialization, four reads
    val le = graft.operators.Lineage.cut(ue
      .join(lbl.select(col("vec_id").as("a"), col("label").as("la")), Seq("a"))
      .join(lbl.select(col("vec_id").as("b"), col("label").as("lb")), Seq("b")))
    val m = le.agg(count(lit(1)).as("m"))
    val lc = le.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("lc"))
    val dc = le.select(col("la").as("label"))
      .union(le.select(col("lb")))
      .groupBy(col("label")).agg(count(lit(1)).as("dc"))
    val sizes = lbl.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    sizes.join(lc, Seq("label"), "left").join(dc, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("lc"), lit(0L)).as("lc"),
        coalesce(col("dc"), lit(0L)).as("dc"))
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"), col("lc"), col("dc"),
        (col("lc").cast(DoubleType) / col("m") -
          (col("dc").cast(DoubleType) / (col("m") * 2)) *
          (col("dc").cast(DoubleType) / (col("m") * 2))).as("q_contrib"))
  }

  /** e40's core: one NN-descent refinement round — candidates are the
    * current neighbors plus neighbors-of-neighbors of `g`, rescored
    * with the integer-exact quantized dot over `emb`'s vectors, new
    * top-`topK` per node; is_new marks edges absent from `g`. */
  private[graft] def nnDescentRound(g0: DataFrame, emb: DataFrame,
      topK: Int): DataFrame = {
    // cut: the input graph backs both two-hop sides, the candidate
    // union, and the is_new probe — four reads of the caller's build
    val g = graft.operators.Lineage.cut(g0)
    val base = emb.select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
      .withColumn("n2", ldot(emb.sparkSession)(col("q"), col("q")))
    val two = g.select(col("vec_id"), col("neighbor_id").as("mid"))
      .join(g.select(col("vec_id").as("mid"), col("neighbor_id")), Seq("mid"))
      .select(col("vec_id"), col("neighbor_id"))
      .filter(col("vec_id") =!= col("neighbor_id"))
    // One exchange serves candidate dedup AND the top-k window (§2.4):
    // hash-partitioning by vec_id colocates every (vec_id, neighbor_id)
    // pair, so the distinct's ClusteredDistribution is satisfied with NO
    // exchange of its own, and the window below — also keyed on vec_id —
    // reuses the same partitioning. The score joins run corpus-side last
    // (neighbor_id first, vec_id second) so that when they plan as
    // shuffle joins at scale, the stream leaves the LAST join already
    // partitioned by vec_id for the window instead of by neighbor_id.
    // Per-vec_id candidate counts are bounded (topK + fanout²), so the
    // vec_id key cannot skew. Pair set, scores and ranks are unchanged —
    // row_number's (cosq desc, neighbor_id) order is total per vec_id.
    val cand = g.union(two).repartition(col("vec_id")).distinct()
    val scored = cand
      .join(base.select(col("vec_id").as("neighbor_id"), col("q").as("cq"),
        col("n2").as("cn2")), Seq("neighbor_id"))
      .join(base.select(col("vec_id"), col("q").as("qq"), col("n2").as("qn2")), Seq("vec_id"))
      .withColumn("qdot", ldot(emb.sparkSession)(col("qq"), col("cq")))
      .withColumn("cosq", col("qdot").cast(DoubleType) /
        (sqrt(col("qn2").cast(DoubleType)) * sqrt(col("cn2").cast(DoubleType))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .join(g.withColumn("in_base", lit(true)), Seq("vec_id", "neighbor_id"), "left")
      .select(col("vec_id"), col("rk").cast(LongType).as("rk"),
        col("neighbor_id"), col("qdot"),
        col("in_base").isNull.as("is_new"))
  }

  /** e41's core: grid-density clustering over pre-gridded points
    * (vec_id, gx, gy) — cells with ≥ `minPts` points are core, core
    * cells connect through the 8-neighborhood by `rounds` rounds of
    * min-label propagation. Returns one row per OCCUPIED cell:
    * (gx, gy, cnt, is_core, cluster, cluster_points). */
  private[graft] def gridDensityClusters(pts: DataFrame, minPts: Int,
      rounds: Int): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val cells = pts.groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("cnt"))
    val core = cells.filter(col("cnt") >= minPts)
      .withColumn("lbl", col("gx") * 100000 + col("gy"))
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
      (1, -1), (1, 0), (1, 1)).toDF("dx", "dy")
    var cur = core
    for (_ <- 1 to rounds) {
      val nb = cur.select(col("gx"), col("gy"), col("lbl"))
        .crossJoin(broadcast(offs))
        .select((col("gx") + col("dx")).as("gx"),
          (col("gy") + col("dy")).as("gy"), col("lbl"))
      // cut: round r's labels back round r+1's self and neighbor sides
      cur = graft.operators.Lineage.cut(cur.select(col("gx"), col("gy"), col("cnt"))
        .join(nb, Seq("gx", "gy"))
        .groupBy(col("gx"), col("gy"), col("cnt"))
        .agg(min(col("lbl")).as("lbl")))
    }
    val cs = cur.groupBy(col("lbl")).agg(sum(col("cnt")).as("cluster_points"))
    cells.join(cur.select(col("gx"), col("gy"), col("lbl").as("cluster")),
        Seq("gx", "gy"), "left")
      .join(cs.withColumnRenamed("lbl", "cluster"), Seq("cluster"), "left")
      .select(col("gx"), col("gy"), col("cnt"),
        (col("cnt") >= minPts).as("is_core"), col("cluster"), col("cluster_points"))
  }

  /** d54's a-priori body over an exploded (doc_id, w) item frame with
    * relative support thresholds. Pruning is LOSSLESS: every triple
    * above `minSet` support has all items above it and all sub-pairs
    * above it (anti-monotonicity), so the result equals brute-force
    * triple counting — the spec pins that. */
  private[graft] def frequentTriples(dt0: DataFrame, minItem: Double,
      minSet: Double): DataFrame = {
    // cut: the caller's tokenize+explode stream is read by the document
    // count, the item counts AND the kept join — and the 1-row count is
    // itself broadcast into four thresholds — so uncut the corpus
    // tokenization replayed NINE times (d54's plan: 9 full text scans)
    val dt = graft.operators.Lineage.cut(dt0)
    val nd = graft.operators.Lineage.cut(
      dt.agg(countDistinct(col("doc_id")).as("nd")))
    val f1 = dt.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .crossJoin(broadcast(nd))
      .filter(col("c1") * lit(1.0) >= lit(minItem) * col("nd")).select(col("w"))
    // cut: the frequent-item-filtered stream backs both pair sides and
    // the triple extension; the pair stream backs f2 and the extension
    val kept = graft.operators.Lineage.cut(dt.join(broadcast(f1), Seq("w")))
    val p = graft.operators.Lineage.cut(kept.as("a").join(kept.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .select(col("a.doc_id").as("doc_id"), col("a.w").as("w1"), col("b.w").as("w2")))
    val f2 = p.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .crossJoin(broadcast(nd))
      .filter(col("c2") * lit(1.0) >= lit(minSet) * col("nd"))
      .select(col("w1"), col("w2"))
    val ext = p.join(broadcast(f2), Seq("w1", "w2"))
      .join(kept.select(col("doc_id").as("doc_id3"), col("w").as("w3")),
        col("doc_id3") === col("doc_id") && col("w3") > col("w2"))
      .select(col("doc_id"), col("w1"), col("w2"), col("w3"))
    val cand = ext
      .join(broadcast(f2.select(col("w1"), col("w2").as("w3"))), Seq("w1", "w3"), "left_semi")
      .join(broadcast(f2.select(col("w1").as("w2"), col("w2").as("w3"))), Seq("w2", "w3"), "left_semi")
    cand.groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nd))
      .filter(col("support") * lit(1.0) >= lit(minSet) * col("nd"))
      .select(col("w1"), col("w2"), col("w3"), col("support"))
  }

  /** d55's body over any (doc_id, text) frame: boundary k-grams,
    * df-capped md5 equi-join. */
  private[graft] def continuationPairs(docs: DataFrame, k: Int,
      maxDf: Int): DataFrame = {
    val t = docs.withColumn("ws", split(col("text"), "\\s+"))
      .filter(size(col("ws")) >= k)
    val tails = t.select(col("doc_id").as("a"),
      md5(expr(s"array_join(slice(ws, -$k, $k), ' ')")).as("gkey"))
    val heads = t.select(col("doc_id").as("b"),
      md5(expr(s"array_join(slice(ws, 1, $k), ' ')")).as("gkey"))
    val hot = tails.groupBy(col("gkey")).agg(count(lit(1)).as("ta"))
      .join(heads.groupBy(col("gkey")).agg(count(lit(1)).as("hb")), Seq("gkey"))
      .filter(col("ta") > maxDf || col("hb") > maxDf)
      .select(col("gkey"))
    val nPruned = hot.agg(count(lit(1)).as("n_pruned_keys"))
    val pairs = tails.join(broadcast(hot), Seq("gkey"), "left_anti")
      .join(heads.join(broadcast(hot), Seq("gkey"), "left_anti"), Seq("gkey"))
      .filter(col("a") =!= col("b"))
    pairs.select(col("a"), col("b")).crossJoin(broadcast(nPruned))
  }

  /** d56's body over a (fp, source) frame: per-fingerprint source
    * histogram → arithmetic pair counts (no pair expansion). */
  private[graft] def dupMatrix(fps: DataFrame): DataFrame = {
    val fp = fps.groupBy(col("fp"), col("source")).agg(count(lit(1)).as("n"))
    val fx = fp.select(col("fp"), col("source").as("src_a"), col("n").as("na"))
    val fy = fp.select(col("fp"), col("source").as("src_b"), col("n").as("nb"))
    val m = fx.join(fy, Seq("fp")).filter(col("src_a") <= col("src_b"))
      .select(col("src_a"), col("src_b"),
        when(col("src_a") === col("src_b"),
          expr("(na * (na - 1)) div 2"))
          .otherwise(col("na") * col("nb")).as("p"))
    m.groupBy(col("src_a"), col("src_b")).agg(sum(col("p")).as("n_pairs"))
      .filter(col("n_pairs") > 0)
  }

  /** q131's body over a (day, user_id) activity frame (need not be
    * distinct). */
  private[graft] def stickiness(userDays: DataFrame): DataFrame = {
    val ud = userDays.select(col("day"), col("user_id")).distinct()
    val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    dau.join(wau, Seq("day")).crossJoin(broadcast(bounds))
      .filter(col("day") >= col("d0") + 6 && col("day") <= col("d1"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast(DoubleType) / col("wau")).as("stickiness"))
  }

  /** d53's body over any (doc_id, text) frame, factored for planted-
    * corpus specs. */
  private[graft] def cooccurrencePmi(docs: DataFrame, minCount: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), expr("filter(split(text, '\\\\s+'), w -> w <> '')").as("ws"))
    val unig = toks.select(explode(col("ws")).as("w"))
    val uni = unig.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val nt = unig.agg(count(lit(1)).as("nt"))
    val pos = toks
      .select(col("ws"), explode(expr("sequence(1, 5)")).as("o"))
      .filter(size(col("ws")) > col("o"))
      .select(col("ws"), col("o"), explode(expr("sequence(1, size(ws) - o)")).as("i"))
      .select(
        least(element_at(col("ws"), col("i")),
          element_at(col("ws"), col("i") + col("o"))).as("w1"),
        greatest(element_at(col("ws"), col("i")),
          element_at(col("ws"), col("i") + col("o"))).as("w2"))
    val np = pos.agg(count(lit(1)).as("np"))
    val cp = pos.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    cp.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "ca")), "w1")
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("cw", "cb")), "w2")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(np))
      .select(col("w1"), col("w2"), col("c_ab"),
        (round(log((col("c_ab") * lit(1.0) * col("nt") * col("nt")) /
          (col("ca") * lit(1.0) * col("cb") * col("np"))), 4) + lit(0.0)).as("pmi"))
  }

  /** q128's unrolled peel rounds: d{r} = degrees of the edge set
    * entering round r, a{r} = nodes with d{r}.c >= k, s{r} = edges
    * among a{r}. */
  /** The e28 kNN-graph derivation (signatures → multiprobe buckets →
    * quantized dots → per-node top-3) as a WITH-body ending in a `knn`
    * CTE — shared by the e28 and e29 oracles (the kmeansCtes
    * precedent). */
  private def knnGraphCtes: String =
    s"""planes(p, d, wt) AS (VALUES ${PipelineQueries.lshPlanesValues(8, 64)}),
       |emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |        list_transform(CAST(embedding AS DOUBLE[]),
       |                       v -> CAST(floor(v * 1024) AS BIGINT)) AS q
       |      FROM embeddings),
       |n2 AS (SELECT vec_id, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
       |       FROM emb),
       |un AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS d, e[CAST(t.i AS INT)] AS v
       |       FROM emb, range(1, 65) t(i)),
       |bits AS (SELECT un.vec_id, planes.p,
       |    CASE WHEN sum(planes.wt * CAST(floor(un.v * 1024) AS BIGINT)) > 0 THEN 1 ELSE 0 END AS b
       |  FROM un JOIN planes ON un.d = planes.d GROUP BY un.vec_id, planes.p),
       |sig AS MATERIALIZED (SELECT vec_id, CAST(sum(b << p) AS INT) AS s FROM bits GROUP BY vec_id),
       |sigc AS (SELECT vec_id, s FROM sig JOIN n2 USING (vec_id)
       |         WHERE n2.n2 > 0
       |         QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= 4096),
       |masks(m) AS (VALUES (0), (1), (2), (4), (8), (16), (32), (64), (128)),
       |probes AS (SELECT sig.vec_id, xor(sig.s, masks.m) AS bucket FROM sig CROSS JOIN masks),
       |cand AS MATERIALIZED (SELECT p.vec_id, c.vec_id AS neighbor_id
       |        FROM probes p JOIN sigc c ON p.bucket = c.s
       |        WHERE p.vec_id <> c.vec_id),
       |dot AS (SELECT cand.vec_id, cand.neighbor_id,
       |        CAST(list_sum(list_transform(range(1, 65),
       |          i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot
       |      FROM cand JOIN emb a ON cand.vec_id = a.vec_id
       |                JOIN emb b ON cand.neighbor_id = b.vec_id),
       |scored AS (SELECT dot.vec_id, dot.neighbor_id, dot.qdot,
       |        CAST(dot.qdot AS DOUBLE) /
       |          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosq
       |      FROM dot JOIN n2 na ON dot.vec_id = na.vec_id
       |                JOIN n2 nb ON dot.neighbor_id = nb.vec_id
       |      WHERE na.n2 > 0 AND nb.n2 > 0),
       |knn AS MATERIALIZED (SELECT vec_id,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) AS rk,
       |    neighbor_id, qdot
       |  FROM scored
       |  QUALIFY rk <= 3)""".stripMargin

  /** e29's two label-propagation rounds as a WITH-body ending in a
    * `lab(vec_id, label, rnd)` CTE over the `knn` chain — shared by the
    * e29 and q143 oracles (the knnGraphCtes precedent). */
  private def labelPropCtes: String =
    s"""seeds AS (SELECT vec_id, label FROM embeddings WHERE vec_id % 3 <> 0),
       |v1 AS (SELECT k.vec_id, s2.label, count(*) AS c
       |       FROM knn k JOIN seeds s2 ON k.neighbor_id = s2.vec_id
       |       WHERE k.vec_id % 3 = 0 GROUP BY 1, 2),
       |n1 AS (SELECT vec_id, label FROM v1
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, label) = 1),
       |l1 AS (SELECT vec_id, label, 0 AS rnd FROM seeds
       |       UNION ALL SELECT vec_id, label, 1 FROM n1),
       |v2 AS (SELECT k.vec_id, l.label, count(*) AS c
       |       FROM knn k JOIN l1 l ON k.neighbor_id = l.vec_id
       |       WHERE k.vec_id NOT IN (SELECT vec_id FROM l1) GROUP BY 1, 2),
       |n2b AS (SELECT vec_id, label FROM v2
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, label) = 1),
       |lab AS (SELECT * FROM l1 UNION ALL SELECT vec_id, label, 2 FROM n2b)""".stripMargin

  /** e41's unrolled min-label propagation rounds over the core-cell
    * 8-neighborhood: r{k} = per-cell min of r{k-1} labels across the
    * 9 offsets (self included). */
  private def gridDensityRounds(rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "core0" else s"r${r - 1}"
      s"""r$r AS (SELECT c.gx, c.gy, c.cnt, min(n.lbl) AS lbl
         |  FROM core0 c CROSS JOIN offs o
         |  JOIN $prev n ON n.gx = c.gx + o.dx AND n.gy = c.gy + o.dy
         |  GROUP BY c.gx, c.gy, c.cnt)""".stripMargin
    }.mkString(",\n")

  /** e31's scored-candidate CTE pair: `$out` = (qid, node, qdot, cosq)
    * for candidate set `$src` (a (qid, node) CTE). */
  private def gsScore(src: String, out: String): String =
    s"""${out}p AS (SELECT c.qid, c.node,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot,
       |    na.n2 AS na2, nb.n2 AS nb2
       |  FROM $src c JOIN emb a ON c.qid = a.vec_id JOIN emb b ON c.node = b.vec_id
       |  JOIN n2 na ON c.qid = na.vec_id JOIN n2 nb ON c.node = nb.vec_id),
       |$out AS (SELECT qid, node, qdot,
       |    CAST(qdot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) AS cosq
       |  FROM ${out}p)""".stripMargin

  /** e31's unrolled beam-search rounds over the knn CTE chain. */
  private def graphSearchRounds(rounds: Int, beam: Int): String =
    (1 to rounds).map { r =>
      s"""ex$r AS (SELECT DISTINCT f.qid, ed.neighbor_id AS node
         |  FROM f${r - 1} f JOIN gedges ed ON f.node = ed.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1} v
         |                    WHERE v.qid = f.qid AND v.node = ed.neighbor_id)),
         |${gsScore(s"ex$r", s"sc$r")},
         |k$r AS (SELECT qid, node, qdot, cosq FROM sc$r
         |        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosq DESC, node) <= $beam),
         |f$r AS (SELECT qid, node FROM k$r),
         |v$r AS (SELECT * FROM v${r - 1} UNION ALL SELECT * FROM k$r)""".stripMargin
    }.mkString(",\n")

  private def kcoreRounds(k: Int, rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "sym" else s"s${r - 1}"
      s"""d$r AS (SELECT s, count(*) AS c FROM $prev GROUP BY s),
         |a$r AS (SELECT s FROM d$r WHERE c >= $k),
         |s$r AS MATERIALIZED (SELECT $prev.s, $prev.t FROM $prev
         |  JOIN a$r x ON $prev.s = x.s JOIN a$r y ON $prev.t = y.s)""".stripMargin
    }.mkString(",\n")

  /** e33's unrolled farthest-first rounds: cN = the N-th chosen center
    * (argmax of the running min-distance dN-1, ties to the lowest
    * vec_id), dN = elementwise least of the previous distances and the
    * distance to cN. Pure BIGINT quantized arithmetic throughout. */
  private def kcenterCtes(k: Int): String = {
    def d2(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, 65), i -> ($a.q[CAST(i AS INT)] - $b.q[CAST(i AS INT)]) * ($a.q[CAST(i AS INT)] - $b.q[CAST(i AS INT)]))) AS BIGINT)"
    val head =
      s"""qv AS MATERIALIZED (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |        v -> CAST(floor(v * 1024) AS BIGINT)) AS q FROM embeddings),
         |c1 AS (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT qv.vec_id, ${d2("qv", "c")} AS md FROM qv CROSS JOIN c1 c)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""c$r AS (SELECT d.vec_id, qv.q, d.md FROM d${r - 1} d JOIN qv ON d.vec_id = qv.vec_id
         |  ORDER BY d.md DESC, d.vec_id LIMIT 1),
         |d$r AS (SELECT d.vec_id, least(d.md, ${d2("qv", "c")}) AS md
         |  FROM d${r - 1} d JOIN qv ON d.vec_id = qv.vec_id CROSS JOIN c$r c)""".stripMargin
    }
    val centers = (1 to k).map { r =>
      val dist = if (r == 1) "CAST(0 AS BIGINT)" else "md"
      s"SELECT CAST($r AS BIGINT) AS rank, vec_id AS center_vec_id, $dist AS dist2 FROM c$r"
    }
    (Seq(head) ++ rounds).mkString(",\n") +
      s",\npicks AS (${centers.mkString("\nUNION ALL\n")})"
  }

  /** e36's oracle body (a standalone SELECT) — exposed so e45's
    * index-family comparison can embed it as a subquery. */
  private[queries] def e36OracleSql: String =
    s"""WITH cents(cell, dim, cv) AS (VALUES ${PipelineQueries.ivfCentroidValues(16, 64)}),
       |emb AS MATERIALIZED (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |        v -> CAST(floor(v * 1024) AS BIGINT)) AS q FROM embeddings),
       |n2 AS (SELECT vec_id, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2 FROM emb),
       |un AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS dim, q[CAST(t.i AS INT)] AS qd
       |       FROM emb, range(1, 65) t(i)),
       |d2 AS (SELECT un.vec_id, cents.cell, sum((un.qd - cents.cv) * (un.qd - cents.cv)) AS d2
       |       FROM un JOIN cents ON un.dim = cents.dim GROUP BY 1, 2),
       |assign AS (SELECT vec_id AS cid, cell FROM d2
       |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
       |qcells AS (SELECT vec_id AS qid, cell,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS cr
       |           FROM d2 WHERE vec_id < 8 QUALIFY cr <= 4),
       |probes(nprobe) AS (VALUES (1), (2), (4)),
       |cand AS MATERIALIZED (SELECT probes.nprobe, qcells.qid, assign.cid
       |        FROM qcells JOIN probes ON qcells.cr <= probes.nprobe
       |        JOIN assign ON qcells.cell = assign.cell),
       |sc AS (SELECT cand.nprobe, cand.qid, cand.cid,
       |         CAST(list_sum(list_transform(range(1, 65),
       |           i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot,
       |         na.n2 AS na, nb.n2 AS nb
       |       FROM cand JOIN emb a ON cand.qid = a.vec_id JOIN emb b ON cand.cid = b.vec_id
       |       JOIN n2 na ON cand.qid = na.vec_id JOIN n2 nb ON cand.cid = nb.vec_id),
       |top5 AS (SELECT nprobe, qid, cid FROM (
       |    SELECT nprobe, qid, cid,
       |      CAST(qdot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosq
       |    FROM sc) t
       |  QUALIFY row_number() OVER (PARTITION BY nprobe, qid ORDER BY cosq DESC, cid) <= 5),
       |ex AS (SELECT qv.vec_id AS qid, c.vec_id AS cid,
       |         CAST(list_sum(list_transform(range(1, 65),
       |           i -> qv.q[CAST(i AS INT)] * c.q[CAST(i AS INT)])) AS BIGINT) AS qdot,
       |         na.n2 AS na, nb.n2 AS nb
       |       FROM emb qv JOIN emb c ON qv.vec_id < 8
       |       JOIN n2 na ON qv.vec_id = na.vec_id JOIN n2 nb ON c.vec_id = nb.vec_id),
       |exact AS (SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      CAST(qdot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosq
       |    FROM ex) t
       |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosq DESC, cid) <= 5),
       |hits AS (SELECT top5.nprobe, count(*) AS hits FROM top5
       |         JOIN exact ON top5.qid = exact.qid AND top5.cid = exact.cid GROUP BY 1),
       |nc AS (SELECT nprobe, count(*) AS total_cand FROM cand GROUP BY 1),
       |nqq AS (SELECT count(DISTINCT qid) AS n_queries FROM qcells)
       |SELECT nc.nprobe, nc.total_cand, CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
       |  round(coalesce(hits.hits, 0) * 1.0 / (5 * nqq.n_queries), 4) AS recall_at_5
       |FROM nc LEFT JOIN hits ON nc.nprobe = hits.nprobe CROSS JOIN nqq
       |ORDER BY nc.nprobe""".stripMargin

  /** The eXXs sliced-twin oracles are DERIVED from the full queries'
    * own oracle strings (every `FROM embeddings` source becomes the
    * pinned id-prefix slice) — same one-source-of-truth guarantee as
    * PipelineQueries' dXXs twins. The kNN-graph oracles are
    * resource-infeasible at sf10 on the full 200k-vector corpus; the
    * twin carries the oracle-semantics evidence there (the full rows
    * keep their dual-topology bytediff mode). */
  lazy val oracle: Map[String, String] = oracleBase ++ Seq(
    // third element = `FROM embeddings` reference count in the base
    // oracle (TwinSql pins it — see PipelineQueries)
    ("e28s_knn_graph_sliced", "e28_knn_graph", 1),
    ("e29s_label_prop_sliced", "e29_label_prop", 3),
    ("e39s_hubness_sliced", "e39_hubness", 1),
    ("e43s_incremental_knn_sliced", "e43_incremental_knn", 2),
    ("e44s_knn_deletion_sliced", "e44_knn_deletion", 1),
    ("e30s_triplet_mining_sliced", "e30_triplet_mining", 2),
    ("e31s_graph_search_sliced", "e31_graph_search", 1),
    ("e34s_knn_outliers_sliced", "e34_knn_outliers", 1),
    ("e38s_mutual_nn_sliced", "e38_mutual_nn", 1),
    ("e40s_nn_descent_sliced", "e40_nn_descent", 1),
    ("e42s_graph_recall_sliced", "e42_graph_recall", 1),
    ("e47s_nn_descent_reverse_sliced", "e47_nn_descent_reverse", 1),
    ("q143s_modularity_sliced", "q143_modularity", 2)).map {
    case (twin, full, n) => twin -> TwinSql.subst(twin, oracleBase(full),
      "FROM embeddings", s"FROM (SELECT * FROM embeddings WHERE vec_id < $VecSliceBound)", n)
  } ++ Seq(
    // the lineitem-graph twins: the co-purchase graph restricted to
    // l_suppkey < SuppSliceBound (the q77s slice)
    "q128s_kcore_sliced" -> "q128_kcore",
    "q138s_hyperball_sliced" -> "q138_hyperball").map {
    case (twin, full) => twin -> TwinSql.subst(twin, oracleBase(full),
      "FROM lineitem",
      s"FROM (SELECT * FROM lineitem WHERE l_suppkey < ${ExtendedQueries.SuppSliceBound})")
  }

  /** Constant id-prefix bound for the eXXs twins: 10k vectors — half
    * the sf1 corpus, where every kNN oracle is proven feasible. At
    * SF ≤ 0.1 it covers every vector, so twin ≡ full query there. */
  private[queries] val VecSliceBound = 10000L

  private def slicedEmb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < VecSliceBound)

  /** Lineitem restricted to l_suppkey < SuppSliceBound — the q77s graph
    * slice, shared by the q128s/q138s twins. */
  private def slicedLineitem(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_suppkey") < ExtendedQueries.SuppSliceBound)

  private def e30Body(emb: DataFrame): DataFrame = {
      val labels = emb.select(col("vec_id"), col("label"))
      // cut: the labeled candidate set backs BOTH argmax branches (hard
      // positive and hard negative) — uncut, the whole LSH bucket join +
      // scoring + label joins evaluated twice
      val c = graft.operators.Lineage.cut(knnCandidatesQuantized(emb)
        .join(labels.select(col("vec_id"), col("label").as("a_label")), Seq("vec_id"))
        .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")),
          Seq("neighbor_id")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
      def argmax(f: DataFrame, idName: String, dotName: String) =
        f.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("vec_id"), col("neighbor_id").as(idName), col("qdot").as(dotName))
      val pos = argmax(c.filter(col("n_label") === col("a_label")), "pos_id", "pos_qdot")
      val neg = argmax(c.filter(col("n_label") =!= col("a_label")), "neg_id", "neg_qdot")
      labels.join(pos, Seq("vec_id"), "left").join(neg, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"), col("pos_id"), col("pos_qdot"),
          col("neg_id"), col("neg_qdot"))
        .orderBy(col("vec_id"))
    }

  private def e31Body(emb0: DataFrame): DataFrame = {
    val s = emb0.sparkSession
    val emb = emb0.select(col("vec_id"), col("embedding"), col("label"))
      // cut: the quantized corpus projection is read by every beam
      // round's scoring join plus the query/entry derivations — uncut,
      // each reference re-scanned the parquet AND re-ran the
      // quantization transform + norm per row (21 corpus scans in the
      // executed plan chain; 4 of them full score passes)
      val base = graft.operators.Lineage.cut(emb.select(col("vec_id"),
          expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
        .withColumn("n2", ldot(s)(col("q"), col("q"))))
      // cut: the kNN graph is walked by every beam round — build it once
      val edges = graft.operators.Lineage.cut(knnGraphQuantized(emb, topK = 3)
        .select(col("vec_id").as("node"), col("neighbor_id")))
      val qs = base.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
      val entry = base.agg(min(col("vec_id")).as("node"))
      def score(cand: DataFrame): DataFrame = cand
        .join(qs, Seq("qid"))
        .join(base.select(col("vec_id").as("node"), col("q").as("cq"), col("n2").as("cn2")),
          Seq("node"))
        .withColumn("qdot", ldot(s)(col("qq"), col("cq")))
        .withColumn("cosq", col("qdot").cast(DoubleType) /
          (sqrt(col("qn2").cast(DoubleType)) * sqrt(col("cn2").cast(DoubleType))))
        .select(col("qid"), col("node"), col("qdot"), col("cosq"))
      val beamW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cosq").desc, col("node"))
      var frontier = qs.select(col("qid")).crossJoin(broadcast(entry))
      var visited = score(frontier)
      for (_ <- 1 to 3) {
        val expanded = frontier.join(edges, Seq("node"))
          .select(col("qid"), col("neighbor_id").as("node")).distinct()
          .join(visited.select(col("qid"), col("node")), Seq("qid", "node"), "left_anti")
        // cut: each round's survivors seed the next frontier AND the
        // visited set — without it round r replays rounds 1..r-1's scoring
        val kept = graft.operators.Lineage.cut(score(expanded)
          .withColumn("rn", row_number().over(beamW)).filter(col("rn") <= 4)
          .drop("rn"))
        frontier = kept.select(col("qid"), col("node"))
        visited = graft.operators.Lineage.cut(visited.union(kept))
      }
      visited.filter(col("node") =!= col("qid"))
        .withColumn("rk", row_number().over(beamW)).filter(col("rk") <= 3)
        .select(col("qid"), col("rk").cast(LongType).as("rk"), col("node"), col("qdot"))
        .orderBy(col("qid"), col("rk"))
    }

  private def e34Body(emb: DataFrame): DataFrame = {
      // cut: the candidate stage feeds the per-vector count AND the
      // kth-neighbor window — uncut, the LSH bucket join + scoring ran twice
      val cand = graft.operators.Lineage.cut(
        knnCandidatesQuantized(emb.select(col("vec_id"), col("embedding"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
      val agg = cand.groupBy(col("vec_id")).agg(count(lit(1)).as("n_cand"))
      val kth = cand.withColumn("rk", row_number().over(w)).filter(col("rk") === 3)
        .select(col("vec_id"), col("neighbor_id").as("kth_neighbor_id"),
          col("qdot").as("kth_qdot"))
      emb.select(col("vec_id"))
        .join(agg, Seq("vec_id"), "left")
        .join(kth, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          col("kth_neighbor_id"), col("kth_qdot"))
        .orderBy(col("vec_id"))
    }

  private def e38Body(emb: DataFrame): DataFrame = {
    // cut: the kNN graph build backs both self-join sides
    val knn = graft.operators.Lineage.cut(knnGraphQuantized(
      emb.select(col("vec_id"), col("embedding")), topK = 3))
      val t1 = knn.filter(col("rk") === 1)
        .select(col("vec_id").as("a"), col("neighbor_id").as("b"), col("qdot"))
      t1.as("x").join(t1.as("y"),
          col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
            col("x.a") < col("x.b"))
        .select(col("x.a").as("a"), col("x.b").as("b"), col("x.qdot").as("qdot"))
        .orderBy(col("a"))
    }

  private def e40Body(emb: DataFrame): DataFrame = {
      val g = knnGraphQuantized(emb.select(col("vec_id"), col("embedding")), topK = 3)
        .select(col("vec_id"), col("neighbor_id"))
      nnDescentRound(g, emb.select(col("vec_id"), col("embedding")), topK = 3)
        .orderBy(col("vec_id"), col("rk"))
    }

  private def e42Body(emb0: DataFrame): DataFrame = {
    val s = emb0.sparkSession
    val emb = emb0.select(col("vec_id"), col("embedding"))
    val base = emb.select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
      .withColumn("n2", ldot(s)(col("q"), col("q")))
    val pr = base.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("q").as("qq"), col("n2").as("qn2"))
    def score(df: DataFrame): DataFrame = df
      .withColumn("qdot", ldot(s)(col("qq"), col("cq")))
      .withColumn("cosq", col("qdot").cast(DoubleType) /
        (sqrt(col("qn2").cast(DoubleType)) * sqrt(col("cn2").cast(DoubleType))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("cid"))
    val exact = score(base
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))
        .crossJoin(broadcast(pr))
        .filter(col("cid") =!= col("vec_id")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("cid"))
    // cut: the LSH graph backs the probe edges, the two-hop join, and
    // the hit check
    val g = graft.operators.Lineage.cut(
      knnGraphQuantized(emb.select(col("vec_id"), col("embedding")), topK = 3)
        .select(col("vec_id"), col("neighbor_id")))
    val gp = g.filter(col("vec_id") < 8)
    val two = gp.select(col("vec_id"), col("neighbor_id").as("mid"))
      .join(g.select(col("vec_id").as("mid"), col("neighbor_id")), Seq("mid"))
      .select(col("vec_id"), col("neighbor_id"))
      .filter(col("vec_id") =!= col("neighbor_id"))
    val refined = score(gp.union(two).distinct()
        .select(col("vec_id"), col("neighbor_id").as("cid"))
        .join(broadcast(pr), Seq("vec_id"))
        .join(base.select(col("vec_id").as("cid"), col("q").as("cq"),
          col("n2").as("cn2")), Seq("cid")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("cid"))
    val hb = gp.withColumnRenamed("neighbor_id", "cid")
      .join(exact, Seq("vec_id", "cid"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("hits_base"))
    val hr = refined.join(exact, Seq("vec_id", "cid"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("hits_refined"))
    pr.select(col("vec_id"))
      .join(hb, Seq("vec_id"), "left").join(hr, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("hits_base"), lit(0L)).as("hits_base"),
        coalesce(col("hits_refined"), lit(0L)).as("hits_refined"))
      .withColumn("recall_base", round(col("hits_base") * lit(1.0) / 3, 4))
      .withColumn("recall_refined", round(col("hits_refined") * lit(1.0) / 3, 4))
      .orderBy(col("vec_id"))
  }

  private def e47Body(emb: DataFrame): DataFrame = {
    // cut: the graph backs both union directions of the generalized
    // neighborhood
    val g = graft.operators.Lineage.cut(
      knnGraphQuantized(emb.select(col("vec_id"), col("embedding")), topK = 3)
        .select(col("vec_id"), col("neighbor_id")))
    val gen = g.union(
        g.select(col("neighbor_id").as("vec_id"), col("vec_id").as("neighbor_id")))
      .distinct()
    nnDescentRound(gen, emb.select(col("vec_id"), col("embedding")), topK = 3)
      .orderBy(col("vec_id"), col("rk"))
  }

  private def q128Body(line: DataFrame): DataFrame = {
    val li = line
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    // cut: the self-join feeds both union directions (q137 rule) — q128
    // was the one co-purchase query WITHOUT it, so materializing sym
    // inside KCore.peel evaluated the self-join + pair distinct twice
    val e = graft.operators.Lineage.cut(li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct())
    val sym = e.select(col("pa").as("s"), col("pb").as("t"))
      .union(e.select(col("pb"), col("pa")))
    graft.operators.KCore.peel(sym, k = 90, rounds = 4)
      .select(col("node").as("p_partkey"), col("in_core"), col("deg_final"))
      .orderBy(col("p_partkey"))
  }

  private def q138Body(line: DataFrame): DataFrame = {
    val li = line
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // cut: the co-purchase self-join feeds every register round (q137 rule)
      val e = graft.operators.Lineage.cut(
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("pa"), col("b.pk").as("pb")).distinct())
      val sym = e.select(col("pa").as("es"), col("pb").as("et"))
        .union(e.select(col("pb"), col("pa")))
      hyperballEstimates(sym, rounds = 2, k = 32).orderBy(col("node"))
    }

  private def q143Body(emb: DataFrame): DataFrame = {
      // cut: the kNN graph build (LSH multiprobe + scoring) is the
      // expensive producer and is referenced by every labelProp round
      // plus both modularity terms — materialize it once
      val g = graft.operators.Lineage.cut(
        knnGraphQuantized(emb.select(col("vec_id"), col("embedding")), topK = 3)
          .select(col("vec_id"), col("neighbor_id")))
      val lbl = labelProp(
        emb.select(col("vec_id"), col("label"))
          .withColumn("label",
            when(col("vec_id") % 3 === 0, lit(null)).otherwise(col("label"))),
        g, rounds = 2)
        .filter(col("label").isNotNull).select(col("vec_id"), col("label"))
      modularityByCommunity(g, graft.operators.Lineage.cut(lbl))
        .orderBy(col("label"))
    }


  // ---- shared bodies for each full query + its eXXs sliced twin (the
  // Spark-side no-drift guarantee matching the derived oracle) --------

  private def e28Body(emb: DataFrame): DataFrame =
    knnGraphQuantized(emb, topK = 3).orderBy(col("vec_id"), col("rk"))

  private def e29Body(emb: DataFrame): DataFrame =
    labelProp(emb.select(col("vec_id"), col("label"))
        .withColumn("label", when(col("vec_id") % 3 === 0, lit(null)).otherwise(col("label"))),
      // cut: every propagation round joins the same graph
      graft.operators.Lineage.cut(
        knnGraphQuantized(emb, topK = 3).select(col("vec_id"), col("neighbor_id"))),
      rounds = 2)
      .orderBy(col("vec_id"))

  private def e39Body(emb: DataFrame): DataFrame = {
    val knn = knnGraphQuantized(emb.select(col("vec_id"), col("embedding")), topK = 3)
    val ind = knn.groupBy(col("neighbor_id")).agg(count(lit(1)).as("in_deg"))
    val all = emb.select(col("vec_id"))
      .join(ind.withColumnRenamed("neighbor_id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("in_deg", coalesce(col("in_deg"), lit(0L)))
    val stats = all.agg(max(col("in_deg")).as("max_in_deg"),
      sum(when(col("in_deg") === 0, 1L).otherwise(0L)).as("n_orphans"))
    all.crossJoin(broadcast(stats))
      .select(col("vec_id"), col("in_deg"), col("max_in_deg"), col("n_orphans"))
      .orderBy(col("vec_id"))
  }

  private def e43Body(emb0: DataFrame): DataFrame = {
    val s = emb0.sparkSession
    val emb = emb0.select(col("vec_id"), col("embedding"))
    val newEmb = emb.filter(col("vec_id") % 10 === 0)
    val oldEmb = emb.filter(col("vec_id") % 10 =!= 0)
    // cut: the old graph backs the update-scoring join AND the
    // is_new_edge probe; c2's candidates back both the re-rank and
    // the affected-node filter
    val gOld = graft.operators.Lineage.cut(knnGraphQuantized(oldEmb, topK = 3)
      .select(col("vec_id"), col("neighbor_id")))
    val c1 = knnCandidatesBetween(newEmb, emb)
    val c2 = graft.operators.Lineage.cut(knnCandidatesBetween(oldEmb, newEmb))
    val base = emb.select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))").as("q"))
      .withColumn("n2", ldot(s)(col("q"), col("q")))
    val oldScored = gOld.join(c2.select(col("vec_id")).distinct(), Seq("vec_id"))
      .join(base.select(col("vec_id"), col("q").as("qq"), col("n2").as("qn2")), Seq("vec_id"))
      .join(base.select(col("vec_id").as("neighbor_id"), col("q").as("cq"),
        col("n2").as("cn2")), Seq("neighbor_id"))
      .withColumn("qdot", ldot(s)(col("qq"), col("cq")))
      .withColumn("cosq", col("qdot").cast(DoubleType) /
        (sqrt(col("qn2").cast(DoubleType)) * sqrt(col("cn2").cast(DoubleType))))
      .select(col("vec_id"), col("neighbor_id"), col("qdot"), col("cosq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
    def top3(df: DataFrame, status: String) = df
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("rk").cast(LongType).as("rk"),
        col("neighbor_id"), col("qdot"), lit(status).as("status"))
    top3(c1, "insert")
      .union(top3(oldScored.union(c2), "update"))
      .join(gOld.withColumn("had", lit(true)), Seq("vec_id", "neighbor_id"), "left")
      .select(col("vec_id"), col("rk"), col("neighbor_id"), col("qdot"),
        col("status"), col("had").isNull.as("is_new_edge"))
      .orderBy(col("vec_id"), col("rk"))
  }

  private def e44Body(emb0: DataFrame): DataFrame = {
    val emb = emb0.select(col("vec_id"), col("embedding"))
    val remEmb = emb.filter(col("vec_id") % 17 =!= 0)
    // cut: the full graph backs the affected-set filter and the
    // is_new_edge probe
    val gFull = graft.operators.Lineage.cut(knnGraphQuantized(emb, topK = 3)
      .select(col("vec_id"), col("neighbor_id")))
    val affected = gFull.filter(col("neighbor_id") % 17 === 0)
      .filter(col("vec_id") % 17 =!= 0)
      .select(col("vec_id")).distinct()
    val cand = knnCandidatesBetween(remEmb.join(affected, Seq("vec_id")), remEmb)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosq").desc, col("neighbor_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .join(gFull.withColumn("had", lit(true)), Seq("vec_id", "neighbor_id"), "left")
      .select(col("vec_id"), col("rk").cast(LongType).as("rk"),
        col("neighbor_id"), col("qdot"), col("had").isNull.as("is_new_edge"))
      .orderBy(col("vec_id"), col("rk"))
  }

  private val oracleBase: Map[String, String] = Map(
    "q137_neighborhood_function" -> {
      val rounds = (1 to 3).map { r =>
        val prev = if (r == 1) "r0" else s"r${r - 1}"
        s"""r$r AS MATERIALIZED (SELECT DISTINCT seed, node FROM (
           |  SELECT seed, node FROM $prev
           |  UNION ALL
           |  SELECT $prev.seed, sym.t AS node FROM $prev JOIN sym ON $prev.node = sym.s))""".stripMargin
      }.mkString(",\n")
      val counts = (1 to 3).map(r =>
        s"SELECT seed, CAST($r AS BIGINT) AS r, count(*) AS n_reach FROM r$r GROUP BY seed")
        .mkString("\nUNION ALL\n")
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
         |sym AS MATERIALIZED (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
         |seeds AS (SELECT DISTINCT s AS seed FROM sym WHERE s < 100),
         |r0 AS (SELECT seed, seed AS node FROM seeds),
         |$rounds
         |$counts
         |ORDER BY seed, r""".stripMargin
    },

    "e36_ivf_nprobe_sweep" -> e36OracleSql,

    "e46_embedding_space_health" ->
      s"""WITH planes(p, d, wt) AS (VALUES ${PipelineQueries.lshPlanesValues(8, 64)}),
         |emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |un2 AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS d, e[CAST(t.i AS INT)] AS v
         |       FROM emb2, range(1, 65) t(i)),
         |bits2 AS (SELECT un2.vec_id, planes.p,
         |    CASE WHEN sum(planes.wt * CAST(floor(un2.v * 1024) AS BIGINT)) > 0 THEN 1 ELSE 0 END AS b
         |  FROM un2 JOIN planes ON un2.d = planes.d GROUP BY un2.vec_id, planes.p),
         |sig2 AS (SELECT vec_id, CAST(sum(b << p) AS INT) AS s FROM bits2 GROUP BY vec_id),
         |h AS (SELECT s, count(*) AS c FROM sig2 GROUP BY s),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_vectors,
         |               count(*) AS n_occupied, max(c) AS max_bucket FROM h),
         |t AS (SELECT tot.n_vectors, tot.n_occupied, tot.max_bucket,
         |        CAST((c * 1.0 / tot.n_vectors) * log2(c * 1.0 / tot.n_vectors)
         |          AS DECIMAL(18,6)) AS t
         |      FROM h CROSS JOIN tot)
         |SELECT n_vectors, n_occupied, max_bucket,
         |  CAST(-sum(t) AS DOUBLE) AS entropy,
         |  round(CAST(-sum(t) AS DOUBLE) / 8.0, 6) AS balance
         |FROM t GROUP BY n_vectors, n_occupied, max_bucket""".stripMargin,

    "e45_index_sweep" ->
      s"""SELECT 'lsh' AS family, CAST(radius AS BIGINT) AS param,
         |  CAST(n_cand AS BIGINT) AS n_cand, CAST(hits AS BIGINT) AS hits, recall_at_5
         |FROM (${CurationQueries.e25OracleSql})
         |UNION ALL
         |SELECT 'ivf', CAST(nprobe AS BIGINT), CAST(total_cand AS BIGINT),
         |  CAST(hits AS BIGINT), recall_at_5
         |FROM ($e36OracleSql)
         |ORDER BY family, param""".stripMargin,

    "e38_mutual_nn" ->
      s"""WITH $knnGraphCtes,
         |t1 AS (SELECT vec_id AS a, neighbor_id AS b, qdot FROM knn WHERE rk = 1)
         |SELECT x.a, x.b, x.qdot FROM t1 x JOIN t1 y
         |ON x.a = y.b AND x.b = y.a AND x.a < x.b
         |ORDER BY x.a""".stripMargin,

    "e39_hubness" ->
      s"""WITH $knnGraphCtes,
         |ind AS (SELECT neighbor_id, count(*) AS in_deg FROM knn GROUP BY 1),
         |allv AS (SELECT emb.vec_id, coalesce(ind.in_deg, 0) AS in_deg
         |         FROM emb LEFT JOIN ind ON emb.vec_id = ind.neighbor_id),
         |stats AS (SELECT max(in_deg) AS max_in_deg,
         |            CAST(sum(CASE WHEN in_deg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |          FROM allv)
         |SELECT allv.vec_id, allv.in_deg, stats.max_in_deg, stats.n_orphans
         |FROM allv CROSS JOIN stats ORDER BY allv.vec_id""".stripMargin,

    "q141_assortativity" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |sym AS (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT s, count(*) AS dg FROM sym GROUP BY s),
        |ed AS (SELECT ds.dg AS x, dt.dg AS y FROM sym
        |       JOIN deg ds ON sym.s = ds.s JOIN deg dt ON sym.t = dt.s),
        |mo AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
        |         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |       FROM ed)
        |SELECT m AS n_edges_directed,
        |  round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
        |    + 0.0 AS assortativity
        |FROM mo""".stripMargin,

    "q140_degree_profile" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |sym AS (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT s, count(*) AS deg FROM sym GROUP BY s),
        |hist AS (SELECT deg, count(*) AS n_nodes FROM deg GROUP BY deg),
        |stats AS (SELECT count(*) AS n, CAST(sum(deg) AS BIGINT) AS sum_deg,
        |                 max(deg) AS max_deg FROM deg)
        |SELECT hist.deg, hist.n_nodes, stats.n AS n_nodes_total,
        |  sum_deg // 2 AS n_edges, stats.max_deg,
        |  round(stats.sum_deg * 1.0 / stats.n, 4) AS avg_deg
        |FROM hist CROSS JOIN stats ORDER BY hist.deg""".stripMargin,

    // e44's oracle: the remaining-corpus candidate chain, restricted
    // to the nodes whose full-graph top-3 held a tombstoned neighbor.
    "e44_knn_deletion" ->
      s"""WITH $knnGraphCtes,
         |rsig AS (SELECT vec_id, s FROM sig WHERE vec_id % 17 <> 0),
         |rsigc AS (SELECT vec_id, s FROM rsig JOIN n2 USING (vec_id)
         |          WHERE n2.n2 > 0
         |          QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= 4096),
         |aff AS (SELECT DISTINCT vec_id FROM knn
         |        WHERE neighbor_id % 17 = 0 AND vec_id % 17 <> 0),
         |rprobes AS (SELECT rsig.vec_id, xor(rsig.s, masks.m) AS bucket
         |            FROM rsig JOIN aff USING (vec_id) CROSS JOIN masks),
         |rcand AS MATERIALIZED (SELECT p.vec_id, c.vec_id AS neighbor_id
         |        FROM rprobes p JOIN rsigc c ON p.bucket = c.s
         |        WHERE p.vec_id <> c.vec_id),
         |rdot AS (SELECT rcand.vec_id, rcand.neighbor_id,
         |        CAST(list_sum(list_transform(range(1, 65),
         |          i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot
         |      FROM rcand JOIN emb a ON rcand.vec_id = a.vec_id
         |                 JOIN emb b ON rcand.neighbor_id = b.vec_id),
         |rscored AS (SELECT rdot.vec_id, rdot.neighbor_id, rdot.qdot,
         |        CAST(rdot.qdot AS DOUBLE) /
         |          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosq
         |      FROM rdot JOIN n2 na ON rdot.vec_id = na.vec_id
         |                JOIN n2 nb ON rdot.neighbor_id = nb.vec_id
         |      WHERE na.n2 > 0 AND nb.n2 > 0),
         |rknn AS (SELECT vec_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) AS rk,
         |    neighbor_id, qdot
         |  FROM rscored QUALIFY rk <= 3)
         |SELECT r.vec_id, r.rk, r.neighbor_id, r.qdot,
         |  (g.vec_id IS NULL) AS is_new_edge
         |FROM rknn r LEFT JOIN (SELECT vec_id, neighbor_id FROM knn) g
         |  ON r.vec_id = g.vec_id AND r.neighbor_id = g.neighbor_id
         |ORDER BY r.vec_id, r.rk""".stripMargin,

    // e43's oracle is the REBUILD formulation restricted to affected
    // nodes: top-3 of (old top-3 ∪ new-batch candidates) equals the
    // full top-3 because every old candidate outside the old top-3 is
    // dominated by three old-top-3 entries (ties break on neighbor_id
    // both sides). The old-graph chain reuses the full chain's
    // per-vector CTEs (sig/emb/n2 are corpus-membership-independent).
    "e43_incremental_knn" ->
      s"""WITH $knnGraphCtes,
         |osig AS (SELECT vec_id, s FROM sig WHERE vec_id % 10 <> 0),
         |osigc AS (SELECT vec_id, s FROM osig JOIN n2 USING (vec_id)
         |          WHERE n2.n2 > 0
         |          QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= 4096),
         |oprobes AS (SELECT osig.vec_id, xor(osig.s, masks.m) AS bucket
         |            FROM osig CROSS JOIN masks),
         |ocand AS MATERIALIZED (SELECT p.vec_id, c.vec_id AS neighbor_id
         |        FROM oprobes p JOIN osigc c ON p.bucket = c.s
         |        WHERE p.vec_id <> c.vec_id),
         |odot AS (SELECT ocand.vec_id, ocand.neighbor_id,
         |        CAST(list_sum(list_transform(range(1, 65),
         |          i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot
         |      FROM ocand JOIN emb a ON ocand.vec_id = a.vec_id
         |                 JOIN emb b ON ocand.neighbor_id = b.vec_id),
         |oscored AS (SELECT odot.vec_id, odot.neighbor_id,
         |        CAST(odot.qdot AS DOUBLE) /
         |          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosq
         |      FROM odot JOIN n2 na ON odot.vec_id = na.vec_id
         |                JOIN n2 nb ON odot.neighbor_id = nb.vec_id
         |      WHERE na.n2 > 0 AND nb.n2 > 0),
         |oknn AS MATERIALIZED (SELECT vec_id, neighbor_id FROM oscored
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) <= 3),
         |nsigc AS (SELECT vec_id, s FROM sig JOIN n2 USING (vec_id)
         |          WHERE vec_id % 10 = 0 AND n2.n2 > 0
         |          QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= 4096),
         |aff_old AS (SELECT DISTINCT p.vec_id FROM oprobes p
         |            JOIN nsigc c ON p.bucket = c.s WHERE p.vec_id <> c.vec_id),
         |aff AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0
         |        UNION SELECT vec_id FROM aff_old),
         |upd AS (SELECT k.vec_id, k.rk, k.neighbor_id, k.qdot
         |        FROM knn k JOIN aff ON k.vec_id = aff.vec_id)
         |SELECT upd.vec_id, upd.rk, upd.neighbor_id, upd.qdot,
         |  CASE WHEN upd.vec_id % 10 = 0 THEN 'insert' ELSE 'update' END AS status,
         |  (o.vec_id IS NULL) AS is_new_edge
         |FROM upd LEFT JOIN oknn o
         |  ON upd.vec_id = o.vec_id AND upd.neighbor_id = o.neighbor_id
         |ORDER BY upd.vec_id, upd.rk""".stripMargin,

    "e47_nn_descent_reverse" ->
      s"""WITH $knnGraphCtes,
         |ge AS (SELECT vec_id, neighbor_id FROM knn),
         |gen AS MATERIALIZED (SELECT DISTINCT vec_id, neighbor_id FROM (
         |        SELECT vec_id, neighbor_id FROM ge
         |        UNION ALL SELECT neighbor_id, vec_id FROM ge)),
         |two AS (SELECT a.vec_id, b.neighbor_id FROM gen a
         |        JOIN gen b ON a.neighbor_id = b.vec_id
         |        WHERE b.neighbor_id <> a.vec_id),
         |cand2 AS MATERIALIZED (SELECT DISTINCT vec_id, neighbor_id FROM (
         |        SELECT * FROM gen UNION ALL SELECT * FROM two)),
         |dot2 AS (SELECT c.vec_id, c.neighbor_id,
         |        CAST(list_sum(list_transform(range(1, 65),
         |          i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot
         |      FROM cand2 c JOIN emb a ON c.vec_id = a.vec_id
         |                   JOIN emb b ON c.neighbor_id = b.vec_id),
         |sc2 AS (SELECT d2.vec_id, d2.neighbor_id, d2.qdot,
         |        CAST(d2.qdot AS DOUBLE) /
         |          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosq
         |      FROM dot2 d2 JOIN n2 na ON d2.vec_id = na.vec_id
         |                   JOIN n2 nb ON d2.neighbor_id = nb.vec_id
         |      WHERE na.n2 > 0 AND nb.n2 > 0),
         |top2 AS (SELECT vec_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) AS rk,
         |    neighbor_id, qdot
         |  FROM sc2 QUALIFY rk <= 3)
         |SELECT t.vec_id, t.rk, t.neighbor_id, t.qdot,
         |  (gen.vec_id IS NULL) AS is_new
         |FROM top2 t LEFT JOIN gen ON t.vec_id = gen.vec_id
         |                         AND t.neighbor_id = gen.neighbor_id
         |ORDER BY t.vec_id, t.rk""".stripMargin,

    "e42_graph_recall" ->
      s"""WITH $knnGraphCtes,
         |ex AS (SELECT q.vec_id, c.vec_id AS cid,
         |        CAST(list_sum(list_transform(range(1, 65),
         |          i -> q.q[CAST(i AS INT)] * c.q[CAST(i AS INT)])) AS BIGINT) AS qdot,
         |        nq.n2 AS na, nc.n2 AS nb
         |       FROM emb q JOIN emb c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
         |       JOIN n2 nq ON q.vec_id = nq.vec_id JOIN n2 nc ON c.vec_id = nc.vec_id),
         |exact AS MATERIALIZED (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      CAST(qdot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosq
         |    FROM ex) t
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, cid) <= 3),
         |pe AS (SELECT vec_id, neighbor_id FROM knn WHERE vec_id < 8),
         |two3 AS (SELECT a.vec_id, b.neighbor_id FROM pe a
         |         JOIN knn b ON a.neighbor_id = b.vec_id
         |         WHERE b.neighbor_id <> a.vec_id),
         |cand3 AS (SELECT DISTINCT vec_id, neighbor_id AS cid FROM (
         |         SELECT * FROM pe UNION ALL SELECT * FROM two3)),
         |dot3 AS (SELECT c.vec_id, c.cid,
         |        CAST(list_sum(list_transform(range(1, 65),
         |          i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot,
         |        na.n2 AS na, nb.n2 AS nb
         |      FROM cand3 c JOIN emb a ON c.vec_id = a.vec_id
         |                   JOIN emb b ON c.cid = b.vec_id
         |      JOIN n2 na ON c.vec_id = na.vec_id JOIN n2 nb ON c.cid = nb.vec_id),
         |refined AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      CAST(qdot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosq
         |    FROM dot3) t
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, cid) <= 3),
         |hb AS (SELECT pe.vec_id, count(*) AS hits_base FROM pe
         |       JOIN exact ON pe.vec_id = exact.vec_id AND pe.neighbor_id = exact.cid
         |       GROUP BY 1),
         |hr AS (SELECT r.vec_id, count(*) AS hits_refined FROM refined r
         |       JOIN exact ON r.vec_id = exact.vec_id AND r.cid = exact.cid
         |       GROUP BY 1),
         |pv AS (SELECT DISTINCT vec_id FROM emb WHERE vec_id < 8)
         |SELECT pv.vec_id,
         |  coalesce(hb.hits_base, 0) AS hits_base,
         |  coalesce(hr.hits_refined, 0) AS hits_refined,
         |  round(coalesce(hb.hits_base, 0) * 1.0 / 3, 4) AS recall_base,
         |  round(coalesce(hr.hits_refined, 0) * 1.0 / 3, 4) AS recall_refined
         |FROM pv LEFT JOIN hb ON pv.vec_id = hb.vec_id
         |        LEFT JOIN hr ON pv.vec_id = hr.vec_id
         |ORDER BY pv.vec_id""".stripMargin,

    "q144_local_clustering" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |sym AS (SELECT pa AS z, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT z, count(*) AS dg FROM sym GROUP BY z),
        |centers AS (SELECT z FROM deg WHERE z < 50 AND dg >= 2 AND dg <= 500),
        |wedges AS (SELECT s1.z, s1.t AS wa, s2.t AS wb
        |           FROM sym s1 JOIN centers c ON s1.z = c.z
        |                JOIN sym s2 ON s1.z = s2.z AND s1.t < s2.t),
        |tri AS (SELECT w.z, count(*) AS n_tri FROM wedges w
        |        JOIN e ON w.wa = e.pa AND w.wb = e.pb GROUP BY w.z),
        |base AS (SELECT deg.z AS node, deg.dg AS deg,
        |    CASE WHEN deg.dg >= 2 AND deg.dg <= 500
        |         THEN coalesce(tri.n_tri, 0) END AS n_tri
        |  FROM deg LEFT JOIN tri ON deg.z = tri.z WHERE deg.z < 50)
        |SELECT node, deg, n_tri,
        |  CAST(n_tri * 2 AS DOUBLE) / (deg * (deg - 1)) AS lcc
        |FROM base ORDER BY node""".stripMargin,

    "q138_hyperball" -> {
      val rounds = (1 to 2).map { r =>
        s"""n$r AS (SELECT sym.s AS node, r.reg FROM sym JOIN r${r - 1} r ON sym.t = r.node
           |  UNION ALL SELECT node, reg FROM r${r - 1}),
           |r$r AS (SELECT node, list_sort(list_distinct(flatten(list(reg))))[1:32] AS reg
           |  FROM n$r GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
         |sym AS MATERIALIZED (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
         |nodes AS (SELECT DISTINCT s AS node FROM sym),
         |r0 AS (SELECT node,
         |  [('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT] AS reg
         |  FROM nodes),
         |$rounds
         |SELECT node, CAST(len(reg) AS BIGINT) AS n_reg,
         |  round(CASE WHEN len(reg) < 32 THEN CAST(len(reg) AS DOUBLE)
         |    ELSE 31.0 * power(16.0, 15) / CAST(reg[32] AS DOUBLE) END, 4) AS n_est
         |FROM r2 ORDER BY node""".stripMargin
    },

    "e33_kcenter_init" ->
      s"""WITH ${kcenterCtes(6)}
         |SELECT rank, center_vec_id, dist2 FROM picks ORDER BY rank""".stripMargin,

    "e34_knn_outliers" ->
      s"""WITH $knnGraphCtes,
         |agg AS (SELECT vec_id, count(*) AS n_cand FROM scored GROUP BY vec_id),
         |kth AS (SELECT vec_id, neighbor_id AS kth_neighbor_id, qdot AS kth_qdot
         |        FROM scored
         |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) = 3)
         |SELECT emb.vec_id, coalesce(agg.n_cand, 0) AS n_cand,
         |  kth.kth_neighbor_id, kth.kth_qdot
         |FROM emb LEFT JOIN agg ON emb.vec_id = agg.vec_id
         |         LEFT JOIN kth ON emb.vec_id = kth.vec_id
         |ORDER BY emb.vec_id""".stripMargin,

    "q128_kcore" ->
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
         |sym AS MATERIALIZED (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
         |nodes AS (SELECT DISTINCT s AS node FROM sym),
         |${kcoreRounds(90, 4)},
         |surv AS (SELECT s AS node, c AS deg_final FROM d4 WHERE c >= 90)
         |SELECT nodes.node AS p_partkey,
         |  CASE WHEN surv.node IS NULL THEN 0 ELSE 1 END AS in_core,
         |  coalesce(surv.deg_final, 0) AS deg_final
         |FROM nodes LEFT JOIN surv ON nodes.node = surv.node
         |ORDER BY p_partkey""".stripMargin,

    "e28_knn_graph" ->
      s"""WITH $knnGraphCtes
         |SELECT vec_id, rk, neighbor_id, qdot FROM knn ORDER BY vec_id, rk""".stripMargin,

    "q133_link_prediction" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |sym AS MATERIALIZED (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT s, count(*) AS dg FROM sym GROUP BY s),
        |za AS (SELECT sym.s AS z, sym.t AS a, deg.dg FROM sym
        |       JOIN deg ON sym.s = deg.s WHERE sym.t < 100 AND deg.dg <= 500),
        |zb AS (SELECT s AS z, t AS b FROM sym),
        |w AS (SELECT za.a, zb.b, za.dg FROM za JOIN zb ON za.z = zb.z WHERE za.a < zb.b),
        |sc AS (SELECT a, b, count(*) AS n_common,
        |         sum(CAST(1.0 / ln(dg) AS DECIMAL(18,9))) AS aa
        |       FROM w GROUP BY a, b),
        |pred AS (SELECT sc.a, sc.b, sc.n_common, sc.aa FROM sc
        |         WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = sc.a AND e.pb = sc.b))
        |SELECT a, b, n_common, CAST(aa AS DOUBLE) AS aa_score
        |FROM pred ORDER BY aa_score DESC, a, b LIMIT 50""".stripMargin,

    "e29_label_prop" ->
      s"""WITH $knnGraphCtes,
         |$labelPropCtes
         |SELECT e2.vec_id, lab.label, coalesce(lab.rnd, -1) AS assigned_round
         |FROM embeddings e2 LEFT JOIN lab ON e2.vec_id = lab.vec_id
         |ORDER BY e2.vec_id""".stripMargin,

    "q143_modularity" ->
      s"""WITH $knnGraphCtes,
         |$labelPropCtes,
         |lbl AS (SELECT vec_id, label FROM lab),
         |ue AS MATERIALIZED (SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         |        greatest(vec_id, neighbor_id) AS b FROM knn),
         |le AS MATERIALIZED (SELECT ue.a, ue.b, la.label AS la, lb.label AS lb
         |      FROM ue JOIN lbl la ON ue.a = la.vec_id
         |              JOIN lbl lb ON ue.b = lb.vec_id),
         |m AS (SELECT count(*) AS m FROM le),
         |lc AS (SELECT la AS label, count(*) AS lc FROM le WHERE la = lb GROUP BY 1),
         |dc AS (SELECT label, count(*) AS dc FROM (
         |        SELECT la AS label FROM le UNION ALL SELECT lb FROM le) GROUP BY 1),
         |sizes AS (SELECT label, count(*) AS n_nodes FROM lbl GROUP BY 1)
         |SELECT sizes.label, sizes.n_nodes,
         |  coalesce(lc.lc, 0) AS lc, coalesce(dc.dc, 0) AS dc,
         |  CAST(coalesce(lc.lc, 0) AS DOUBLE) / m.m -
         |    (CAST(coalesce(dc.dc, 0) AS DOUBLE) / (m.m * 2)) *
         |    (CAST(coalesce(dc.dc, 0) AS DOUBLE) / (m.m * 2)) AS q_contrib
         |FROM sizes LEFT JOIN lc ON sizes.label = lc.label
         |           LEFT JOIN dc ON sizes.label = dc.label
         |           CROSS JOIN m
         |ORDER BY sizes.label""".stripMargin,

    "e40_nn_descent" ->
      s"""WITH $knnGraphCtes,
         |ge AS MATERIALIZED (SELECT vec_id, neighbor_id FROM knn),
         |two AS (SELECT a.vec_id, b.neighbor_id FROM ge a
         |        JOIN ge b ON a.neighbor_id = b.vec_id
         |        WHERE b.neighbor_id <> a.vec_id),
         |cand2 AS MATERIALIZED (SELECT DISTINCT vec_id, neighbor_id FROM (
         |        SELECT * FROM ge UNION ALL SELECT * FROM two)),
         |dot2 AS (SELECT c.vec_id, c.neighbor_id,
         |        CAST(list_sum(list_transform(range(1, 65),
         |          i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS qdot
         |      FROM cand2 c JOIN emb a ON c.vec_id = a.vec_id
         |                   JOIN emb b ON c.neighbor_id = b.vec_id),
         |sc2 AS (SELECT d2.vec_id, d2.neighbor_id, d2.qdot,
         |        CAST(d2.qdot AS DOUBLE) /
         |          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosq
         |      FROM dot2 d2 JOIN n2 na ON d2.vec_id = na.vec_id
         |                   JOIN n2 nb ON d2.neighbor_id = nb.vec_id
         |      WHERE na.n2 > 0 AND nb.n2 > 0),
         |top2 AS (SELECT vec_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) AS rk,
         |    neighbor_id, qdot
         |  FROM sc2 QUALIFY rk <= 3)
         |SELECT t.vec_id, t.rk, t.neighbor_id, t.qdot,
         |  (ge.vec_id IS NULL) AS is_new
         |FROM top2 t LEFT JOIN ge ON t.vec_id = ge.vec_id
         |                        AND t.neighbor_id = ge.neighbor_id
         |ORDER BY t.vec_id, t.rk""".stripMargin,

    "e41_grid_density" ->
      s"""WITH pts AS (SELECT vec_id,
         |    CAST(floor(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1024) AS BIGINT) / 128.0) AS BIGINT) AS gx,
         |    CAST(floor(CAST(floor(CAST(embedding[2] AS DOUBLE) * 1024) AS BIGINT) / 128.0) AS BIGINT) AS gy
         |  FROM embeddings),
         |cells AS MATERIALIZED (SELECT gx, gy, count(*) AS cnt FROM pts GROUP BY 1, 2),
         |core0 AS (SELECT gx, gy, cnt, gx * 100000 + gy AS lbl FROM cells WHERE cnt >= 8),
         |offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
         |${gridDensityRounds(3)},
         |cs AS (SELECT lbl, CAST(sum(cnt) AS BIGINT) AS cluster_points FROM r3 GROUP BY lbl)
         |SELECT c.gx, c.gy, c.cnt, (c.cnt >= 8) AS is_core,
         |  r3.lbl AS cluster, cs.cluster_points
         |FROM cells c LEFT JOIN r3 ON c.gx = r3.gx AND c.gy = r3.gy
         |             LEFT JOIN cs ON r3.lbl = cs.lbl
         |ORDER BY c.gx, c.gy""".stripMargin,

    "e31_graph_search" ->
      s"""WITH $knnGraphCtes,
         |gedges AS (SELECT vec_id AS node, neighbor_id FROM knn),
         |qs AS (SELECT vec_id AS qid FROM emb WHERE vec_id >= 100 AND vec_id < 105),
         |entry AS (SELECT min(vec_id) AS node FROM emb),
         |f0 AS (SELECT qs.qid, entry.node FROM qs CROSS JOIN entry),
         |${gsScore("f0", "v0")},
         |${graphSearchRounds(3, 4)}
         |SELECT qid,
         |  row_number() OVER (PARTITION BY qid ORDER BY cosq DESC, node) AS rk,
         |  node, qdot
         |FROM v3 WHERE node <> qid
         |QUALIFY rk <= 3
         |ORDER BY qid, rk""".stripMargin,

    "e30_triplet_mining" ->
      s"""WITH $knnGraphCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |c AS (SELECT s.vec_id, s.neighbor_id, s.qdot, s.cosq,
         |        la.label AS a_label, ln2.label AS n_label
         |      FROM scored s JOIN lab la ON s.vec_id = la.vec_id
         |                    JOIN lab ln2 ON s.neighbor_id = ln2.vec_id),
         |pos AS (SELECT vec_id, neighbor_id AS pos_id, qdot AS pos_qdot
         |        FROM c WHERE n_label = a_label
         |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) = 1),
         |neg AS (SELECT vec_id, neighbor_id AS neg_id, qdot AS neg_qdot
         |        FROM c WHERE n_label <> a_label
         |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cosq DESC, neighbor_id) = 1)
         |SELECT l.vec_id, l.label, pos.pos_id, pos.pos_qdot, neg.neg_id, neg.neg_qdot
         |FROM lab l LEFT JOIN pos ON l.vec_id = pos.vec_id
         |           LEFT JOIN neg ON l.vec_id = neg.vec_id
         |ORDER BY l.vec_id""".stripMargin,

    "d54_frequent_itemsets" ->
      """WITH dt AS MATERIALIZED (SELECT doc_id,
        |        unnest(list_distinct(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))) AS w
        |      FROM documents),
        |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM dt),
        |f1 AS (SELECT w FROM dt GROUP BY w
        |       HAVING count(*) * 1.0 >= 0.25 * (SELECT nd FROM nd)),
        |kept AS MATERIALIZED (SELECT dt.doc_id, dt.w FROM dt JOIN f1 USING (w)),
        |p AS MATERIALIZED (SELECT a.doc_id, a.w AS w1, b.w AS w2
        |     FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.w < b.w),
        |f2 AS MATERIALIZED (SELECT w1, w2 FROM p GROUP BY w1, w2
        |     HAVING count(*) * 1.0 >= 0.45 * (SELECT nd FROM nd)),
        |cand AS (SELECT p.doc_id, p.w1, p.w2, c.w AS w3
        |         FROM p JOIN f2 USING (w1, w2)
        |         JOIN kept c ON c.doc_id = p.doc_id AND c.w > p.w2
        |         WHERE EXISTS (SELECT 1 FROM f2 x WHERE x.w1 = p.w1 AND x.w2 = c.w)
        |           AND EXISTS (SELECT 1 FROM f2 y WHERE y.w1 = p.w2 AND y.w2 = c.w))
        |SELECT w1, w2, w3, count(*) AS support FROM cand
        |GROUP BY w1, w2, w3 HAVING count(*) * 1.0 >= 0.45 * (SELECT nd FROM nd)
        |ORDER BY w1, w2, w3""".stripMargin,

    "q131_stickiness" ->
      """WITH ud AS (SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
        |            FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
        |w AS (SELECT ud.day + t.i AS day, ud.user_id FROM ud, range(0, 7) t(i)),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM w GROUP BY day),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day CROSS JOIN b
        |WHERE dau.day >= b.d0 + 6 AND dau.day <= b.d1
        |ORDER BY dau.day""".stripMargin,

    "e32_index_health" ->
      s"""WITH cents(cell, dim, cv) AS (VALUES ${PipelineQueries.ivfCentroidValues(16, 64)}),
         |q AS (SELECT vec_id, CAST(t.i AS INT) - 1 AS dim,
         |        CAST(floor(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1024) AS BIGINT) AS qd
         |      FROM embeddings, range(1, 65) t(i)),
         |d2 AS (SELECT q.vec_id, cents.cell,
         |         sum((q.qd - cents.cv) * (q.qd - cents.cv)) AS d2
         |       FROM q JOIN cents ON q.dim = cents.dim GROUP BY 1, 2),
         |a AS (SELECT vec_id, cell FROM d2
         |      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1),
         |occ AS (SELECT cell, count(*) AS occupancy FROM a GROUP BY cell),
         |st AS (SELECT count(*) AS n_used, sum(occupancy) AS n,
         |         sum(occupancy * occupancy) AS ss FROM occ)
         |SELECT occ.cell, occ.occupancy, st.n_used,
         |  CAST(16 * st.ss AS DOUBLE) / CAST(st.n AS DOUBLE) / CAST(st.n AS DOUBLE) AS imbalance
         |FROM occ CROSS JOIN st ORDER BY occ.cell""".stripMargin,

    "d55_continuation_pairs" ->
      """WITH t0 AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
        |t AS (SELECT * FROM t0 WHERE len(ws) >= 3),
        |tails AS (SELECT doc_id AS a,
        |            md5(array_to_string(ws[len(ws)-2:len(ws)], ' ')) AS gkey FROM t),
        |heads AS (SELECT doc_id AS b,
        |            md5(array_to_string(ws[1:3], ' ')) AS gkey FROM t),
        |hot AS (SELECT gkey FROM
        |          (SELECT gkey, count(*) AS ta FROM tails GROUP BY gkey) x
        |          JOIN (SELECT gkey, count(*) AS hb FROM heads GROUP BY gkey) y USING (gkey)
        |        WHERE ta > 50 OR hb > 50),
        |np AS (SELECT count(*) AS n_pruned_keys FROM hot),
        |p AS (SELECT tails.a, heads.b FROM tails JOIN heads USING (gkey)
        |      WHERE gkey NOT IN (SELECT gkey FROM hot) AND tails.a <> heads.b)
        |SELECT p.a, p.b, np.n_pruned_keys FROM p CROSS JOIN np ORDER BY p.a, p.b""".stripMargin,

    "d56_dup_matrix" ->
      """WITH fp AS (SELECT
        |    md5(array_to_string(list_sort(list_distinct(
        |      list_filter(string_split_regex(text, '\s+'), w -> w <> ''))), ' ')) AS fp,
        |    source, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT x.source AS src_a, y.source AS src_b,
        |        CASE WHEN x.source = y.source THEN (x.n * (x.n - 1)) // 2
        |             ELSE x.n * y.n END AS p
        |      FROM fp x JOIN fp y ON x.fp = y.fp AND x.source <= y.source)
        |SELECT src_a, src_b, CAST(sum(p) AS BIGINT) AS n_pairs FROM m
        |GROUP BY 1, 2 HAVING sum(p) > 0 ORDER BY src_a, src_b""".stripMargin,

    "d53_cooccurrence_pmi" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
        |           FROM documents),
        |u AS (SELECT unnest(ws) AS w FROM t),
        |uni AS (SELECT w, count(*) AS cw FROM u GROUP BY w),
        |nt AS (SELECT count(*) AS nt FROM u),
        |off AS (SELECT unnest([1, 2, 3, 4, 5]) AS o),
        |p AS (SELECT ws, o,
        |        unnest(list_transform(range(1, len(ws) - o + 1), i -> CAST(i AS INT))) AS i
        |      FROM t CROSS JOIN off WHERE len(ws) > o),
        |pairs AS (SELECT least(ws[i], ws[i + o]) AS w1, greatest(ws[i], ws[i + o]) AS w2 FROM p),
        |np AS (SELECT count(*) AS np FROM pairs),
        |cp AS (SELECT w1, w2, count(*) AS c_ab FROM pairs GROUP BY w1, w2)
        |SELECT cp.w1, cp.w2, cp.c_ab,
        |  round(ln((cp.c_ab * 1.0 * nt.nt * nt.nt) / (ca.cw * 1.0 * cb.cw * np.np)), 4) + 0.0 AS pmi
        |FROM cp JOIN uni ca ON cp.w1 = ca.w JOIN uni cb ON cp.w2 = cb.w
        |CROSS JOIN nt CROSS JOIN np
        |WHERE cp.c_ab >= 5
        |ORDER BY cp.w1, cp.w2""".stripMargin)
}
