package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Corpus-audit operators: the profiling / substring-dedup / indexing
  * primitives a curation team runs BEFORE committing to a pipeline
  * design — column profiling (the "expectations" step), maximal
  * duplicated-substring spans (the Lee et al. suffix-array dedup
  * signal, approximated as duplicated n-gram islands), content-defined
  * chunking (the rsync/LBFS shift-resistant dedup primitive), and
  * positional-index phrase search.
  *
  * Every query hash-checks: outputs are integers, md5 fingerprints and
  * token positions; there is not a single float anywhere in the family.
  */
object AuditQueries {

  /** d58's core: islands of consecutive positions whose n-gram occurs
    * in more than one document, merged to maximal spans. `docs` needs
    * (doc_id, text). */
  private[queries] def dupSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"),
        expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("t"))
      .filter(size(col("t")) >= n)
    val pos = toks.select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, size(t) - ${n - 1}), i -> array_join(slice(t, i, $n), ' '))")))
      .select(col("doc_id"), (col("pos") + lit(1)).cast(LongType).as("p"),
        md5(col("col")).as("g"))
    // df counts DISTINCT documents per gram (a gram repeated inside
    // one doc is repetition, not duplication — d16's province)
    val df5 = pos.select(col("g"), col("doc_id")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    val dup = pos.join(df5.filter(col("df") > 1), Seq("g"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    dup.withColumn("isl", col("p") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("p")).as("span_start"), max(col("p")).as("pmax"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("doc_id"), col("span_start"),
        (col("pmax") + lit(n - 1)).as("span_end"),
        (col("pmax") + lit(n) - col("span_start")).as("span_tokens"),
        col("n_dup_grams"))
  }

  /** d59's core: content-defined chunks (trailing-3-gram rolling hash,
    * boundary when hash ≡ 0 mod `modulus`) + corpus-wide fingerprint
    * dup counts. `docs` needs (doc_id, text). */
  private[queries] def cdcChunks(docs: DataFrame, modulus: Int = 16): DataFrame = {
    val toks = docs.select(col("doc_id"),
      expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("t"))
    val pos = toks.select(col("doc_id"), col("t"),
        posexplode(expr(
          "transform(sequence(1, size(t)), i -> CASE WHEN i >= 3 " +
            "THEN array_join(slice(t, i - 2, 3), ' ') END)")))
      .select(col("doc_id"), col("t"),
        (col("pos") + lit(1)).cast(LongType).as("p"), col("col").as("g3"))
      .withColumn("b", when(col("g3").isNotNull &&
        conv(substring(md5(col("g3")), 1, 8), 16, 10).cast(LongType) % modulus === 0,
        1L).otherwise(0L))
    val cum = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = pos
      .withColumn("chunk_id", coalesce(sum(col("b")).over(cum), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(min(col("p")).as("start"), count(lit(1)).as("n_tokens"),
        first(col("t")).as("t"))
      .withColumn("fp", md5(expr("array_join(slice(t, CAST(start AS INT), CAST(n_tokens AS INT)), ' ')")))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        col("n_tokens"), col("fp"))
    val dfc = chunks.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    chunks.join(dfc, Seq("fp"))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        col("n_tokens"), col("fp"), col("df"))
  }

  /** d61's core: exact phrase occurrences via position alignment.
    * `phrases` needs (phrase_id, phrase); `docs` needs (doc_id, text). */
  private[queries] def phraseSearch(docs: DataFrame, phrases: DataFrame): DataFrame = {
    val pw = phrases.select(col("phrase_id"),
        posexplode(split(col("phrase"), " ")))
      .select(col("phrase_id"), col("pos").cast(LongType).as("off"),
        col("col").as("w"))
    val plen = phrases.select(col("phrase_id"),
      size(split(col("phrase"), " ")).cast(LongType).as("plen"))
    val toks = docs.select(col("doc_id"),
        posexplode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")))
      .select(col("doc_id"), col("pos").cast(LongType).as("tp"),
        col("col").as("w"))
    val cand = toks.join(broadcast(pw), Seq("w"))
      .select(col("phrase_id"), col("doc_id"),
        (col("tp") - col("off")).as("start"), col("off"))
    cand.groupBy(col("phrase_id"), col("doc_id"), col("start"))
      .agg(countDistinct(col("off")).as("n_off"))
      .join(broadcast(plen), Seq("phrase_id"))
      .filter(col("n_off") === col("plen") && col("start") >= 0)
      .groupBy(col("phrase_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("start")) + lit(1)).as("first_pos"))
  }

  /** d68's core: per-source token-budget quota sampling — docs draw in
    * md5-priority order, kept while the source's running token total
    * stays within `budget`. Returns the per-source report
    * (source, n_docs, total_tokens, n_kept, kept_tokens, kept_frac). */
  private[queries] def sourceQuota(docs: DataFrame, budget: Long): DataFrame = {
    val scored = docs.select(col("source"), col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast(LongType).as("toks"))
      .withColumn("pri", md5(concat(lit("quota:"), col("doc_id"))))
    val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("cum", sum(col("toks")).over(w))
      .withColumn("kept", col("cum") <= budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("toks")).otherwise(0L)).as("kept_tokens"))
      .withColumn("kept_frac",
        round(col("kept_tokens") * lit(1.0) / col("total_tokens"), 4))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-column data-quality profile of the documents table in long
    // form — the "write the expectation suite" step. ONE pass: all
    // per-column aggregates ride a single map-side-combined aggregate
    // (Spark plans the multi-distinct via one Expand — still a single
    // shuffle), then a driver-free stack() to long form. At 100 TB this
    // is the cheapest possible shape: no per-column scans, no windows.
    "d60_column_profile" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"),
          min(length(col(c).cast(StringType))).cast(LongType).as(s"${c}__mn"),
          max(length(col(c).cast(StringType))).cast(LongType).as(s"${c}__mx"))
      }
      val g = docs.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stackArgs = cols.map(c =>
        s"'$c', ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx").mkString(", ")
      g.selectExpr("n_rows",
          s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_len, max_len)")
        .select(col("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_len"), col("max_len"))
        .orderBy(col("col_name"))
    }),

    // maximal duplicated-substring spans — the signal the suffix-array
    // dedup of Lee et al. (2022) extracts, approximated corpus-scale as
    // islands of consecutive token positions whose 5-gram occurs in >1
    // document. Scale shape: grams shrink to md5 keys BEFORE the df
    // shuffle (position + 16-byte key, never text); the island merge is
    // a window PARTITIONED by doc (bounded per doc, no global sort).
    // The span [start, start+4+gap] reconstruction is pure integer
    // arithmetic on the island's min/max positions.
    "d58_dup_spans" -> ((s, d) =>
      dupSpans(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("span_start"))),

    // content-defined chunking: chunk boundaries fall AFTER any token
    // whose trailing 3-gram hashes to 0 mod 16 (avg chunk ~16 tokens) —
    // the Rabin/LBFS rule, so an insertion early in a document shifts
    // at most one chunk instead of re-fingerprinting every fixed-stride
    // window (d31's failure mode). Chunk fingerprints then dedup
    // corpus-wide by exact match. Scale shape: the boundary predicate
    // and chunk ids are computed in a window PARTITIONED by doc; the
    // chunk-text slice joins positions back to the token ARRAY on
    // doc_id (co-keyed, narrow); the df count shuffles md5 keys only.
    "d59_cdc_chunks" -> ((s, d) =>
      cdcChunks(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // sliced oracle twin of d59 (the dXXs pattern; cdcChunks IS the
    // shared body, the oracle is derived from d59's own SQL): the CDC
    // position-expansion oracle OOMs at sf10's 500k docs; doc_id <
    // 25000 is inside the oracle-proven sf1 scale.
    "d59s_cdc_chunks_sliced" -> ((s, d) =>
      cdcChunks(Tables.documents(s, d)
          .filter(col("doc_id") < PipelineQueries.SliceBound))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Benford first-digit audit over lineitem prices — the forensic
    // data-quality screen (fabricated or truncated numeric columns
    // bend away from the log10(1+1/d) law). Digits come from the
    // DECIMAL-rendered price (exact text both engines, no double
    // formatting drift); expected probabilities pass through
    // DECIMAL(18,9) to absorb log10 ulps (the q133 rule). One map-side
    // digit extraction, one 9-row count shuffle, a 1-row broadcast.
    "q146_benford" -> ((s, d) => {
      val digits = Tables.lineitem(s, d).select(
        substring(col("l_extendedprice").cast(DecimalType(15, 2))
          .cast(StringType), 1, 1).as("digit"))
        // guard: prices < 1 render "0.xx" → digit '0', whose
        // log10(1 + 1/0) is Infinity — Spark's DECIMAL cast of inf
        // yields NULL while DuckDB's errors. Benford's law is only
        // defined over leading digits 1-9 anyway; filter BOTH engines.
        .filter(col("digit").between("1", "9"))
      val per = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = per.agg(sum(col("n")).as("total"))
      per.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n").cast(DoubleType) / col("total"), 6).as("observed_p"),
          log(10.0, lit(1.0) + lit(1.0) / col("digit").cast(DoubleType))
            .cast(DecimalType(18, 9)).cast(DoubleType).as("expected_p"))
        .orderBy(col("digit"))
    }),

    // per-source token-budget quota sampling — the domain-rebalancing
    // step (downsample over-represented sources to a fixed token
    // budget before mixing): docs draw in a deterministic md5 priority
    // order and are kept while the source's running token total stays
    // within budget. Scale shape: the only window is PARTITIONED by
    // source (never global), the cumulative sum is one pass, and the
    // report is one partial-aggregated shuffle — the d57/d44 rule.
    // Token counts are integers; the one ratio is rounded like d63's.
    "d68_source_quota" -> ((s, d) =>
      sourceQuota(Tables.documents(s, d), budget = 800L).orderBy(col("source"))),

    // vocabulary-growth (Heaps' law) curve — how fast do NEW 5-grams
    // appear as the corpus grows in ingest order? The flattening rate
    // decides dedup aggressiveness and vocab budgets. Each gram's
    // FIRST document (min doc_id over an md5-keyed shuffle) buckets
    // into 50-doc ingest epochs; the cumulative sum windows over the
    // EPOCH table (corpus_size/50 rows — dimension-sized by
    // construction, the d44 rule, never a per-row global window).
    "d67_heaps_curve" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
          expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("t"))
        .filter(size(col("t")) >= 5)
      val grams = toks.select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(sequence(1, size(t) - 4), i -> array_join(slice(t, i, 5), ' ')))")))
        .select(col("doc_id"), md5(col("col")).as("g"))
      val first = grams.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
      val perb = first.withColumn("bucket", expr("fd div 50"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_new_grams"))
      val nb = docs.withColumn("bucket", expr("doc_id div 50"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      nb.join(perb, Seq("bucket"), "left")
        .withColumn("n_new_grams", coalesce(col("n_new_grams"), lit(0L)))
        .withColumn("cum_grams", sum(col("n_new_grams")).over(w))
        .select(col("bucket"), col("n_docs"), col("n_new_grams"), col("cum_grams"))
        .orderBy(col("bucket"))
    }),

    // join-key skew profile — the diagnostic a pipeline runs BEFORE a
    // big shuffle join to decide between plain hash, broadcast, and the
    // q36 salting treatment: per-key counts for the prospective key
    // (l_partkey), the top-5 heavy keys, and the max/avg skew factor.
    // One partial-aggregated count shuffle + a k-bounded TakeOrdered +
    // a 1-row broadcast — nothing here gets harder at 100 TB, which is
    // the point of running it first.
    "d65_skew_profile" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val top = counts.orderBy(desc("cnt"), col("l_partkey")).limit(5)
      val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
        max(col("cnt")).as("max_cnt"))
      top.crossJoin(broadcast(stats))
        .select(col("l_partkey"), col("cnt"), col("n_keys"), col("total"),
          round(col("max_cnt") * col("n_keys") * lit(1.0) / col("total"), 4)
            .as("skew_factor"))
        .orderBy(desc("cnt"), col("l_partkey"))
    }),

    // labeled training pairs for a dedup CLASSIFIER — the step before
    // replacing a hand-tuned Jaccard threshold with a learned model:
    // candidate pairs at a LOW similarity floor (0.1) become examples,
    // labeled by the production threshold (>= 0.5), with the similarity
    // and length-ratio features a linear model consumes. On this corpus
    // that yields 25 positives and ~110 organic negatives. Machinery =
    // d08's inverted-index join under a df cap (the oracle mirrors the
    // cap's exact effect: common counts exclude capped shingles, sizes
    // stay full), so the pair space is bounded at any corpus size.
    "d64_dedup_training_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.1, shingleSize = 2, maxDf = 1000)
      val n = docs.select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).as("nt"))
      pairs
        .join(n.select(col("doc_id").as("a"), col("nt").as("na")), Seq("a"))
        .join(n.select(col("doc_id").as("b"), col("nt").as("nb")), Seq("b"))
        .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"),
          round(least(col("na"), col("nb")) * lit(1.0) /
            greatest(col("na"), col("nb")), 4).as("len_ratio"),
          when(col("jaccard") >= 0.5, 1L).otherwise(0L).as("label"))
        .orderBy(col("a"), col("b"))
    }),

    // tokenizer-vocabulary coverage / OOV-rate report per source — the
    // budget-planning step before committing to a vocab size (does a
    // k-entry vocabulary cover src17's token stream as well as src0's?).
    // Vocab = top-16 terms by corpus occurrence count (tie → term asc;
    // a TakeOrdered over the term-count table, k-bounded like d12);
    // the vocab broadcasts into a map-side membership join, per-source
    // aggregates are one shuffle. At 100 TB the vocab stays k-sized and
    // the token stream never shuffles for the membership test.
    "d63_vocab_coverage" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("source"),
        explode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")).as("term"))
      val top = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("term")).limit(16)
        .select(col("term"), lit(1L).as("in_v"))
      toks.join(broadcast(top), Seq("term"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("oov_tokens"),
          countDistinct(when(col("in_v").isNull, col("term"))).as("oov_distinct"))
        .withColumn("coverage",
          round(lit(1.0) - col("oov_tokens") * lit(1.0) / col("n_tokens"), 4))
        .orderBy(col("source"))
    }),

    // NEAR-DUP-level benchmark decontamination — the fuzzy companion to
    // d15/d19/d35's exact n-gram hits: a corpus document is contaminated
    // if it is a MinHash near-duplicate of an eval document (a light
    // paraphrase or partial copy that exact-shingle matching underflags;
    // the decontamination regime frontier labs actually run). Reuses
    // d29's incremental machinery with the eval set as the probe side:
    // eval signatures probe the LSH bucket index, corpus×corpus pairs
    // never expand — at 100 TB the cost is proportional to the EVAL set,
    // not the corpus pair space. Banding recall is full on this corpus
    // (the d06 adjudication), so the result equals the exact cross-pair
    // set the oracle computes.
    "d62_fuzzy_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.dedup.Dedup.minhashNearDupsIncremental(
          docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
          "doc_id", "text", threshold = 0.5)
        .filter(col("a") < 20 && col("b") >= 20)
        .select(col("b").as("corpus_id"), col("a").as("eval_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("corpus_id"), col("eval_id"))
    }),

    // exact phrase search over a positional inverted index — the
    // position-alignment trick: postings for the phrase's words are
    // keyed by (candidate start = token_pos − word_offset), and a
    // position is a match iff ALL the phrase's offsets land on it
    // (count(DISTINCT offset) = phrase length). One shuffle on the
    // alignment key; no k-way positional self-join. The phrase table is
    // tiny and broadcast; at 100 TB the token explode is map-side and
    // the postings are semi-joined down to the phrase vocabulary BEFORE
    // any shuffle.
    "d61_phrase_search" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      phraseSearch(Tables.documents(s, d),
          AuditQueries.phraseDefs.toDF("phrase_id", "phrase"))
        .orderBy(col("phrase_id"), col("doc_id"))
    })
  )

  /** Search phrases for d61 — common word-pairs/triples of the synthetic
    * corpus vocabulary, including one with a repeated word (exercises
    * the count(DISTINCT offset) alignment rule). */
  private[queries] val phraseDefs: Seq[(Long, String)] = Seq(
    (1L, "table value"), (2L, "fast key scan"), (3L, "table table"))

  private def phraseValues: String =
    phraseDefs.map { case (id, p) => s"(CAST($id AS BIGINT), '$p')" }.mkString(", ")

  /** d59s sliced-twin oracle DERIVED from d59's own SQL (the dXXs
    * mechanism — see PipelineQueries). */
  lazy val oracle: Map[String, String] = oracleBase +
    ("d59s_cdc_chunks_sliced" -> TwinSql.subst("d59s_cdc_chunks_sliced",
      oracleBase("d59_cdc_chunks"), "FROM documents",
      s"FROM (SELECT * FROM documents WHERE doc_id < ${PipelineQueries.SliceBound})"))

  private val oracleBase: Map[String, String] = Map(
    "d60_column_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min(length(CAST($c AS VARCHAR))) AS BIGINT) AS min_len,
           |  CAST(max(length(CAST($c AS VARCHAR))) AS BIGINT) AS max_len
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "d58_dup_spans" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM documents),
        |pos AS (SELECT doc_id, u.p AS p, u.g AS g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
        |    i -> {'p': CAST(i AS BIGINT), 'g': md5(array_to_string(t[i:i+4], ' '))})) AS u
        |  FROM toks WHERE len(t) >= 5)),
        |df5 AS (SELECT g, count(DISTINCT doc_id) AS df FROM pos GROUP BY g),
        |dup AS (SELECT pos.doc_id, pos.p FROM pos JOIN df5 USING (g) WHERE df5.df > 1),
        |isl AS (SELECT doc_id, p,
        |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
        |        FROM dup)
        |SELECT doc_id, min(p) AS span_start, max(p) + 4 AS span_end,
        |  max(p) + 5 - min(p) AS span_tokens, count(*) AS n_dup_grams
        |FROM isl GROUP BY doc_id, isl ORDER BY doc_id, span_start""".stripMargin,

    "d59_cdc_chunks" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM documents),
        |pos AS (SELECT doc_id, t, u.p AS p, u.g3 AS g3 FROM (
        |  SELECT doc_id, t, unnest(list_transform(range(1, len(t) + 1),
        |    i -> {'p': CAST(i AS BIGINT),
        |          'g3': CASE WHEN i >= 3 THEN array_to_string(t[i-2:i], ' ') END})) AS u
        |  FROM toks)),
        |b AS (SELECT doc_id, t, p,
        |        CASE WHEN g3 IS NOT NULL AND
        |          ('0x' || substr(md5(g3), 1, 8))::BIGINT % 16 = 0
        |        THEN 1 ELSE 0 END AS b
        |      FROM pos),
        |cid AS (SELECT doc_id, t, p,
        |          coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |        FROM b),
        |chunks AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |    min(p) AS start, count(*) AS n_tokens,
        |    md5(array_to_string(any_value(t)[min(p):min(p)+count(*)-1], ' ')) AS fp
        |  FROM cid GROUP BY doc_id, chunk_id),
        |dfc AS (SELECT fp, count(*) AS df FROM chunks GROUP BY fp)
        |SELECT c.doc_id, c.chunk_id, c.start, c.n_tokens, c.fp, dfc.df
        |FROM chunks c JOIN dfc USING (fp)
        |ORDER BY c.doc_id, c.chunk_id""".stripMargin,

    "q146_benford" ->
      """WITH dg AS (SELECT substr(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) AS VARCHAR), 1, 1) AS digit
        |            FROM lineitem),
        |per AS (SELECT digit, count(*) AS n FROM dg
        |        WHERE digit BETWEEN '1' AND '9' GROUP BY digit),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM per)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
        |  CAST(CAST(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE) AS expected_p
        |FROM per CROSS JOIN tot ORDER BY digit""".stripMargin,

    "d68_source_quota" ->
      """WITH scored AS (SELECT source, doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS toks,
        |    md5('quota:' || CAST(doc_id AS VARCHAR)) AS pri FROM documents),
        |cum AS (SELECT source, doc_id, toks,
        |    sum(toks) OVER (PARTITION BY source ORDER BY pri, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM scored),
        |flagged AS (SELECT source, toks, (cum <= 800) AS kept FROM cum)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  round(sum(CASE WHEN kept THEN toks ELSE 0 END) * 1.0 / sum(toks), 4) AS kept_frac
        |FROM flagged GROUP BY source ORDER BY source""".stripMargin,

    "d67_heaps_curve" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM documents),
        |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3),
        |            i -> md5(array_to_string(t[i:i+4], ' '))))) AS g
        |          FROM toks WHERE len(t) >= 5),
        |first AS (SELECT g, min(doc_id) AS fd FROM grams GROUP BY g),
        |perb AS (SELECT fd // 50 AS bucket, count(*) AS n_new_grams FROM first GROUP BY 1),
        |nb AS (SELECT doc_id // 50 AS bucket, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT nb.bucket, nb.n_docs, coalesce(perb.n_new_grams, 0) AS n_new_grams,
        |  CAST(sum(coalesce(perb.n_new_grams, 0)) OVER (ORDER BY nb.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_grams
        |FROM nb LEFT JOIN perb ON nb.bucket = perb.bucket
        |ORDER BY nb.bucket""".stripMargin,

    "d65_skew_profile" ->
      """WITH counts AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey),
        |top AS (SELECT l_partkey, cnt FROM counts ORDER BY cnt DESC, l_partkey LIMIT 5),
        |stats AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
        |                 max(cnt) AS max_cnt FROM counts)
        |SELECT top.l_partkey, top.cnt, stats.n_keys, stats.total,
        |  round(stats.max_cnt * stats.n_keys * 1.0 / stats.total, 4) AS skew_factor
        |FROM top CROSS JOIN stats
        |ORDER BY top.cnt DESC, top.l_partkey""".stripMargin,

    "d64_dedup_training_pairs" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
        |bg AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) END AS bgs FROM w),
        |e AS (SELECT doc_id, unnest(bgs) AS s FROM bg),
        |sizes AS (SELECT doc_id, len(bgs) AS n FROM bg),
        |keep AS (SELECT s FROM e GROUP BY s HAVING count(*) > 1 AND count(*) <= 1000),
        |ek AS (SELECT e.doc_id, e.s FROM e JOIN keep USING (s)),
        |co AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
        |       FROM ek x JOIN ek y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2),
        |j AS (SELECT a, b, common * 1.0 / (sa.n + sb.n - common) AS jac
        |      FROM co JOIN sizes sa ON co.a = sa.doc_id JOIN sizes sb ON co.b = sb.doc_id
        |      WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.1),
        |tc AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS nt FROM documents)
        |SELECT j.a, j.b, round(j.jac, 4) AS jaccard,
        |  round(least(ta.nt, tb.nt) * 1.0 / greatest(ta.nt, tb.nt), 4) AS len_ratio,
        |  CAST(CASE WHEN j.jac >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS label
        |FROM j JOIN tc ta ON j.a = ta.doc_id JOIN tc tb ON j.b = tb.doc_id
        |ORDER BY j.a, j.b""".stripMargin,

    "d63_vocab_coverage" ->
      """WITH tk AS (SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term FROM documents),
        |top AS (SELECT term FROM (SELECT term, count(*) AS cnt FROM tk GROUP BY term) t
        |        ORDER BY cnt DESC, term LIMIT 16),
        |j AS (SELECT tk.source, tk.term, (top.term IS NOT NULL) AS inv
        |      FROM tk LEFT JOIN top ON tk.term = top.term)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN NOT inv THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
        |  CAST(count(DISTINCT CASE WHEN NOT inv THEN term END) AS BIGINT) AS oov_distinct,
        |  round(1.0 - sum(CASE WHEN NOT inv THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS coverage
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "d62_fuzzy_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
        |bg AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) END AS bgs FROM w),
        |e AS (SELECT doc_id, unnest(bgs) AS s FROM bg),
        |sizes AS (SELECT doc_id, len(bgs) AS n FROM bg),
        |co AS (SELECT c.doc_id AS corpus_id, v.doc_id AS eval_id, count(*) AS common
        |       FROM e c JOIN e v ON c.s = v.s
        |       WHERE c.doc_id >= 20 AND v.doc_id < 20 GROUP BY 1, 2)
        |SELECT corpus_id, eval_id,
        |  round(common * 1.0 / (sc.n + sv.n - common), 4) AS jaccard
        |FROM co JOIN sizes sc ON co.corpus_id = sc.doc_id
        |        JOIN sizes sv ON co.eval_id = sv.doc_id
        |WHERE common * 1.0 / (sc.n + sv.n - common) >= 0.5
        |ORDER BY corpus_id, eval_id""".stripMargin,

    "d61_phrase_search" ->
      s"""WITH phrases(phrase_id, phrase) AS (VALUES $phraseValues),
         |pw AS (SELECT phrase_id, u.off AS off, u.w AS w FROM (
         |  SELECT phrase_id, unnest(list_transform(range(len(sp)),
         |    i -> {'off': CAST(i AS BIGINT), 'w': sp[CAST(i AS INT) + 1]})) AS u
         |  FROM (SELECT phrase_id, string_split(phrase, ' ') AS sp FROM phrases))),
         |plen AS (SELECT phrase_id, CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen FROM phrases),
         |toks AS (SELECT doc_id, u.tp AS tp, u.w AS w FROM (
         |  SELECT doc_id, unnest(list_transform(range(len(t)),
         |    i -> {'tp': CAST(i AS BIGINT), 'w': t[CAST(i AS INT) + 1]})) AS u
         |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents))),
         |cand AS (SELECT pw.phrase_id, toks.doc_id, toks.tp - pw.off AS start, pw.off
         |         FROM toks JOIN pw USING (w)),
         |al AS (SELECT phrase_id, doc_id, start, count(DISTINCT off) AS n_off
         |       FROM cand GROUP BY 1, 2, 3),
         |m AS (SELECT al.phrase_id, al.doc_id, al.start FROM al
         |      JOIN plen USING (phrase_id)
         |      WHERE al.n_off = plen.plen AND al.start >= 0)
         |SELECT phrase_id, doc_id, count(*) AS n_matches, min(start) + 1 AS first_pos
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
