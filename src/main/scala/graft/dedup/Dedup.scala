package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard via an inverted index.
  *
  * Scale design (100 TB): every operator is a bounded-fanout shuffle on a
  * well-distributed key — no cross join ever materializes. MinHash bands
  * and SimHash blocks turn the O(n²) pair space into per-bucket
  * mini-products; the inverted-index Jaccard prunes high-document-frequency
  * shingles (non-discriminative by definition) to bound posting-list
  * blowup. Signature computation is embarrassingly parallel map-side work.
  */
object Dedup {

  // ---- deterministic 64-bit mixing (stable across JVMs/runs) -----------
  /** splitmix64 finalizer — a public-domain bit mixer. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a9b4e29ae4f1L
    z ^ (z >>> 31)
  }

  private[dedup] def hashString(s: String): Long = {
    var h = 1125899906842597L // prime
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    mix64(h)
  }

  /** Distinct word n-gram shingles of a text. */
  private[graft] def shingles(text: String, n: Int): Array[String] = {
    val ws = text.split("\\s+")
    if (ws.length < n) Array(ws.mkString(" "))
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).distinct.toArray
  }

  /** Column form of [[shingles]]: the native codegen expression
    * ([[graft.functions.Shingles]], kernel
    * [[SignatureKernel.shingleStrings]]) — bit-identical values and
    * order (property-pinned in `SignatureKernelSpec`), no per-row
    * String/regex round-trip. NULL text → NULL array, exactly like the
    * Scala UDF it replaces. */
  private[graft] def shinglesCol(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.Shingles(org.apache.spark.sql.graft.GraftSql.expression(c), n))

  // ---- exact dedup -----------------------------------------------------

  /** Exact duplicate groups by canonical fingerprint; keeps the minimum id
    * as the survivor. Map-side partial agg → one shuffle on the hash. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  // ---- MinHash + LSH ---------------------------------------------------

  /** Distinct hashes of word n-gram shingles, computed WITHOUT
    * materializing shingle strings: the n-gram hash is a mix of its word
    * hashes (sort + dedup replaces the string set). ~3× faster than
    * string-building at corpus scale; any uniform 64-bit family works for
    * MinHash. */
  private[graft] def shingleHashes(text: String, n: Int): Array[Long] = {
    val ws = text.split("\\s+")
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = hashString(ws(i)); i += 1 }
    val m = math.max(ws.length - n + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 1125899906842597L
      var k = 0
      while (k < n && i + k < ws.length) { h = h * 0x9e3779b97f4a7c15L + wh(i + k); k += 1 }
      out(i) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place (distinct-shingle semantics)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** MinHash signature of the text's shingle set: sigs(i) = min over
    * shingles of (a_i * h(s) + b_i), with deterministic per-permutation
    * coefficients. Returned as an array column of `numHashes` longs.
    * Native codegen expression ([[graft.functions.MinhashSig]], kernel
    * [[SignatureKernel]]) — bit-identical to the former Scala UDF (the
    * equivalence is property-pinned in `SignatureKernelSpec`), minus the
    * String conversion, regex split, and per-word allocations. */
  def minhashSignature(numHashes: Int = 64, shingleSize: Int = 2): Column => Column =
    c => org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.MinhashSig(
        org.apache.spark.sql.graft.GraftSql.expression(c), numHashes, shingleSize))

  /** Scale-gated kernel-input parallelizer (guide §2.5: "input skew —
    * one huge unsplittable file … repartition immediately after the
    * read"). The signature kernels below are CPU-dense map work
    * (~50-100 µs/doc), but a parquet scan's parallelism is bounded by
    * its ROW-GROUP count, not `files.maxPartitionBytes` — and the bench
    * SFs ship single-row-group files, so the whole kernel pass runs in
    * ONE task no matter how many cores the session has (measured: d06's
    * signature stage = 461 ms single-task at sf0.1/local[32]). When the
    * scan cannot reach the session's parallelism (estimated splits <
    * defaultParallelism), round-robin-repartition the narrow (id, text)
    * projection once before the kernel; when splits ≥ cores — every
    * production-scale input — this is an identity and NO exchange is
    * added, so it cannot hurt the 100-TB plan. Correctness: callers'
    * results are arrival-order-independent (band/block keys are pure
    * functions of the row; [[capMembers]] re-sorts by hash(id); pair
    * structs use least/greatest + distinct), verified byte-identical on
    * the full contract.
    *
    * The gate reads size-in-bytes stats off the ANALYZED plan — already
    * materialized when the Dataset was constructed, so the check costs
    * nothing; calling `optimizedPlan` here ran the full optimizer a
    * second time per invocation purely for the same size estimate (the
    * size-only stats visitor propagates the relation's file bytes
    * identically through either plan — no pushdown changes it).
    *
    * Known limit, accepted: a BYTES estimate cannot see row-group
    * LAYOUT. One giant single-row-group file (> cores × maxPartitionBytes)
    * gates as "already parallel enough" yet still scans as one task.
    * Counting row groups would need driver-side footer reads at planning
    * time on every invocation — real cost at production file counts for
    * a pathology that production writers (bounded row-group sizes)
    * don't produce, so the cheap bytes gate stays. */
  private[graft] def parallelizeForKernel(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val cores = sess.sparkContext.defaultParallelism
    val maxPB = sess.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.analyzed.stats.sizeInBytes
    val splits = estBytes / maxPB + 1 // unknown stats → huge → identity
    if (splits < cores) df.repartition(cores) else df
  }

  /** Deterministic hot-bucket cap: a bucket with more than `cap` members
    * (an identical/boilerplate-document flood) would expand O(k²) pairs
    * inside a single task. Over the cap, keep a pseudo-random but
    * deterministic sample of `cap` members — ordered by hash of id with
    * id tie-break — so task time stays bounded; recall for the degenerate
    * flood degrades gracefully (exact-duplicate floods belong to
    * [[exactDupGroups]] anyway). Buckets at or under the cap are
    * untouched, so normal corpora see identical results. `idExpr` is the
    * member-id accessor relative to the lambda variable `m` — `"m.id"`
    * for struct members, `"m"` for the bare-long member arrays the
    * primitive collect aggregates produce (identical sample either way:
    * hash() of a bigint is the same value whether it arrived as a struct
    * field or a bare element). */
  private def capMembers(cap: Int, idExpr: String = "m.id"): Column =
    when(size(col("members")) <= cap, col("members"))
      .otherwise(expr(
        s"transform(slice(array_sort(transform(members, m -> struct(hash($idExpr) AS hk, $idExpr AS tid, m AS m))), 1, $cap), e -> e.m)"))

  /** Candidate near-duplicate pairs via LSH banding: signatures are cut
    * into `bands` bands of `numHashes/bands` rows; docs sharing any band
    * hash become candidates. One explode (×bands) + one shuffle on the
    * band key; bucket sizes are tiny for non-duplicate data, so the
    * within-bucket pair product is bounded — and `bucketCap` bounds it
    * deterministically even for pathological floods. `carry` columns are
    * shipped through the buckets so downstream verification needs no
    * join back.
    *
    * `withEstimate = false` drops the `est_jaccard` column — and with it
    * the only reason to ship signatures through the band shuffle: bucket
    * members shrink from (id + numHashes longs) to the bare id, cutting
    * shuffle volume ~65× at the default 64/16 config. The candidate PAIR
    * SET is identical either way (band keys and the [[capMembers]] sample
    * depend only on the signature and `hash(id)`, both computed before
    * the member struct is built). Callers that exact-verify candidates
    * anyway — [[minhashNearDups]] — never need the estimate. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 2,
      carryText: Boolean = false, bucketCap: Int = 1000,
      withEstimate: Boolean = true): DataFrame = {
    require(withEstimate || !carryText, "carryText requires withEstimate")
    val rows = numHashes / bands
    val carried = if (carryText) Seq(col(textCol).as("text")) else Seq.empty
    // drop null-text docs BEFORE banding: their null signatures would all
    // collide into one bucket per band (hash(band, null) is a constant)
    // and generate O(k²) pairs that the downstream verify only discards.
    // The filter is on the INPUT column, not the signature: MinhashSig is
    // null iff its input is (nullSafeEval), so the pair set is identical —
    // but filter(sig.isNotNull) was pushed through the projection by
    // Catalyst and re-evaluated the signature per row (Filter
    // isnotnull(minhash_sig(text)) + Project minhash_sig(text) — the
    // guide-§4.4 duplicated-expensive-expression shape), DOUBLING the
    // dominant map-side cost of the whole pipeline. Filtering on the raw
    // text instead pushes IsNotNull(text) into the parquet scan for free
    // and the signature is computed exactly once.
    val base = parallelizeForKernel(
      docs.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)))
    val sig = base.select(Seq(col(idCol).as("id"),
        minhashSignature(numHashes, shingleSize)(col(textCol)).as("sig")) ++ carried: _*)
    val memberCols = Seq(col("id")) ++ (if (withEstimate) Seq(col("sig")) else Nil) ++
      (if (carryText) Seq(col("text")) else Nil)
    val banded = sig.select(col("*"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_key", hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
    // Bare-long-id buckets (the production d06 path) aggregate through
    // [[graft.functions.CollectLongs]] — a primitive-long group buffer
    // instead of collect_list's per-row UnsafeRow copies (§5 memory: the
    // bucket aggregation was the GC hot spot of the whole pipeline).
    // Same member arrays minus the 1-field struct wrapper, so the id
    // accessor flips from m.id to m; non-long ids (generic callers) keep
    // collect_list. withEstimate members carry the sig array — not a
    // long — and stay on collect_list structurally.
    val bareIds = !withEstimate &&
      docs.schema(idCol).dataType == org.apache.spark.sql.types.LongType
    val buckets = (if (bareIds)
        banded.groupBy("band_key")
          .agg(graft.functions.CollectLongs.collectLongs(col("id")).as("members"))
      else
        banded.groupBy("band_key")
          .agg(collect_list(struct(memberCols: _*)).as("members")))
      .filter(size(col("members")) > 1)
      .withColumn("members", capMembers(bucketCap, if (bareIds) "m" else "m.id"))
    val txt = if (carryText)
      ", 'ta', if(m.id <= n.id, m.text, n.text), 'tb', if(m.id <= n.id, n.text, m.text)"
    else ""
    val est = if (withEstimate)
      ", 'matches', size(filter(zip_with(m.sig, n.sig, (x, y) -> x = y), eq -> eq))"
    else ""
    // within-bucket pairs (i < j), then global dedup. The member array is
    // bound ONCE as a lambda variable (`transform(array(members), ms -> …)`)
    // so the capped-array expression upstream is evaluated a single time per
    // bucket even though the pair expansion references it three times —
    // projection collapse can otherwise inline a non-trivial producer per use.
    val (mid, nid) = if (bareIds) ("m", "n") else ("m.id", "n.id")
    val pairs = buckets.select(explode(expr(
      s"""flatten(flatten(transform(array(members), ms ->
         |  transform(ms, (m, i) ->
         |    transform(slice(ms, i + 2, size(ms)), n ->
         |      named_struct('a', least($mid, $nid), 'b', greatest($mid, $nid)$est$txt))))))""".stripMargin)).as("p"))
    if (!withEstimate)
      pairs.select(col("p.a").as("a"), col("p.b").as("b")).distinct()
    else {
      val estCol = (col("p.matches") * 1.0 / numHashes).as("est_jaccard")
      if (carryText)
        pairs.select(col("p.a"), col("p.b"), estCol, col("p.ta"), col("p.tb"))
          .groupBy("a", "b").agg(max("est_jaccard").as("est_jaccard"),
            first("ta").as("ta"), first("tb").as("tb"))
      else
        pairs.select(col("p.a"), col("p.b"), estCol)
          .groupBy("a", "b").agg(max("est_jaccard").as("est_jaccard"))
    }
  }

  /** Full MinHash near-dup pipeline: LSH candidates → exact shingle-set
    * Jaccard verification ≥ `threshold`. Candidates carry BARE IDS
    * (`withEstimate = false` — the exact verify below decides membership,
    * so the LSH estimate would be dead weight), and verification joins
    * the (few) candidate pairs back to the corpus for their texts: the
    * band-bucket shuffle then moves one id per (doc, band) instead of
    * full documents — or signatures — replicated once per band; at
    * corpus scale that is the difference between shuffling ~16 B/doc and
    * ~16× the corpus text volume. The text join-back broadcasts ONLY the
    * id-tagged pair rows (no text in the broadcast, so its size is a few
    * dozen bytes per candidate pair): the corpus streams map-side through
    * one BroadcastHashJoin, and matched texts regroup to pairs via one
    * shuffle whose volume is 2×pairs — which degrades gracefully (plain
    * shuffle) if a pathological corpus produces a huge candidate set,
    * where broadcasting text-carrying rows would OOM. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 2, bucketCap: Int = 1000): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, numHashes, bands,
      shingleSize, carryText = false, bucketCap = bucketCap, withEstimate = false)
    val t = docs.select(col(idCol), col(textCol))
    // one row per pair ENDPOINT (ids only) → broadcast onto the corpus →
    // regroup matched texts per pair
    val tagged = cands.select(col("a"), col("b"),
      explode(array(
        struct(lit("a").as("role"), col("a").as("id")),
        struct(lit("b").as("role"), col("b").as("id")))).as("m"))
      .select(col("a"), col("b"), col("m.role"), col("m.id"))
    val matched = t.select(col(idCol).as("id"), col(textCol).as("txt"))
      .join(broadcast(tagged), "id")
    val paired = matched.groupBy("a", "b")
      .agg(max(when(col("role") === "a", col("txt"))).as("ta"),
        max(when(col("role") === "b", col("txt"))).as("tb"))
    withExactJaccard(paired, shingleSize)
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Adds an exact shingle-set Jaccard `jaccard` column from the frame's
    * `ta`/`tb` text columns, as built-ins over the native [[shinglesCol]]
    * arrays (already distinct, so sizes are set sizes and
    * `array_intersect` is set intersection). Each side's shingle array is
    * materialized in its own projection first: the Shingles expression is
    * non-cheap and multiply referenced, so `CollapseProject` will not
    * inline it back — single evaluation per side is structural, not a
    * bet on runtime subexpression elimination. NULL text (either side)
    * yields a NULL score under ANY conf: without the explicit guard,
    * `spark.sql.ansi.enabled=false` makes `size(NULL)` = −1, and a
    * both-NULL pair would score (−1)/(−1) = 1.0 and pass the threshold.
    * Per-candidate-pair work, but keeping it native keeps the whole
    * verify stage in whole-stage codegen. Shared with the streaming
    * near-dup confirm step ([[graft.streaming.StreamOps]]), which names
    * its text columns differently — hence the column-name parameters. */
  private[graft] def withExactJaccard(df: DataFrame, shingleSize: Int,
      aText: String = "ta", bText: String = "tb"): DataFrame = {
    val (sa, sb) = (col("__sa"), col("__sb"))
    val inter = size(array_intersect(sa, sb))
    // __sa/__sb AND jaccard are EvalOnce-pinned: every caller filters on
    // `jaccard >= threshold` next, and Catalyst pushed that predicate
    // below both projections, re-deriving shingles+intersect per pair
    // inside the Filter (then again in the Project) — 2-3× the verify
    // stage's per-pair cost. Pinned, the filter tests the materialized
    // column; values are bit-identical (EvalOnce is an identity).
    df.withColumn("__sa", graft.functions.EvalOnce(shinglesCol(col(aText), shingleSize)))
      .withColumn("__sb", graft.functions.EvalOnce(shinglesCol(col(bText), shingleSize)))
      .withColumn("jaccard", graft.functions.EvalOnce(
        when(sa.isNull || sb.isNull, lit(null).cast("double"))
          .otherwise(inter * 1.0 / (size(sa) + size(sb) - inter))))
      .drop("__sa", "__sb")
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash over word-bigram shingle hashes: bit j of the result
    * is the sign of the sum of ±1 votes from each shingle's hash bit j.
    * Shingle hashes come from [[shingleHashes]] (word-hash mixing, no
    * shingle string materialization — any uniform 64-bit family votes
    * identically in distribution, and the signature is engine-specific
    * by contract: the oracle-reproducible twin is [[simhash60Sql]]). */
  val simhash64: Column => Column =
    c => org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.Simhash64(
        org.apache.spark.sql.graft.GraftSql.expression(c)))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using
    * 4×16-bit block indexing: by pigeonhole, any pair within Hamming ≤ 3
    * shares at least one exact 16-bit block, so the result is EXACTLY the
    * brute-force pair set for maxHamming ≤ 3 (the classic 64-bit/k=3
    * near-dup configuration). Larger thresholds would need more/narrower
    * blocks (k+1 blocks for completeness at Hamming k) at the cost of
    * bigger buckets. `bucketCap` bounds the per-bucket pair expansion for
    * identical-document floods (see [[capMembers]]). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bucketCap: Int = 1000): DataFrame = {
    // null text → no signature → no buckets; filter the INPUT column so
    // the pushed-down predicate doesn't re-evaluate simhash64 per row
    // (see minhashCandidates) — Simhash64 is null iff its input is
    val sh = parallelizeForKernel(
        docs.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val blocked = sh.select(col("id"), col("sim"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blk_val", expr("shiftrightunsigned(sim, cast(blk * 16 AS INT)) & 65535"))
    // (id, sim) are two bigints — bucket members aggregate through the
    // primitive-buffer CollectLongPairs (same §5 rationale as the d06
    // path in minhashCandidates: no per-row UnsafeRow copies, raw-long
    // spill form); the member structs keep the id/sim field names so
    // every downstream expression is unchanged. Non-long ids fall back.
    val longIds = docs.schema(idCol).dataType == org.apache.spark.sql.types.LongType
    val buckets = (if (longIds)
        blocked.groupBy("blk", "blk_val")
          .agg(graft.functions.CollectLongs
            .collectLongPairs(col("id"), col("sim"), "id", "sim").as("members"))
      else
        blocked.groupBy("blk", "blk_val")
          .agg(collect_list(struct(col("id"), col("sim"))).as("members")))
      .filter(size(col("members")) > 1)
      .withColumn("members", capMembers(bucketCap))
    // member array bound once as a lambda var — see minhashCandidates
    buckets.select(explode(expr(
      """flatten(flatten(transform(array(members), ms ->
        |  transform(ms, (m, i) ->
        |    transform(slice(ms, i + 2, size(ms)), n ->
        |      named_struct('a', least(m.id, n.id), 'b', greatest(m.id, n.id),
        |        'hamming', bit_count(m.sim ^ n.sim)))))))""".stripMargin)).as("p"))
      .select("p.a", "p.b", "p.hamming")
      .filter(col("hamming") <= maxHamming) // filter BEFORE the dedup shuffle
      .distinct()
  }

  /** The md5-derived 60-bit SimHash signatures (id, sig) behind
    * [[simhashNearDupsSql]] — built ENTIRELY from `md5` plus collection
    * lambdas, so a SQL engine re-runs the pipeline bit-for-bit (the d07b
    * DuckDB oracle does). Tokens are the non-empty whitespace splits of
    * lower(text); shingles the distinct word bigrams (the whole text when
    * fewer than two tokens); a shingle's hash is its md5's leading 60
    * bits (15 hex chars, sign-safe in a long); signature bit j is the
    * majority vote over shingle-hash bits j.
    *
    * Scale shape: the vote aggregate is groupBy(id, bit) — map-side
    * combinable, so the shuffle carries ≤ 60 rows per doc regardless of
    * document size — then one groupBy(id) assembles the signature. All
    * codegen'd built-ins, no UDF. */
  def simhash60Sql(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // t is null iff the text is (lower/split/filter all propagate null);
    // filtering the input column avoids re-evaluating the split in the
    // pushed-down predicate
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')").as("t"))
    val sh = toks.select(col("id"), explode(when(size(col("t")) < 2,
        array(array_join(col("t"), " ")))
      .otherwise(expr("array_distinct(transform(sequence(1, size(t) - 1), " +
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))"))).as("s"))
    val hashed = sh.select(col("id"),
      expr("cast(conv(substr(md5(s), 1, 15), 16, 10) AS bigint)").as("h"))
    val votes = hashed.select(col("id"), col("h"),
        explode(sequence(lit(0), lit(59))).as("j"))
      .groupBy("id", "j")
      .agg(sum(when(expr("(shiftrightunsigned(h, j) & 1) = 1"), 1).otherwise(-1)).as("v"))
    votes.groupBy("id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(cast(1 AS bigint), j)"))
        .otherwise(0L)).as("sig"))
  }

  /** [[simhashNearDups]]'s oracle-reproducible twin over [[simhash60Sql]]
    * signatures. Pairing is the same 4-block pigeonhole (15-bit blocks on
    * the 60-bit signature — exact for Hamming ≤ 3); NO bucket cap,
    * because the twin's contract is exact equality with the brute-force
    * oracle (the capped production path is [[simhashNearDups]]). */
  def simhashNearDupsSql(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "15-bit pigeonhole blocks are exact only to Hamming <= 3")
    val sigs = simhash60Sql(docs, idCol, textCol)
    val blocked = sigs.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blk_val", expr("shiftrightunsigned(sig, cast(blk * 15 AS INT)) & 32767"))
    // primitive-buffer member collection — same rationale as
    // [[simhashNearDups]]; [[simhash60Sql]] always emits bigint (id, sig)
    // when the id is a bigint (the contract d07b shape)
    val longIds = docs.schema(idCol).dataType == org.apache.spark.sql.types.LongType
    val buckets = (if (longIds)
        blocked.groupBy("blk", "blk_val")
          .agg(graft.functions.CollectLongs
            .collectLongPairs(col("id"), col("sig"), "id", "sig").as("members"))
      else
        blocked.groupBy("blk", "blk_val")
          .agg(collect_list(struct(col("id"), col("sig"))).as("members")))
      .filter(size(col("members")) > 1)
    buckets.select(explode(expr(
      """flatten(flatten(transform(array(members), ms ->
        |  transform(ms, (m, i) ->
        |    transform(slice(ms, i + 2, size(ms)), n ->
        |      named_struct('a', least(m.id, n.id), 'b', greatest(m.id, n.id),
        |        'hamming', bit_count(m.sig ^ n.sig)))))))""".stripMargin)).as("p"))
      .select("p.a", "p.b", "p.hamming")
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- benchmark decontamination ---------------------------------------

  /** Cross-corpus contamination pairs: every (corpus doc, eval doc) pair
    * sharing at least `minShared` distinct word n-gram shingles — the
    * benchmark-decontamination pass a training pipeline runs against its
    * eval sets before training. Inverted-index join keyed on the
    * shingle; the eval side is tiny by construction (an eval set is
    * thousands of docs, the corpus billions), so at scale the eval
    * shingle table broadcasts and the corpus stream never shuffles. */
  def contaminationPairs(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 2,
      minShared: Int = 3): DataFrame = {
    def sh(c: Column): Column = shinglesCol(c, shingleSize)
    val c = corpus.select(col(idCol).as("corpus_id"), explode(sh(col(textCol))).as("s"))
    val e = evalSet.select(col(idCol).as("eval_id"), explode(sh(col(textCol))).as("s"))
    c.join(broadcast(e), "s")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
      .filter(col("n_shared") >= minShared)
  }

  /** [[contaminationPairs]] with a Bloom prefilter — the shape for when
    * the eval side outgrows a broadcast HASH relation but its BLOOM
    * filter still fits anywhere (tens of millions of shingles ≈ a few
    * MB at 1% fpp). Three stages, all Spark-native expressions:
    *
    *   1. `bloom_agg(xxhash64(s))` over the eval shingles — a real
    *      partial/merge aggregate; the driver sees only the serialized
    *      filter (bounded by the numBits cap), which ships to executors
    *      as a literal in the probe expression.
    *   2. `bloom_might_contain(filter, xxhash64(s))` prefilters the
    *      corpus shingle stream MAP-SIDE (codegen'd, no shuffle): Bloom
    *      has no false negatives, so no true hit is lost; the stream
    *      that reaches the join shrinks to matches + the fpp tail.
    *   3. The exact join confirms survivors, so false positives die
    *      here — the result EQUALS [[contaminationPairs]] exactly, which
    *      is what makes the operator hash-checkable against the same
    *      oracle. No broadcast hint on the join: the prefiltered stream
    *      is small, and AQE picks the strategy from its real size.
    */
  def contaminationPairsBloom(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 2,
      minShared: Int = 3, estimatedItems: Long = 1L << 20): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.BloomFunctions.registerAll(spark)
    def sh(c: Column): Column = shinglesCol(c, shingleSize)
    val c = corpus.select(col(idCol).as("corpus_id"), explode(sh(col(textCol))).as("s"))
    val e = evalSet.select(col(idCol).as("eval_id"), explode(sh(col(textCol))).as("s"))
    val filterBytes = e.select(call_function("bloom_agg",
        xxhash64(col("s")), lit(estimatedItems)).as("bf"))
      .head().getAs[Array[Byte]](0) // the one driver-side value: the sketch itself
    // an EMPTY eval side aggregates to a NULL sketch — skip the prefilter
    // (the join against the empty side yields nothing regardless)
    val pre = if (filterBytes == null) c
      else c.filter(call_function("bloom_might_contain", lit(filterBytes), xxhash64(col("s"))))
    pre.join(e, "s")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---- exact n-gram Jaccard via inverted index -------------------------

  /** All-pairs exact n-gram Jaccard ≥ threshold, computed with an
    * inverted-index join: explode distinct shingles → drop shingles with
    * document frequency > maxDf (non-discriminative, and the source of
    * posting-list blowup) → co-count per pair → Jaccard from
    * |A∩B| / (|A|+|B|-|A∩B|).  All shuffles key on shingle or pair ids. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, shingleSize: Int = 2, maxDf: Int = 100): DataFrame = {
    def sh(c: Column): Column = shinglesCol(c, shingleSize)
    // kernel-input spread (the q111/d06 rule): the callers pass bounded
    // audit slices that scan as one split at every SF, and the planner
    // broadcasts one side of the posting self-join — so the shingle
    // explode AND the whole pair expansion ran inside that single scan
    // task (d08: 19 s of a 21.6 s sf0.1 wall in one task)
    val spread = parallelizeForKernel(docs)
    val exploded = spread.select(col(idCol).as("id"), explode(sh(col(textCol))).as("s"))
    val sizes = exploded.groupBy("id").agg(count(lit(1)).as("n"))
    val pruned = exploded.join(
      exploded.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf && col("df") > 1), "s")
    val co = pruned.as("x").join(pruned.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("common"))
    co.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jaccard", col("common") * 1.0 / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** DIRECTED containment pairs: (a, b) where |A∩B| / |A| ≥ threshold —
    * "a is (mostly) inside b". The asymmetric twin of
    * [[ngramJaccardPairs]]: Jaccard misses a short document embedded in
    * a long one (the union dilutes the score), but containment is
    * exactly the quote/boilerplate/subset-duplicate detector a training
    * corpus needs. Same inverted-index shape — explode distinct
    * shingles, co-count per pair (both directions of each undirected
    * co-count pair are emitted), normalize by the CONTAINED side's set
    * size only. maxDf caps posting lists the same way; note the classic
    * prefix filter does NOT apply here (containment has no lower bound
    * on |B|, so there is no length filter either — df-capping is the
    * honest prune). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, shingleSize: Int = 2, maxDf: Int = 1000000): DataFrame = {
    def sh(c: Column): Column = shinglesCol(c, shingleSize)
    // kernel-input spread — same single-split pair-expansion pathology
    // as [[ngramJaccardPairs]]
    val spread = parallelizeForKernel(docs)
    val exploded = spread.select(col(idCol).as("id"), explode(sh(col(textCol))).as("s"))
    val sizes = exploded.groupBy("id").agg(count(lit(1)).as("n"))
    val pruned = exploded.join(
      exploded.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf && col("df") > 1), "s")
    val co = pruned.as("x").join(pruned.as("y"),
        col("x.s") === col("y.s") && col("x.id") =!= col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("common"))
    co.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .withColumn("containment", col("common") * 1.0 / col("na"))
      .filter(col("containment") >= threshold)
      .select("a", "b", "containment")
  }

  // ---- incremental near-dups (fresh batch vs historical corpus) --------

  /** Near-duplicate pairs TOUCHING a fresh batch: fresh×corpus and
    * fresh×fresh pairs with exact Jaccard ≥ threshold — never
    * corpus×corpus. This is the operator a continuously-ingesting
    * pipeline actually runs: yesterday's corpus is already deduped;
    * today's batch must be checked against history and itself without
    * re-paying the historical pair space.
    *
    * Scale design (100 TB): both sides are signature-banded like
    * [[minhashCandidates]], but only FRESH rows probe the buckets, so
    * per-bucket work is |fresh∩bucket| × |bucket| — zero old-old
    * expansion (the incremental win; at a daily-batch:history ratio of
    * 1:1000 that is 1000× fewer candidate pairs than a full re-run). A
    * deterministic per-bucket cap (fresh rows ranked first, so the cap
    * only ever evicts corpus flood members) bounds identical-document
    * floods exactly like the batch path. Candidate ids join back for
    * texts (candidates are few); ids must be disjoint across the two
    * inputs. Returns (a, b, jaccard) with a < b. */
  def minhashNearDupsIncremental(corpus: DataFrame, fresh: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 2,
      bucketCap: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    def sigs(df: DataFrame, isFresh: Boolean) =
      df.filter(col(textCol).isNotNull) // == sig.isNotNull, minus the re-eval
        .select(col(idCol).as("id"), col(textCol).as("txt"),
          minhashSignature(numHashes, shingleSize)(col(textCol)).as("sig"))
        .withColumn("is_fresh", lit(isFresh))
    val all = sigs(corpus, isFresh = false).unionByName(sigs(fresh, isFresh = true))
    val banded = all.select(col("id"), col("sig"), col("is_fresh"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_key",
        hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
    val w = Window.partitionBy(col("band_key"))
      .orderBy(col("is_fresh").desc, hash(col("id")), col("id"))
    // cut: the capped bucket table is BOTH candidate-join sides (probe
    // x, corpus y) — uncut, each side re-derived the banding AND re-ran
    // the minhash signature kernel over every document (the pipeline's
    // dominant map cost) a second time
    val capped = graft.operators.Lineage.cut(
      banded.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= bucketCap)
        .select("band_key", "id", "is_fresh"))
    val probes = capped.filter(col("is_fresh"))
    val cand = probes.as("x").join(capped.as("y"),
        col("x.band_key") === col("y.band_key") &&
          (col("y.is_fresh") === false || col("x.id") < col("y.id")))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
      .distinct()
    val texts = all.select(col("id"), col("txt"))
    val paired = cand
      .join(texts.select(col("id").as("a"), col("txt").as("ta")), "a")
      .join(texts.select(col("id").as("b"), col("txt").as("tb")), "b")
    withExactJaccard(paired, shingleSize)
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ---- exact Jaccard via prefix filtering (AllPairs/PPJoin) ------------

  /** All-pairs exact n-gram Jaccard ≥ threshold via PREFIX FILTERING —
    * same result set as [[ngramJaccardPairs]], different scale shape.
    *
    * Each document's shingles are sorted rarest-first by the global
    * (document-frequency, shingle) order; only the first
    * n − ceil(τ·n) + 1 tokens (the "prefix") enter the candidate join.
    * The prefix-filtering principle (Bayardo et al. WWW'07 "Scaling Up
    * All Pairs Similarity Search", Xiao et al. WWW'08 PPJoin): two sets
    * with overlap ≥ α must share a token within their first |x|−α+1
    * ordered tokens, and Jaccard ≥ τ implies overlap ≥ ceil(τ·|x|) —
    * so the candidate set is provably complete. A length filter
    * (τ·nx ≤ ny ≤ nx/τ) prunes further before verification.
    *
    * Scale design (100 TB): the inverted-index variant posts EVERY
    * token; this posts only the prefix — and rarest-first ordering
    * makes prefix tokens exactly the low-df ones, so posting lists are
    * SHORTER than the full inverted index without the lossy maxDf
    * cutoff. They are NOT bounded: prefix filtering constrains which
    * tokens each doc posts, not how many docs post a given token, so a
    * corpus-hot token that is still some docs' rarest keeps a posting
    * list proportional to corpus size and the candidate join goes
    * quadratic on that key (measured at sf10/500k docs: hot bigrams in
    * thousands of prefixes → 74 GB of spill). Exact all-pairs Jaccard
    * at scale therefore follows the audit-slice doctrine (d08/d41):
    * run the exact join on a bounded corpus prefix; the unbounded
    * production path is banded MinHash. The df join and candidate
    * join shuffle on the shingle; verification shuffles on the pair
    * ids. Threshold math uses exact decimal arithmetic so the prefix
    * length is never rounded short (a double ulp there would silently
    * drop boundary pairs). */
  def setSimPrefixJoin(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, shingleSize: Int = 2): DataFrame = {
    // the double's exact decimal expansion can run past Spark's 38-digit
    // cap; FLOOR-rounding to 18 places keeps tau <= the true threshold,
    // which errs on LONGER prefixes / LOOSER length filters — extra
    // candidates are verified away, so completeness is preserved
    val tau = new java.math.BigDecimal(threshold)
      .setScale(18, java.math.RoundingMode.FLOOR)
    def sh(c: Column): Column = shinglesCol(c, shingleSize)
    val exploded = docs.select(col(idCol).as("id"), explode(sh(col(textCol))).as("s"))
    val dfreq = exploded.groupBy("s").agg(count(lit(1)).as("df"))
    // rarest-first per-doc token order; prefix length n - ceil(tau*n) + 1
    // materialized ONCE (lazy localCheckpoint): the plan references it
    // three times (prefix posting + both verify sides), and recomputing
    // the df join + per-doc sort per reference tripled the runtime
    val sorted = exploded.join(dfreq, "s")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("toks"))
      .select(col("id"), expr("transform(toks, t -> t.s)").as("ts"),
        size(col("toks")).as("n"))
      .localCheckpoint(false)
    val prefix = sorted
      .withColumn("plen", (col("n") - ceil(col("n") * lit(tau)) + 1).cast("int"))
      .select(col("id"), col("n"), explode(slice(col("ts"), lit(1), col("plen"))).as("s"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id") &&
          col("y.n") >= col("x.n") * lit(tau) && col("x.n") >= col("y.n") * lit(tau))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // verify: candidates are FEW (that is the point of the prefix), so
    // fetch the two token arrays per pair and intersect directly — no
    // re-explosion of the corpus, no per-token shuffle for the verify
    cand
      .join(sorted.select(col("id").as("a"), col("ts").as("tsa"), col("n").as("na")), "a")
      .join(sorted.select(col("id").as("b"), col("ts").as("tsb"), col("n").as("nb")), "b")
      .withColumn("common", size(array_intersect(col("tsa"), col("tsb"))))
      .withColumn("jaccard", col("common") * 1.0 / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }
}
