package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState, MapState}
import org.apache.spark.sql.{Encoder, Encoders}

/** Structured Streaming operators: watermarked tumbling/sliding windows
  * and stateful gap-based sessionization.
  *
  * These are transforms over any streaming (or batch) DataFrame with an
  * event-time column — `readStream` → transform → `writeStream` wiring
  * stays with the caller. State design for scale: sessionization keys on
  * user id (high cardinality → even distribution), keeps O(1) state per
  * key (running aggregate, not the event list), and relies on event-time
  * timeout for eviction, so state size is bounded by concurrently-active
  * sessions, not history.
  */
object StreamOps {

  /** Tumbling-window counts + sums with a watermark: late events beyond
    * `watermarkDelay` are dropped; windows finalize (append mode) once the
    * watermark passes their end. */
  def windowedEventCounts(events: DataFrame, tsCol: String, typeCol: String,
      windowLength: String = "1 hour", watermarkDelay: String = "30 minutes"): DataFrame = {
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(typeCol))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("cnt"), col("sum_value"))
  }

  /** Streaming DISTINCT-user counts per tumbling window — the streaming
    * twin of q134's batch window-distinct rewrite. Structured Streaming
    * rejects COUNT(DISTINCT) in stateful aggregations, so the engine
    * stages it: watermarked dedup on (type, window, user) — state is
    * one key per distinct user per OPEN window, the same bound the
    * batch collect_set rewrite carries per frame — followed by a plain
    * windowed count (two chained stateful operators, append mode;
    * windows finalize when the watermark passes their end). At very
    * high cardinality the KMV sketch aggregates (q116-q118, already
    * proven under the streaming state store) are the approximate swap. */
  def windowedDistinctUsers(events: DataFrame, tsCol: String, typeCol: String,
      userCol: String, windowLength: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    // the window struct inherits the event-time watermark; the raw ts
    // column must NOT survive alongside it (two event-time columns is a
    // streaming analysis error)
    val deduped = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(typeCol), window(col(tsCol), windowLength).as("w"), col(userCol))
      .dropDuplicatesWithinWatermark(typeCol, "w", userCol)
    deduped
      .groupBy(col("w"), col(typeCol))
      .agg(count(lit(1)).as("distinct_users"))
      .select(col("w.start").as("window_start"), col(typeCol), col("distinct_users"))
  }

  /** Streaming exact dedup on a fingerprint column: each document is
    * emitted at most once per watermark horizon. State holds only the
    * fingerprint keys inside the watermark window
    * (`dropDuplicatesWithinWatermark`), so it is bounded by arrival rate
    * × delay — the streaming twin of [[graft.dedup.Dedup.exactDupGroups]]
    * for continuous ingestion pipelines. */
  def dedupStream(docs: DataFrame, tsCol: String, fpCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Stream-stream interval join: each left event pairs with right
    * events for the same key whose timestamp falls in
    * `[left.ts - lookback, left.ts]` (e.g. clicks joined to the
    * impressions that preceded them). Both sides carry watermarks, so
    * Spark bounds the join state to the lookback + delay horizon — the
    * state-cleanup condition a production stream-stream join needs.
    * EVERY right-side column is exposed with an `r_` prefix in the
    * output, so both streams may freely share column names (including
    * the common case of both calling their event-time column `ts`). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    intervalJoined(left, right, keyCol, leftTs, rightTs, lookback,
      watermarkDelay, "inner")

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]], but a
    * left row with no right match within the lookback window is still
    * emitted (right columns NULL) once the watermark passes its join
    * horizon — the "enrich if seen, pass through regardless" shape
    * (e.g. conn events with/without a matching alert). Same bounded
    * state: the time-interval condition lets Spark evict both sides. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    intervalJoined(left, right, keyCol, leftTs, rightTs, lookback,
      watermarkDelay, "left_outer")

  /** FULL OUTER stream-stream interval join: unmatched rows from BOTH
    * sides emit NULL-padded once the watermark passes their horizon —
    * the reconciliation shape (two event feeds that should mirror each
    * other; leftovers on either side are the discrepancy report). Same
    * bounded state as the inner variant. */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    intervalJoined(left, right, keyCol, leftTs, rightTs, lookback,
      watermarkDelay, "full_outer")

  private def intervalJoined(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String,
      watermarkDelay: String, joinType: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$rightTs", watermarkDelay)
    l.join(r, expr(
      s"""$keyCol = r_$keyCol AND
         |r_$rightTs >= $leftTs - INTERVAL $lookback AND
         |r_$rightTs <= $leftTs""".stripMargin), joinType)
  }

  /** Streaming point-in-time enrichment (the feature-store lookup): each
    * stream row gains the payload of the dimension row with the greatest
    * `dimTimeCol` ≤ its `streamTimeCol` for the same key — the as-of join
    * against a SLOWLY-CHANGING DIMENSION, without leaking future feature
    * values into past events (training-serving skew's root cause).
    *
    * A stream-static equi-join cannot express the argmax-per-row, and a
    * stream-stream as-of needs unbounded right state; the honest scale
    * design is the one every feature store ships: snapshot the dimension
    * (dimension-sized BY CONTRACT — the one collect), broadcast
    * key → time-sorted payload arrays, binary-search per row. Map-only:
    * no shuffle, no state, works identically over batch and streaming
    * frames. Refresh cadence = re-plan cadence (restart or
    * foreachBatch-rebuild for a live dimension).
    *
    * Time columns must be integral (epoch micros/millis — cast
    * timestamps upstream). NULL key or time rows pass through unmatched;
    * dimension rows with NULL key/time are dropped from the snapshot.
    * Duplicate (key, time) dimension rows collapse deterministically to
    * the greatest payload tuple ([[collapseDimTies]]) in BOTH this and
    * the distributed form — tie resolution never depends on topology.
    *
    * Steer by dimension size: this collect-and-broadcast form up to
    * ~100 MB of payload; beyond that, [[asofLookupLarge]] keeps the
    * dimension distributed (foreachBatch + the native as-of merge
    * join) with identical output. */
  /** Deterministic tie collapse for an as-of dimension: rows sharing
    * (key, effective-time) are reduced to ONE survivor — the greatest
    * payload tuple in Spark's struct (lexicographic-by-field) ordering.
    * Without this, "which tied row wins" depends on shuffle arrival /
    * collect order, i.e. on cluster topology — the local[4] and
    * local-cluster runs of the SAME lookup returned different payloads
    * (caught by `StreamOpsSpec` under `SPARK_GRAFT_TEST_MASTER`), and a
    * task RETRY recomputing a partition could disagree with its first
    * run, which poisons Spark's recomputation model. A map-side partial
    * max keeps the extra agg cheap (ties are rare; the agg shrinks the
    * dim before the join's own shuffle). Dimensions with an UNORDERABLE
    * payload column (e.g. a map) skip the collapse — duplicate
    * (key, time) rows there keep engine-chosen tie resolution, which is
    * a dimension-modeling error to begin with (an SCD effective-time
    * should be unique per key). */
  private def collapseDimTies(dim: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    val orderable = payloadCols.forall(c =>
      RowOrdering.isOrderable(dim.schema(c).dataType))
    if (payloadCols.isEmpty || !orderable) dim
    else dim.groupBy(col(keyCol), col(timeCol))
      .agg(max(struct(payloadCols.map(col): _*)).as("__p"))
      .select(col(keyCol) +: col(timeCol) +:
        payloadCols.map(c => col("__p").getField(c).as(c)): _*)
  }

  def asofLookup(stream: DataFrame, dim: DataFrame, keyCol: String,
      streamTimeCol: String, dimTimeCol: String, prefix: String = "dim_"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val payloadCols = dim.columns.filterNot(c => c == keyCol || c == dimTimeCol).toSeq
    val snap = collapseDimTies(
      dim.select((Seq(keyCol, dimTimeCol) ++ payloadCols).map(col): _*),
      keyCol, dimTimeCol, payloadCols).collect()
    val byKey: Map[Any, (Array[Long], Array[IndexedSeq[Any]])] =
      snap.iterator.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).toArray
        .groupBy(_.get(0))
        .map { case (k, rs) =>
          val sorted = rs.sortBy(_.getAs[Number](1).longValue())
          (k, (sorted.map(_.getAs[Number](1).longValue()),
            sorted.map(r => (2 until r.size).map(r.get): IndexedSeq[Any])))
        }
    val bc = stream.sparkSession.sparkContext.broadcast(byKey)
    val keyIdx = stream.columns.indexOf(keyCol)
    val timeIdx = stream.columns.indexOf(streamTimeCol)
    require(keyIdx >= 0, s"column '$keyCol' not found in ${stream.columns.toSeq}")
    require(timeIdx >= 0, s"column '$streamTimeCol' not found in ${stream.columns.toSeq}")
    val dimSchema = dim.schema
    val outSchema = StructType(stream.schema.fields ++ payloadCols.map(c =>
      dimSchema(c).copy(name = prefix + c, nullable = true)))
    val nPayload = payloadCols.size
    stream.mapPartitions { it =>
      val m = bc.value
      it.map { r =>
        val matched: IndexedSeq[Any] =
          if (r.isNullAt(keyIdx) || r.isNullAt(timeIdx)) null
          else m.get(r.get(keyIdx)) match {
            case Some((times, payloads)) =>
              val t = r.getAs[Number](timeIdx).longValue()
              // greatest i with times(i) <= t
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
              if (ans >= 0) payloads(ans) else null
            case None => null
          }
        val extra: Seq[Any] =
          if (matched == null) Seq.fill[Any](nPayload)(null) else matched
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }

  /** [[asofLookup]] for dimensions TOO BIG to collect: identical output
    * (same columns, same as-of semantics, same NULL handling), but the
    * dimension stays DISTRIBUTED — both sides hash-partition on the key
    * and the native [[graft.plans.AsofMergeJoin]] exec does one
    * two-pointer merge per partition pair. Cost: one shuffle of the
    * batch + one of the dimension per call, vs [[asofLookup]]'s zero
    * shuffles but driver-resident dimension. Steer by dimension size:
    * collect-and-broadcast up to ~100 MB of payload, this beyond.
    *
    * This is a BATCH transform by design — streaming callers run it per
    * micro-batch inside `foreachBatch`, which is exactly where a
    * billion-row dimension refresh belongs (re-read the dimension there
    * for a live one):
    * {{{
    * events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
    *   StreamOps.asofLookupLarge(batch, dim, "user", "t", "ft")
    *     .write.mode("append").parquet(out)
    * }.start()
    * }}}
    *
    * NULL semantics mirror [[asofLookup]]: NULL-key/time stream rows
    * pass through unmatched (they route AROUND the join — the merge
    * exec would otherwise group NULL keys together), NULL-key/time
    * dimension rows are dropped. */
  def asofLookupLarge(batch: DataFrame, dim: DataFrame, keyCol: String,
      streamTimeCol: String, dimTimeCol: String, prefix: String = "dim_"): DataFrame = {
    // resolve keyCol/dimTimeCol against the dimension with the SESSION
    // resolver (case-insensitive by default) — the merge join resolves
    // names that way, so a case-mismatched keyCol must exclude the key
    // from the payload here too, not surface later as a confusing
    // unionByName column mismatch
    val resolver = dim.sparkSession.sessionState.conf.resolver
    def resolved(name: String, what: String): String =
      dim.columns.find(resolver(_, name)).getOrElse(throw new IllegalArgumentException(
        s"$what column '$name' not found in dimension columns ${dim.columns.toSeq}"))
    val dimKey = resolved(keyCol, "key")
    val dimTime = resolved(dimTimeCol, "dimension time")
    val payloadCols =
      dim.columns.filterNot(c => resolver(c, dimKey) || resolver(c, dimTime)).toSeq
    val dimClean = collapseDimTies(dim
      .filter(col(dimKey).isNotNull && col(dimTime).isNotNull)
      .select((Seq(dimKey, dimTime) ++ payloadCols).map(col): _*),
      dimKey, dimTime, payloadCols)
    val matched = graft.plans.AsofMergeJoin.asofBackward(
      batch.filter(col(keyCol).isNotNull && col(streamTimeCol).isNotNull),
      dimClean, Seq(keyCol), streamTimeCol, dimTimeCol, rightPrefix = prefix)
    val dimSchema = dim.schema
    val unmatched = payloadCols.foldLeft(
      batch.filter(col(keyCol).isNull || col(streamTimeCol).isNull)) {
      (df, c) => df.withColumn(prefix + c, lit(null).cast(dimSchema(c).dataType))
    }
    matched.unionByName(unmatched)
  }

  /** Online benchmark decontamination: tag a document STREAM against a
    * STATIC eval/benchmark set — the ingestion-time twin of the batch
    * [[graft.dedup.Dedup.contaminationPairs]]/`contaminationPairsBloom`
    * operators. A document is contaminated when it shares at least
    * `minShared` distinct word n-gram shingles with ANY eval document.
    *
    * Scale/state design: entirely MAP-SIDE per micro-batch — no
    * stream-side shuffle, no streaming state, append-mode safe. The
    * static side is collapsed ONCE at plan time into (a) a Bloom filter
    * over eval shingle hashes (codegen'd `bloom_might_contain` first
    * pass) and (b) with `exactConfirm` a broadcast shingle set that
    * kills the Bloom's false-positive tail (no false negatives exist:
    * blooms never miss). Eval sets are benchmark-sized by construction
    * (thousands of docs), so the broadcast is a few MB; for a
    * pathologically large eval side, set `exactConfirm = false` and
    * accept the fpp tail on the DROP side only.
    *
    * Returns the input columns plus `n_shared` and `contaminated`;
    * callers keep `!contaminated`. With `exactConfirm`, `n_shared` is
    * the exact shared-shingle count for every document the Bloom pass
    * implicates, and 0 for documents it already clears (bloom counts
    * only overestimate, so a might-count below the threshold proves the
    * exact count is too). */
  def streamingDecontaminate(docs: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 2,
      minShared: Int = 3, estimatedItems: Long = 1L << 20,
      exactConfirm: Boolean = true): DataFrame = {
    val spark = evalSet.sparkSession
    graft.functions.BloomFunctions.registerAll(spark)
    // native codegen shingler ([[graft.functions.Shingles]]) — the same
    // property-pinned kernel the batch decontamination paths use, so
    // stream and batch agree bit-for-bit on what a shingle is. NULL text
    // → NULL array, exactly like the Scala UDF this replaces.
    def sh(c: Column): Column = graft.dedup.Dedup.shinglesCol(c, shingleSize)

    // static side, evaluated once at plan time (distributed agg; the
    // driver holds only the serialized sketch / the distinct eval set)
    val evalShingles = evalSet
      .select(explode(sh(col(textCol))).as("s")).distinct()
    val filterBytes = evalShingles
      .select(call_function("bloom_agg", xxhash64(col("s")), lit(estimatedItems)).as("bf"))
      .head().getAs[Array[Byte]](0)

    if (filterBytes == null) {
      // empty eval set → nothing can be contaminated
      return docs.withColumn("n_shared", lit(0L))
        .withColumn("contaminated", lit(false))
    }

    val mightCount = size(filter(sh(col(textCol)), s =>
      call_function("bloom_might_contain", lit(filterBytes), xxhash64(s)))).cast("long")

    val counted =
      if (!exactConfirm) docs.withColumn("n_shared", mightCount)
      else {
        // exact confirm, fully native: |doc shingles ∩ eval shingles| via
        // array_intersect against the distinct eval-shingle array shipped
        // as one plan literal (both sides are distinct sets, so intersect
        // size IS the shared count; sorted for a deterministic plan).
        // Eval sets are benchmark-sized by construction — the literal is
        // the same few MB the replaced broadcast Set held, now inside
        // whole-stage codegen instead of a per-row Scala UDF round-trip.
        // greatest(0, ·) pins the NULL-text row to 0 like the old UDF
        // (unreachable via the bloom gate at sane minShared, where
        // might = −1 already short-circuits, but structural is better).
        val evalArr = evalShingles.collect().map(_.getString(0)).sorted
        val exactCount = greatest(lit(0L),
          size(array_intersect(sh(col(textCol)), typedlit(evalArr))).cast("long"))
        // bloom first (cheap, codegen'd): only docs the bloom already
        // implicates pay the exact set lookups
        docs.withColumn("__might", mightCount)
          .withColumn("n_shared",
            when(col("__might") < minShared, lit(0L))
              .otherwise(exactCount))
          .drop("__might")
      }
    counted.withColumn("contaminated", col("n_shared") >= minShared)
  }

  case class ProfileEvent(key: String, item: String, bytes: Long)
  case class ProfileAgg(nEvents: Long, totalBytes: Long, nDistinct: Long)
  case class ProfileOut(key: String, n_events: Long, total_bytes: Long,
      n_distinct_items: Long)

  /** Per-entity running profile via the `transformWithState` arbitrary-
    * state API (Spark 4.x): one [[ValueState]] for the O(1) running
    * aggregate and one [[MapState]] for the per-item counts backing the
    * exact distinct count. MapState keys live in the state store (RocksDB
    * at scale), NOT in an in-memory collection per key, so a high-fanout
    * entity (a scanner hitting every port) grows state linearly in the
    * store, never in executor heap — the property `mapGroupsWithState`'s
    * single-blob state can't give. `ttl` evicts idle entities' state by
    * processing time (the operational bound for an unbounded key space:
    * state size tracks ACTIVE entities). Emits one updated profile row
    * per entity per micro-batch (Update mode).
    *
    * The entity-profile shape for zeek-style streams: key = source addr,
    * item = dest port (distinct-items = fanout — the scan detector
    * input), bytes = payload size. */
  class EntityProfileProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, ProfileEvent, ProfileOut] {
    @transient private var agg: ValueState[ProfileAgg] = _
    @transient private var seen: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[ProfileAgg]("agg", Encoders.product[ProfileAgg], ttl)
      seen = getHandle.getMapState[String, Long]("seen",
        Encoders.STRING, Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[ProfileEvent],
        tv: TimerValues): Iterator[ProfileOut] = {
      var a = if (agg.exists()) agg.get() else ProfileAgg(0L, 0L, 0L)
      rows.foreach { e =>
        if (!seen.containsKey(e.item)) {
          seen.updateValue(e.item, 1L)
          a = a.copy(nDistinct = a.nDistinct + 1)
        } else seen.updateValue(e.item, seen.getValue(e.item) + 1L)
        a = a.copy(nEvents = a.nEvents + 1, totalBytes = a.totalBytes + e.bytes)
      }
      agg.update(a)
      Iterator.single(ProfileOut(key, a.nEvents, a.totalBytes, a.nDistinct))
    }
  }

  /** [[EntityProfileProcessor]] wired over a stream: requires the RocksDB
    * state store provider (`spark.sql.streaming.stateStore.providerClass`
    * — transformWithState does not run on the default HDFS-backed store). */
  def entityProfiles(events: Dataset[ProfileEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[ProfileOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new EntityProfileProcessor(ttl),
        TimeMode.None(), OutputMode.Update(), implicitly[Encoder[ProfileOut]])
  }

  case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  case class TopKEvent(ts: java.sql.Timestamp, key: String)
  /** Space-Saving summary state: parallel arrays keep the encoder simple. */
  case class TopKState(keys: Array[String], counts: Array[Long], errs: Array[Long])
  case class TopKOut(window_start: java.sql.Timestamp, rank: Int, key: String,
    cnt: Long, err: Long)

  /** Per-window streaming heavy hitters via the SPACE-SAVING summary
    * (Metwally et al., ICDT'05): each open tumbling window keeps at most
    * `capacity` counters; an unseen key evicts the minimum counter and
    * inherits its count as its error bound. Guarantees: estimates only
    * OVERcount, by at most the recorded `err` ≤ N/capacity — so every key
    * with true frequency > N/capacity is retained, and `cnt - err` is a
    * certain lower bound. When the event-time watermark passes the window
    * end, the top `k` summaries emit exactly once (append mode).
    *
    * Scale/state design: state is O(capacity) per open window regardless
    * of key cardinality — the flood-proof property the exact per-key map
    * lacks. Grouping keys on the window start means per-window volume
    * lands on one task; Space-Saving summaries are MERGEABLE (Agarwal et
    * al., PODS'12), so beyond single-task rates, salt the group key and
    * merge the per-salt summaries downstream. Batch-side replays use the
    * exact q74 CMS/heavy-hitter path instead. Within a micro-batch the
    * slice is sorted by (ts, key) before updating, so results are
    * deterministic under Spark's unordered batch delivery. */
  def windowedTopK(events: Dataset[TopKEvent], windowMillis: Long = 3600000L,
      k: Int = 3, capacity: Int = 256,
      watermarkDelay: String = "10 minutes"): Dataset[TopKOut] = {
    import events.sparkSession.implicits._
    require(k <= capacity, "k must be <= capacity")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime - Math.floorMod(e.ts.getTime, windowMillis))
      .flatMapGroupsWithState[TopKState, TopKOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart: Long, batch: Iterator[TopKEvent], state: GroupState[TopKState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.keys.indices.map(i => (s.keys(i), s.counts(i), s.errs(i)))
              .sortBy { case (key, c, _) => (-c, key) }
              .take(k).zipWithIndex.map { case ((key, c, e), i) =>
                TopKOut(new java.sql.Timestamp(wstart), i + 1, key, c, e)
              }.iterator
          } else {
            val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
            state.getOption.foreach { s =>
              var i = 0
              while (i < s.keys.length) {
                m(s.keys(i)) = (s.counts(i), s.errs(i)); i += 1
              }
            }
            batch.toArray.sortBy(e => (e.ts.getTime, e.key)).foreach { e =>
              m.get(e.key) match {
                case Some((c, er)) => m(e.key) = (c + 1, er)
                case None if m.size < capacity => m(e.key) = (1L, 0L)
                case None => // evict the min counter (key tie-break: determinism)
                  val (mk, (mc, _)) = m.minBy { case (key, (c, _)) => (c, key) }
                  m.remove(mk)
                  m(e.key) = (mc + 1, mc) // inherit min count as the error bound
              }
            }
            val arr = m.toArray
            state.update(TopKState(arr.map(_._1),
              arr.map(_._2._1), arr.map(_._2._2)))
            state.setTimeoutTimestamp(wstart + windowMillis)
            Iterator.empty
          }
      }
  }

  /** Streaming near-duplicate detection against a HISTORICAL corpus —
    * the d29/d62 incremental-LSH shape lifted to Structured Streaming:
    * the static corpus is banded ONCE into an LSH bucket index
    * (signature-only rows + the text for the confirm step), each
    * arriving document signs map-side and stream-static-joins on the
    * band key, and candidate pairs confirm with exact shingle Jaccard.
    * A (stream, corpus) pair matching through several bands collapses
    * via `dropDuplicatesWithinWatermark` keyed on the pair — bounded
    * state, exactly-once pair emission within the watermark. At 100 TB
    * the corpus index is a one-off batch artifact (re-bucketed only on
    * compaction); per-trigger cost is proportional to the BATCH, never
    * the corpus pair space. */
  def streamingNearDups(stream: DataFrame, idCol: String, tsCol: String,
      textCol: String, corpus: DataFrame, corpusIdCol: String,
      corpusTextCol: String, threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 2,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val rows = numHashes / bands
    def banded(df: DataFrame, id: String, text: String, pfx: String) =
      df.filter(col(text).isNotNull) // == __sig.isNotNull, minus the re-eval
        .withColumn("__sig",
          graft.dedup.Dedup.minhashSignature(numHashes, shingleSize)(col(text)))
        .select((col(id).as(s"${pfx}_id") +: (if (pfx == "s") Seq(col(tsCol)) else Nil)) ++ Seq(
          col(text).as(s"${pfx}_text"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"),
          col("__sig").as(s"${pfx}_sig")): _*)
        .withColumn("band_key",
          hash(col("band"), slice(col(s"${pfx}_sig"), col("band") * rows + 1, lit(rows))))
        .drop(s"${pfx}_sig", "band")
    val corpusIdx = banded(corpus, corpusIdCol, corpusTextCol, "c")
    val probes = banded(stream.withWatermark(tsCol, watermarkDelay),
      idCol, textCol, "s")
    // exact-Jaccard confirm through the batch pipeline's native codegen
    // expressions (Shingles + array_intersect — the same code path d06
    // verifies with), not a per-pair ScalaUDF: identical arithmetic
    // (shinglesCol is already distinct, so sizes are set sizes) and the
    // confirm stage stays inside whole-stage codegen per micro-batch
    val scored = graft.dedup.Dedup.withExactJaccard(
      probes.join(corpusIdx, Seq("band_key")),
      shingleSize, aText = "s_text", bText = "c_text")
    scored
      .filter(col("jaccard") >= threshold)
      .select(col(tsCol), col("s_id"), col("c_id"), col("jaccard"))
      .dropDuplicatesWithinWatermark("s_id", "c_id")
  }

  /** Streaming kNN-graph INSERT maintenance — the new-node side of the
    * e43 incremental update lifted to Structured Streaming: the static
    * corpus is signed and bucketed ONCE (a batch artifact, like
    * [[streamingNearDups]]'s index); each arriving vector signs
    * map-side, expands its 9 Hamming-≤1 probe buckets, stream-static
    * joins the bucket index, and emits its top-`topK` corpus edges
    * with the integer-exact quantized scores (the fused
    * [[graft.functions.LongDot]] scorer). Ranking uses a watermarked
    * aggregate with a bounded sorted-array top-k — streaming supports
    * no rank windows, and the candidate set per probe is bounded by
    * bucket occupancy, so the collect_list is small by construction.
    * Per-trigger cost ∝ batch × occupancy, never corpus size; the
    * affected-OLD-node repair stays a batch job (e43). */
  def streamingKnnInserts(stream: DataFrame, idCol: String, tsCol: String,
      vecCol: String, corpus: DataFrame, corpusIdCol: String,
      corpusVecCol: String, topK: Int = 3,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val spark = corpus.sparkSession
    def ldot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.longDot(spark)(a, b)
    // Same hardening as the batch candidate stage (knnCandidatesBetween):
    // the 4096 per-bucket occupancy cap (the d06 hot-bucket rule — a
    // degenerate signature would otherwise make every trigger's
    // stream-static join and the collect_list state quadratic in that
    // bucket) and the n2 > 0 guard (a zero vector's cosine is NaN, which
    // sorts GREATEST and would top every ranking). The corpus index is a
    // static batch artifact, so the capping window is legal here.
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("neighbor_id"))
    val corpusIdx = corpus
      .select(col(corpusIdCol).as("neighbor_id"), col(corpusVecCol).as("__cv"))
      .withColumn("c_q",
        expr("transform(__cv, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))"))
      .withColumn("bucket", graft.ann.Ann.lshSignatureQuantized(col("__cv")))
      .withColumn("c_n2", ldot(col("c_q"), col("c_q")))
      .filter(col("c_n2") > 0)
      .withColumn("__brn", row_number().over(bw))
      .filter(col("__brn") <= 4096)
      .drop("__cv", "__brn")
    val probes = stream.withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).as("s_id"), col(tsCol).as("__ts"), col(vecCol).as("__v"))
      .withColumn("s_q",
        expr("transform(__v, v -> CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT))"))
      .withColumn("__sig", graft.ann.Ann.lshSignatureQuantized(col("__v")))
      .withColumn("s_n2", ldot(col("s_q"), col("s_q")))
      .filter(col("s_n2") > 0)
      .select(col("s_id"), col("__ts"), col("s_q"), col("s_n2"),
        explode(expr(
          "transform(sequence(0, 8), i -> CASE WHEN i = 0 THEN __sig " +
            "ELSE CAST(__sig ^ shiftleft(1, i - 1) AS INT) END)")).as("bucket"))
    probes.join(corpusIdx, Seq("bucket"))
      .filter(col("s_id") =!= col("neighbor_id"))
      .withColumn("qdot", ldot(col("s_q"), col("c_q")))
      .withColumn("cosq", col("qdot").cast("double") /
        (sqrt(col("s_n2").cast("double")) * sqrt(col("c_n2").cast("double"))))
      .groupBy(col("s_id"), col("__ts"))
      .agg(expr(s"slice(array_sort(collect_list(struct(-cosq AS nc, " +
        s"neighbor_id, qdot))), 1, $topK)").as("top"))
      .select(col("s_id"), col("__ts").as(tsCol), posexplode(col("top")))
      .select(col("s_id"), col(tsCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.neighbor_id").as("neighbor_id"), col("col.qdot").as("qdot"))
  }

  case class DriftEvent(key: String, event_id: Long, ts: java.sql.Timestamp,
    value: Double)
  case class DriftState(n: Long, sum: Double, ph: Double, phMin: Double)
  case class DriftAlarm(key: String, event_id: Long, n: Long, mean: Double,
    ph_dev: Double)

  /** Streaming drift detection per metric key via the PAGE-HINKLEY test
    * (the online CUSUM variant; Page 1954, Gama et al. 2014) — the
    * streaming twin of batch q136: PH_t accumulates x_t − mean_t − δ,
    * and an alarm fires when PH_t − min(PH) exceeds `lambda`. State is
    * O(1) per key (n, sum, ph, phMin — no event history), the detector
    * RESTARTS after each alarm (standard change-adaptation), and batch
    * slices sort by (ts, event_id) before updating so results are
    * deterministic under Spark's unordered micro-batch delivery. Emits
    * one row per alarm (Update mode, no timeout — state lives as long
    * as the key; callers with unbounded key spaces should front a TTL
    * via the entityProfiles transformWithState shape instead). */
  def driftMonitor(events: Dataset[DriftEvent], delta: Double = 0.0,
      lambda: Double = 50.0): Dataset[DriftAlarm] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[DriftState, DriftAlarm](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[DriftEvent], state: GroupState[DriftState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[DriftAlarm]
          var s = state.getOption.getOrElse(DriftState(0L, 0.0, 0.0, 0.0))
          batch.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val n = s.n + 1
            val sum = s.sum + e.value
            val mean = sum / n
            val ph = s.ph + (e.value - mean - delta)
            val phMin = math.min(s.phMin, ph)
            if (ph - phMin > lambda) {
              out += DriftAlarm(key, e.event_id, n, mean, ph - phMin)
              s = DriftState(0L, 0.0, 0.0, 0.0) // restart after the alarm
            } else s = DriftState(n, sum, ph, phMin)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when no event arrives within `gapMillis` (enforced by
    * event-time timeout against the watermark) and is emitted exactly
    * once. */
  def sessionize(events: Dataset[SessionEvent], gapMillis: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption

          if (state.hasTimedOut) {
            st.foreach(s => out += SessionOut(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastSeen),
              s.nEvents, s.sumValue))
            state.remove()
          } else {
            // events within a micro-batch are not ordered: sort this slice
            val evs = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            evs.foreach { e =>
              val t = e.ts.getTime
              st match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  st = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case Some(s) => // gap exceeded inside the batch: close + reopen
                  out += SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.nEvents, s.sumValue)
                  st = Some(SessionState(t, t, 1, e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
          }
          out.iterator
      }
  }

  // --- streaming CDC snapshot maintenance ---------------------------------

  /** Maintain a materialized latest-state table from a CDC change stream:
    * every micro-batch folds into the current snapshot via
    * [[graft.operators.CdcMerge.applyChanges]] (latest-wins upsert /
    * delete / reinsert) and lands as a NEW versioned directory
    * `snapshotDir/v<batchId>` — readers ([[readSnapshot]]) always see a
    * complete, immutable version, never a half-written one.
    *
    * Replay safety without a table format: the merge base for batch N is
    * the LARGEST version strictly below N, so a batch replayed after a
    * crash rebuilds `v<N>` from the same base it used the first time
    * (latest-wins application is idempotent), and a reader pointed at a
    * stale version only lags, never corrupts. Versions older than
    * `keepVersions` behind are pruned after each commit — bounded
    * storage, while in-flight readers of the previous version finish.
    *
    * Ordering: within a batch the `versionCol` orders changes; ACROSS
    * batches arrival order wins (standard CDC-apply semantics — feed
    * the stream in commit order).
    *
    * At 100 TB the same plan holds: the window shuffles only the batch,
    * the anti-join broadcasts the (small) batch against the snapshot,
    * and the parquet rewrite distributes — no driver-side data movement.
    * (A production deployment would swap the directory-version commit
    * for a table format's transaction log; the merge plan is unchanged.) */
  def maintainSnapshot(changes: DataFrame, snapshotDir: String,
      checkpointDir: String, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op",
      keepVersions: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applySnapshotBatch(batch.toDF(), batchId, snapshotDir, keyCols,
          versionCol, opCol, keepVersions)
      }
      .start()

  /** One CDC-apply step of [[maintainSnapshot]] (also usable from a batch
    * backfill loop): merge `batch` onto the latest snapshot version below
    * `batchId` and commit the result as `v<batchId>`. */
  def applySnapshotBatch(batch: DataFrame, batchId: Long, snapshotDir: String,
      keyCols: Seq[String], versionCol: String, opCol: String,
      keepVersions: Int): Unit = {
    if (batch.isEmpty) return // nothing to fold; readers keep the prior version
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val baseCols = batch.columns.filter(c => c != versionCol && c != opCol)
    val base = snapshotVersions(fs, dir).filter(_ < batchId).sorted.lastOption match {
      case Some(v) => spark.read.parquet(s"$snapshotDir/v$v")
      case None    => batch.select(baseCols.map(col).toSeq: _*).limit(0)
    }
    graft.operators.CdcMerge.applyChanges(base, batch, keyCols, versionCol, opCol)
      .write.mode("overwrite").parquet(s"$snapshotDir/v$batchId")
    // prune all but the newest `keepVersions` committed versions
    snapshotVersions(fs, dir).sorted.dropRight(keepVersions)
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(dir, s"v$v"), true))
  }

  /** The current materialized state: the highest committed version (a
    * version directory is complete once parquet's job commit renamed it
    * into place — `_SUCCESS` marks it). */
  def readSnapshot(spark: SparkSession, snapshotDir: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    snapshotVersions(fs, dir).sorted.lastOption match {
      case Some(v) => spark.read.parquet(s"$snapshotDir/v$v")
      case None => throw new IllegalStateException(
        s"no committed snapshot versions under $snapshotDir")
    }
  }

  private def snapshotVersions(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(1).toLong)

  // --- streaming incremental aggregate maintenance ------------------------

  /** Maintain a materialized per-key AGGREGATE table (count / decimal sum
    * / min / max, [[graft.operators.IncrementalAgg]]) from an append
    * stream: every micro-batch folds its partial aggregates into the
    * current state — O(batch) work per tick, the history is never
    * re-scanned — and commits a NEW versioned directory exactly like
    * [[maintainSnapshot]]. Replay safety is the same argument: the merge
    * base for batch N is the largest version strictly below N, and
    * `merge` is deterministic, so a replayed batch rebuilds `v<N>`
    * bit-identically. This is the streaming half of q92's
    * maintenance-≡-recompute contract (IncrementalAggSpec proves the
    * batch half). */
  def maintainAggregate(stream: DataFrame, stateDir: String,
      checkpointDir: String, keyCols: Seq[String], valueCol: String,
      keepVersions: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyAggregateBatch(batch.toDF(), batchId, stateDir, keyCols,
          valueCol, keepVersions)
      }
      .start()

  // --- streaming SCD2 history maintenance ---------------------------------

  /** Maintain a type-2 slowly-changing-dimension HISTORY table
    * ([[graft.operators.Scd2]]) from a CDC change stream: every
    * micro-batch folds into the current history via [[graft.operators
    * .Scd2.applyBatch]] — closed intervals are immutable, only the
    * touched keys' tails are rebuilt — and commits a NEW versioned
    * directory exactly like [[maintainSnapshot]] (same replay argument:
    * base for batch N is the largest committed version below N, and the
    * fold is deterministic, so replays rebuild `v<N>` identically).
    * Requires globally monotone change versions across batches (the
    * standard commit-ordered CDC feed). */
  def maintainScd2(changes: DataFrame, historyDir: String,
      checkpointDir: String, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op",
      keepVersions: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyScd2Batch(batch.toDF(), batchId, historyDir, keyCols,
          versionCol, opCol, keepVersions)
      }
      .start()

  /** One fold step of [[maintainScd2]] (also usable from a batch
    * backfill loop). */
  def applyScd2Batch(batch: DataFrame, batchId: Long, historyDir: String,
      keyCols: Seq[String], versionCol: String, opCol: String,
      keepVersions: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(historyDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val next = snapshotVersions(fs, dir).filter(_ < batchId).sorted.lastOption match {
      case Some(v) => graft.operators.Scd2.applyBatch(
        spark.read.parquet(s"$historyDir/v$v"), batch, keyCols, versionCol, opCol)
      case None => graft.operators.Scd2.buildHistory(batch, keyCols, versionCol, opCol)
    }
    next.write.mode("overwrite").parquet(s"$historyDir/v$batchId")
    snapshotVersions(fs, dir).sorted.dropRight(keepVersions)
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(dir, s"v$v"), true))
  }

  /** One fold step of [[maintainAggregate]] (also usable from a batch
    * backfill loop). */
  def applyAggregateBatch(batch: DataFrame, batchId: Long, stateDir: String,
      keyCols: Seq[String], valueCol: String, keepVersions: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(stateDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val merged = snapshotVersions(fs, dir).filter(_ < batchId).sorted.lastOption match {
      case Some(v) => graft.operators.IncrementalAgg.merge(
        spark.read.parquet(s"$stateDir/v$v"), batch, keyCols, valueCol)
      case None => graft.operators.IncrementalAgg.init(batch, keyCols, valueCol)
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    snapshotVersions(fs, dir).sorted.dropRight(keepVersions)
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(dir, s"v$v"), true))
  }
}
