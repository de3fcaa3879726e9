package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Event-stream (batch-over-log) operators: sessionization, tumbling
  * windows, semi-structured extraction.
  *
  * The events table carries nanosecond parquet timestamps, which Spark's
  * vectorized reader rejects; we read them as raw nano longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and do exact integer
  * microsecond math — which also sidesteps any cross-engine timestamp
  * rendering differences in the oracle comparison.
  */
object EventQueries {

  /** events with `tus` = epoch micros, robust to how the generator wrote
    * `ts`: TIMESTAMP(NANOS) parquet arrives as raw nano longs (exact
    * integer division), TIMESTAMP(MICROS) without a zone arrives as
    * TIMESTAMP_NTZ — wall-clock micros rebuilt from timezone-FREE parts
    * (date + h/m/s.micros), bit-identical to DuckDB's
    * `epoch_us(CAST(ts AS TIMESTAMP))` twin without casting through
    * TIMESTAMP (which would bake the session timezone into the instant;
    * events() used to pin spark.sql.session.timeZone globally for this —
    * ADVICE r6 — and no longer mutates session state beyond the
    * nanosAsLong READ conf documented in Tables.events). Zoned micros
    * arrive as TIMESTAMP (`unix_micros` directly — instant-based, no tz). */
  private def events(s: SparkSession, d: String): DataFrame = {
    val df = Tables.events(s, d)
    val tus = df.schema("ts").dataType match {
      case LongType           => expr("ts div 1000")
      case _: TimestampNTZType => expr(
        "unix_date(cast(ts as date)) * 86400000000 + " +
          "(hour(ts) * 3600 + minute(ts) * 60) * CAST(1000000 AS BIGINT) + " +
          "cast(extract(SECOND FROM ts) * 1000000 AS BIGINT)")
      case _                  => expr("unix_micros(ts)")
    }
    df.withColumn("tus", tus)
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** q114's per-user RFM metric aggregate (exposed for RankTwinSpec's
    * ntile-window oracle). */
  private[graft] def rfmBase(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("user_id"))
      .agg(max(col("tus")).as("recency"),
        count(lit(1)).as("frequency"),
        coalesce(sum(when(col("event_type") === "purchase", dec(col("value")))),
          lit(0).cast(DecimalType(18, 2))).as("monetary"))

  /** q145's core: the Kaplan-Meier table (event days only) for
    * signup → first-purchase durations, right-censored at stream end.
    * `ev` needs (user_id, event_type, tus). */
  private[queries] def survivalTable(ev: DataFrame): DataFrame = {
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t0"))
    val pu = ev.filter(col("event_type") === "purchase").join(su, "user_id")
      .filter(col("tus") >= col("t0"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
    val tmax = ev.agg(max(col("tus")).as("tmax"))
    val subj = su.join(pu, Seq("user_id"), "left").crossJoin(broadcast(tmax))
      .select(col("user_id"),
        when(col("t1").isNotNull, expr("(t1 - t0) div 86400000000"))
          .otherwise(expr("(tmax - t0) div 86400000000")).as("dur"),
        col("t1").isNotNull.as("ev"))
    val days = subj.groupBy(col("dur")).agg(
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("ev"), 1L).otherwise(0L)).as("c"))
    val n = subj.agg(count(lit(1)).as("n_subjects"))
    val w = Window.orderBy(col("dur")).rowsBetween(Window.unboundedPreceding, -1)
    days.crossJoin(broadcast(n))
      .withColumn("removed_before", coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .withColumn("n_risk", col("n_subjects") - col("removed_before"))
      .filter(col("d") > 0)
      .select(col("dur").as("t_day"), col("n_risk"),
        col("d").as("n_events"), col("c").as("n_censored"),
        round(lit(1.0) - col("d").cast(DoubleType) / col("n_risk"), 6).as("km_factor"))
  }

  /** q136's core (exposed for AuditSpec's planted step-change test).
    * `ev` needs (event_type, event_id, tus, value). */
  private[queries] def cusumChangepoints(evIn: DataFrame): DataFrame = {
    val ev = evIn.select(col("event_type"), col("event_id"), col("tus"),
      expr("CAST(floor(value * 1000) AS BIGINT)").as("q"))
    val tot = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("tq"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("tus"), col("event_id"))
    val cs = ev
      .withColumn("i", row_number().over(w).cast(LongType))
      .withColumn("ps", sum(col("q").cast(DecimalType(28, 0)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("sabs", abs(col("ps") * col("n") -
        col("i").cast(DecimalType(28, 0)) * col("tq")))
    val top = Window.partitionBy(col("event_type"))
      .orderBy(col("sabs").desc, col("i"))
    cs.withColumn("rk", row_number().over(top)).filter(col("rk") === 1)
      .select(col("event_type"), col("n"), col("i").as("cp_index"),
        col("event_id").as("cp_event_id"),
        col("sabs").cast(DoubleType).as("cusum_max"))
  }

  /** ntile(k)'s exact bucket rule as map-side arithmetic over a 1-based
    * global rank: the first n%k buckets take n/k+1 rows, the rest n/k.
    * The divisions are exact (numerators below 2^52 stay integral in
    * doubles), so this reproduces `ntile(k) OVER (ORDER BY ...)`
    * bit-for-bit without the single-task global window. */
  private def ntileOfRank(rank: Column, n: Long, k: Int): Column = {
    val bs  = n / k
    val rem = n % k
    val b =
      if (bs == 0) rank
      else when(rank <= (bs + 1) * rem, floor((rank - 1) / lit(bs + 1)) + 1)
        .otherwise(lit(rem) + floor((rank - 1 - (bs + 1) * rem) / lit(bs)) + 1)
    b.cast(IntegerType)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // gap-based sessionization (30-minute inactivity threshold)
    // Single-shuffle shape (the q08/q09 pattern): RangePartitioning on
    // user_id serves the lag window's clustering, the per-user groupBy,
    // AND the deterministic final ORDER BY — without it the ordered
    // output costs a second full exchange of the aggregate.
    "q29_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      events(s, d)
        .repartitionByRange(col("user_id"))
        .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
        .orderBy(col("user_id"))
    }),

    // tumbling 1-hour windows per event type
    "q30_event_windows" -> ((s, d) => {
      events(s, d)
        .groupBy((col("tus") - pmod(col("tus"), lit(3600L * 1000000L))).as("hour_us"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          // exact cents sum at long speed (see functions/ExactSum.scala)
          graft.functions.ExactSum.sumExact(col("value"), 2).as("sum_value"))
        .orderBy(col("hour_us"), col("event_type"))
    }),

    // semi-structured extraction from the props JSON-ish payload
    "q31_event_props" -> ((s, d) => {
      events(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(IntegerType))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), max(col("k")).as("max_k"))
        .orderBy(col("k_bucket"))
    }),

    // time-series gap fill: hourly counts per event type with ZERO rows
    // for empty hours — spine (generated hour series) × type dims, left
    // join of the aggregated counts. The spine/dims sides are tiny (hours
    // × types), so at scale this is two broadcasts onto a one-shuffle agg.
    "q33_gapfill" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("hour_us", col("tus") - pmod(col("tus"), lit(3600L * 1000000L)))
      val bounds = e.agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
      val spine = bounds.select(
        explode(sequence(col("lo"), col("hi"), lit(3600L * 1000000L))).as("hour_us"))
      val types = e.select(col("event_type")).distinct()
      val counts = e.groupBy(col("hour_us"), col("event_type")).agg(count(lit(1)).as("cnt"))
      spine.crossJoin(types)
        .join(counts, Seq("hour_us", "event_type"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .orderBy(col("hour_us"), col("event_type"))
    }),

    // RANGE-interval window frame: trailing-1-hour count and value sum
    // per event — the frame is defined by the ORDER-BY VALUE (integer
    // micros), not row position, so duplicate timestamps are peers in
    // both engines. The one window op Spark's frames support that row
    // frames can't express; decimal sums → double only at the boundary.
    "q121_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("tus"))
        .rangeBetween(-3600L * 1000000L, 0L)
      events(s, d)
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(dec(col("value"))).over(w).cast(DoubleType))
        .select(col("event_id"), col("event_type"), col("tus"),
          col("cnt_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    }),

    // linear gap interpolation over the q33 hourly spine: missing hours
    // get prev + (next−prev)·(t−t0)/(t1−t0) between the surrounding
    // known points (leading/trailing gaps clamp to the nearest known
    // value) — the time-series repair step between q33's zero-fill and
    // q65's forward-fill. Hour arithmetic is exact integer micros; the
    // interpolation is the only float op, mirrored term-for-term.
    "q122_linear_interp" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("hour_us", col("tus") - pmod(col("tus"), lit(3600L * 1000000L)))
      val known = e.groupBy(col("event_type"), col("hour_us"))
        .agg(sum(dec(col("value"))).cast(DoubleType).as("v"))
      val bounds = e.agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
      val spine = bounds.select(
        explode(sequence(col("lo"), col("hi"), lit(3600L * 1000000L))).as("hour_us"))
      val types = e.select(col("event_type")).distinct()
      val grid = spine.crossJoin(types)
        .join(known, Seq("event_type", "hour_us"), "left")
      val wp = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pt", last(when(col("v").isNotNull, col("hour_us")),
          ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
        .withColumn("nt", first(when(col("v").isNotNull, col("hour_us")),
          ignoreNulls = true).over(wn))
        .withColumn("interp",
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") +
              (col("nv") - col("pv")) * (col("hour_us") - col("pt")) / (col("nt") - col("pt"))))
        .select(col("event_type"), col("hour_us"),
          col("v").isNotNull.as("known"), col("interp"))
        .orderBy(col("event_type"), col("hour_us"))
    }),

    // U-shaped (position-based) multi-touch attribution: each purchase
    // closes a journey of the user's view/click touches since the
    // previous purchase; its value is credited 40% to the first touch,
    // 40% to the last, 20% split across the middles (1 touch → 100%,
    // 2 → 50/50). Journey ids come from a running purchase count — one
    // (user) window shuffle; per-journey stats are windows over the
    // (user, journey) key. Per-touch credits are DECIMAL-cast before the
    // final aggregate (exact, associative — the d21 rule). Journeys are
    // per-user, so at 100 TB the shuffle is key-balanced by user and no
    // single partition sees more than one user's history.
    "q123_attribution" -> ((s, d) => {
      val ev = events(s, d)
        .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
      val wu = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grouped = ev
        .withColumn("grp", sum(col("is_p")).over(wu) - col("is_p"))
      val wj = Window.partitionBy(col("user_id"), col("grp"))
      val touches = grouped
        .withColumn("pv", max(when(col("is_p") === 1, col("value"))).over(wj))
        .filter(col("event_type").isin("view", "click") && col("pv").isNotNull)
      val wt = Window.partitionBy(col("user_id"), col("grp"))
        .orderBy(col("tus"), col("event_id"))
      val credited = touches
        .withColumn("pos", row_number().over(wt))
        .withColumn("nt", count(lit(1)).over(wj))
        .withColumn("credit",
          when(col("nt") === 1, lit(1.0))
            .when(col("nt") === 2, lit(0.5))
            .when(col("pos") === 1 || col("pos") === col("nt"), lit(0.4))
            .otherwise(lit(0.2) / (col("nt") - 2)))
        .withColumn("cv", (col("credit") * col("pv")).cast(DecimalType(18, 6)))
      credited.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("cv")).cast(DoubleType), 4).as("attributed_value"))
        .orderBy(col("event_type"))
    }),

    // metric drift detection: chi-square contributions of the late half
    // of the event stream against the early half's value histogram — the
    // shape-shift monitor a pipeline runs across ingest snapshots. The
    // median time cut comes from GlobalRank ordinals (range-partitioned
    // parallel sort; the size pass reuses the range shuffle, so there is
    // no separate count() job and no limit(n/2) single-task funnel —
    // both were r6 scale findings); bounds/totals are tiny broadcast
    // scalars; binning is map-only and guards the constant-stream case
    // (mx = mn would be 0/0 = NaN, where DuckDB's CAST raises). Per-bin
    // contributions are pure IEEE arithmetic emitted PER ROW (no
    // cross-row float sum), so the result hash-checks.
    "q124_drift_chi2" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("tus"), col("value"))
      val (ranked, n) = graft.operators.GlobalRank
        .withGlobalIndexAndCount(ev, "__idx", col("tus"), col("event_id"))
      val k = math.ceil(n / 2.0).toLong
      val bounds = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      val hist = ranked.crossJoin(broadcast(bounds))
        .withColumn("early", col("__idx") < k)
        .withColumn("bin", when(col("mx") === col("mn"), lit(0)).otherwise(
          least(lit(9),
            floor((col("value") - col("mn")) * 10 / (col("mx") - col("mn"))).cast(IntegerType))))
        .groupBy(col("bin"))
        .agg(sum(when(col("early"), 1).otherwise(0)).as("n_early"),
          sum(when(!col("early"), 1).otherwise(0)).as("n_late"))
      val totals = hist.agg(sum(col("n_early")).as("ne"), sum(col("n_late")).as("nl"))
      hist.crossJoin(broadcast(totals))
        .withColumn("expected", col("n_early") * (col("nl") * lit(1.0) / col("ne")))
        .withColumn("dev", col("n_late") - col("expected"))
        .select(col("bin"), col("n_early"), col("n_late"),
          when(col("expected") > 0,
            round(col("dev") * col("dev") / col("expected"), 6)).as("contrib"))
        .orderBy(col("bin"))
    }),

    // beaconing detection — the classic Zeek-log analytic: entities whose
    // inter-arrival gaps are suspiciously REGULAR (low coefficient of
    // variation = automated callbacks; humans are bursty). Gap moments
    // accumulate as exact integers/decimals (gaps are long micros; the
    // squared sum is DECIMAL(38,0) — gap² overflows int64), so the
    // aggregation is order-independent (the q60 rule) and doubles appear
    // only in the final per-row CV formula. One lag window + one agg,
    // both keyed by user — scales by entity count.
    "q125_beacon_cv" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val gaps = events(s, d)
        .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
        .filter(col("gap").isNotNull)
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("s1"),
          sum(col("gap").cast(DecimalType(38, 0)) * col("gap").cast(DecimalType(38, 0)))
            .as("s2"))
        .filter(col("n_gaps") >= 2)
        .withColumn("mean_gap", col("s1").cast(DoubleType) / col("n_gaps"))
        .withColumn("variance",
          (col("s2").cast(DoubleType) -
            col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n_gaps")) /
            (col("n_gaps") - 1))
        .select(col("user_id"), col("n_gaps"),
          // integer micros, floor division — round(double, 4) at ~5e10
          // magnitude is 15 significant digits, where Spark's and
          // DuckDB's round() disagree in the last digit (caught at
          // sf0.1); cv is O(1), so 6 decimals is safely within double
          expr("s1 div n_gaps").as("mean_gap_us"),
          round(sqrt(col("variance")) / col("mean_gap"), 6).as("cv"))
        .orderBy(col("user_id"))
    }),

    // hourly-series autocorrelation at lags 1-3 — the seasonality probe
    // behind anomaly detectors. Hourly sums stay DECIMAL(18,2) (exact);
    // lagged pairs come from an hour-shifted self-equi-join (never a
    // moving DISTINCT-user count per type over a trailing 3-hour window
    // — the SQL surface is `count(DISTINCT u) OVER (... RANGE 2
    // PRECEDING)`, which Spark lacks. The naive rewrite
    // (size(collect_set()) over the RANGE frame) partitions only by
    // event type — a handful of single-task sorts over every
    // (hour, user) row at 100 TB, the d12-class scale killer — so the
    // ENGINE's formulation is the forward projection: each distinct
    // (type, hour, user) row contributes to the ≤3 windows it keeps the
    // user active for (map-only ×3 explode), then one countDistinct
    // aggregate keyed on (type, window-hour) — shuffle-parallel in
    // hours, not types. The window rewrite survives as the
    // MiningSpec twin proving the two formulations agree; the DuckDB
    // oracle is the NATIVE windowed DISTINCT (an independent
    // formulation on the engine that has one).
    "q134_window_distinct" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
          expr("tus div 3600000000").as("hidx"), col("user_id"))
        .distinct()
      val proj = e.select(col("event_type"),
        explode(expr("sequence(hidx, hidx + 2)")).as("hidx"), col("user_id"))
      val hours = e.select(col("event_type"), col("hidx")).distinct()
      hours.join(proj, Seq("event_type", "hidx"))
        .groupBy(col("event_type"), col("hidx"))
        .agg(countDistinct(col("user_id")).as("u3h"))
        .orderBy(col("event_type"), col("hidx"))
    }),

    // STL-style decomposition of the hourly series per event type:
    // trend = centered 25-OBSERVATION moving average (ROWS frame — a
    // calendar RANGE frame would go empty on sparse series; at sf0.001
    // most calendar hours have no events of a type), seasonal =
    // hour-of-day mean of the detrended series, residual = the rest.
    // Exactness trick: trend rows exist ONLY where the full 25-row
    // frame is present, so the frame denominator is a CONSTANT — the
    // seasonal mean of (v − trend) then rewrites to
    // (25·Σv − Σframe_sums) / (25·n) over DECIMAL sums: no double is
    // ever summed across rows (the q126 rule), and the three output
    // series are single IEEE expressions over exact decimals. One
    // hourly shuffle, one type-partitioned window, a (type × 24)
    // broadcast join back.
    "q132_stl_decompose" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
        expr("tus div 3600000000").as("hidx"), dec(col("value")).as("v"))
      val h = e.groupBy(col("event_type"), col("hidx"))
        .agg(sum(col("v")).cast(DecimalType(18, 2)).as("hv"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hidx"))
        .rowsBetween(-12, 12)
      val t = h
        .withColumn("fs", sum(col("hv")).over(w).cast(DecimalType(18, 2)))
        .withColumn("fc", count(lit(1)).over(w))
        .filter(col("fc") === 25)
        .withColumn("trend", col("fs").cast(DoubleType) / lit(25))
      val sea = t.withColumn("hod", (col("hidx") % 24).cast(IntegerType))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("hv")).cast(DecimalType(28, 2)).as("sv"),
          sum(col("fs")).cast(DecimalType(28, 2)).as("ss"))
        .withColumn("seasonal",
          (col("sv") * lit(25) - col("ss")).cast(DoubleType) / (lit(25.0) * col("n")))
      t.withColumn("hod", (col("hidx") % 24).cast(IntegerType))
        .join(broadcast(sea.select(col("event_type"), col("hod"), col("seasonal"))),
          Seq("event_type", "hod"))
        .select(col("event_type"), col("hidx"),
          col("hv").cast(DoubleType).as("v"),
          col("trend"), col("seasonal"),
          (col("hv").cast(DoubleType) - col("trend") - col("seasonal")).as("resid"))
        .orderBy(col("event_type"), col("hidx"))
    }),

    // hour-of-day seasonal baseline + 3σ residual anomaly flags — the
    // seasonality-aware outlier detector (a metric that is normal at
    // peak hour is anomalous at 3am; q91's per-type MAD can't see
    // that). Baselines come from decimal-exact moments per
    // (event_type, hour-of-day) cell — the q60/q126 rule — so μ and σ
    // are identical doubles in both engines; the per-event flag
    // comparison then re-joins the tiny (types × 24)-row baseline map
    // BROADCAST into a map-side pass over the events. σ is guarded with
    // greatest(·, 0): the variance formula can land a hair below zero
    // on constant cells, and sqrt(negative) is NaN in Spark but an
    // error-free NaN with different compare semantics downstream.
    "q130_seasonal_anomaly" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
        expr("CAST((tus div 3600000000) % 24 AS INT)").as("hr"),
        dec(col("value")).as("v"))
      val base = e.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast(DoubleType).as("sv"),
          sum((col("v") * col("v")).cast(DecimalType(28, 4))).cast(DoubleType).as("sq"))
        .withColumn("mu", col("sv") / col("n"))
        .withColumn("sigma",
          sqrt(greatest(col("sq") / col("n") - col("mu") * col("mu"), lit(0.0))))
      val flags = e
        .join(broadcast(base.select(col("event_type"), col("hr"), col("mu"), col("sigma"))),
          Seq("event_type", "hr"))
        .filter(abs(col("v").cast(DoubleType) - col("mu")) > lit(3.0) * col("sigma"))
        .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("n_anom"))
      // μ/σ ship as RAW IEEE doubles (the q92/q96 rule): round(double, 4)
      // disagrees between engines on .xxxx5 boundaries (Spark rounds the
      // decimal rendering, DuckDB rounds scaled-double arithmetic) — at
      // sf0.001 a cell mean landed exactly on 68.92875 and split them
      base.join(flags, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"), col("n"),
          coalesce(col("n_anom"), lit(0L)).as("n_anom"),
          col("mu").as("mean_v"),
          col("sigma").as("sigma_v"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // window over the whole series), pair moments are decimal sums (the
    // q60 rule), and doubles appear only in the final correlation
    // formula (+ 0.0 canonicalizes the near-zero -0.0 case).
    "q126_autocorr" -> ((s, d) => {
      val h = events(s, d)
        .withColumn("hour_us", col("tus") - pmod(col("tus"), lit(3600L * 1000000L)))
        .groupBy(col("event_type"), col("hour_us"))
        // re-narrow the sum to (18,2): hourly sums are bounded ~1e8, and
        // (18,2)x(18,2) products fit DECIMAL(37,4) EXACTLY in both
        // engines (wider inputs would overflow DuckDB's 38-digit cap)
        .agg(sum(dec(col("value"))).cast(DecimalType(18, 2)).as("v"))
      val lags = Seq(1, 2, 3)
      val shifted = lags.map { k =>
        h.select(col("event_type"), (col("hour_us") - lit(3600L * 1000000L * k)).as("hour_us"),
          col("v").as("b"), lit(k).as("lag"))
      }.reduce(_ union _)
      val pairs = h.select(col("event_type"), col("hour_us"), col("v").as("a"))
        .join(shifted, Seq("event_type", "hour_us"))
      val m = pairs.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("a")).cast(DoubleType).as("sa"), sum(col("b")).cast(DoubleType).as("sb"),
          sum((col("a") * col("b")).cast(DecimalType(28, 4))).cast(DoubleType).as("sab"),
          sum((col("a") * col("a")).cast(DecimalType(28, 4))).cast(DoubleType).as("saa"),
          sum((col("b") * col("b")).cast(DecimalType(28, 4))).cast(DoubleType).as("sbb"))
      m.filter(col("n") >= 3)
        .select(col("event_type"), col("lag"), col("n"),
          (round((col("sab") - col("sa") * col("sb") / col("n")) /
            (sqrt(col("saa") - col("sa") * col("sa") / col("n")) *
             sqrt(col("sbb") - col("sb") * col("sb") / col("n"))), 4) + lit(0.0)).as("acf"))
        .orderBy(col("event_type"), col("lag"))
    }),

    // CUSUM changepoint detection per metric stream — "where did this
    // metric's level shift": for each event_type the mean-centered
    // cumulative sum S_i = n·prefix_i − i·total is maximized in |S|
    // (the classic offline CUSUM estimator). All arithmetic is EXACT:
    // values quantize to floor(v·1000) BIGINT (identical IEEE product
    // per row), prefix sums run in DECIMAL(38,0) against the oracle's
    // HUGEINT (both exact integers — the e23/q125 overflow rule, no
    // silent 64-bit wrap at any corpus size), and the final |S| casts
    // to DOUBLE only in the output scalar. Scale shape: both windows
    // PARTITION by event_type (per-key range sort, no global funnel);
    // the per-type totals are a 5-row broadcast.
    "q136_cusum_changepoint" -> ((s, d) =>
      cusumChangepoints(events(s, d)).orderBy(col("event_type"))),

    // Spark's native session_window operator (gap-merged sessions as a
    // first-class grouping) — the oracle rebuilds the same sessions with
    // the lag/cumsum islands formulation. Session start = first event,
    // end = last event + gap; exact integer microsecond math.
    "q64_session_window" -> ((s, d) => {
      events(s, d)
        .withColumn("tts", expr("timestamp_micros(tus)"))
        .groupBy(col("user_id"), session_window(col("tts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start_us"),
          unix_micros(col("session_window.end")).as("sess_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("sess_start_us"))
    }),

    // forward fill (IGNORE NULLS window): carry the last purchase value
    // forward over each user's event stream — the time-series
    // carry-forward primitive. No arithmetic on the filled value, so the
    // hash matches bit-exactly.
    "q65_forward_fill" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .filter(col("user_id") < 50)
        .withColumn("pv", when(col("event_type") === "purchase", col("value")))
        .withColumn("last_purchase", last(col("pv"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("tus"), col("event_id"), col("last_purchase"))
        .orderBy(col("user_id"), col("tus"), col("event_id"))
    }),

    // sliding (hopping) windows: 2-hour windows every hour — each event
    // lands in exactly two windows (Spark's window() generator). The
    // oracle unnests the two epoch-aligned hop starts per event; exact
    // integer microsecond math + decimal sums keep it hash-checkable.
    "q82_sliding_windows" -> ((s, d) => {
      events(s, d)
        .withColumn("tts", expr("timestamp_micros(tus)"))
        .groupBy(window(col("tts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(unix_micros(col("window.start")).as("win_us"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy(col("win_us"), col("event_type"))
    }),

    // OHLC downsample: per event-type hourly bars — open/close picked by
    // a deterministic (tus, event_id) order, high/low exact min/max. One
    // shuffle on (hour, type); the two row_number passes share the same
    // partitioning (one Exchange, two sorts). The standard metrics-rollup
    // shape at 100 TB: min/max aggregate map-side, open/close ride the
    // already-shuffled windowed pass.
    "q90_ohlc" -> ((s, d) => {
      val e = events(s, d)
        .withColumn("hour_us", col("tus") - pmod(col("tus"), lit(3600L * 1000000L)))
      val wa = Window.partitionBy(col("hour_us"), col("event_type"))
        .orderBy(col("tus"), col("event_id"))
      val wd = Window.partitionBy(col("hour_us"), col("event_type"))
        .orderBy(col("tus").desc, col("event_id").desc)
      e.withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy(col("hour_us"), col("event_type"))
        .agg(max(when(col("ra") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rd") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_events"))
        .orderBy(col("hour_us"), col("event_type"))
    }),

    // robust outlier profile: per event type, lower-median and MAD
    // (median absolute deviation) selected POSITIONALLY (sorted rank —
    // no floating interpolation, so both engines pick the same stored
    // double and the hash stays exact); outliers = |v − med| > 3·MAD.
    // Two windowed selection passes over the same type-partitioned sort;
    // the med/MAD tables are dimension-sized (one row per type) and
    // broadcast back onto the stream — at scale the event stream is
    // never reshuffled after the first sort.
    "q91_mad_outliers" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"), col("event_id"), col("value"))
      val cw = Window.partitionBy(col("event_type"))
      val w1 = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      val med = e.withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(cw))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val w2 = Window.partitionBy(col("event_type")).orderBy(col("adev"), col("event_id"))
      val mad = dev.withColumn("rn", row_number().over(w2))
        .withColumn("n", count(lit(1)).over(cw))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("adev").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // ordered funnel: view → click → purchase, each step's timestamp the
    // EARLIEST occurrence at-or-after the previous step — the conversion
    // operator product analytics runs. Three user_id-keyed aggregations;
    // after the first shuffle all stages are co-partitioned (AQE reuses
    // the exchange), and step tables only shrink.
    "q80_funnel" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("tus"))
      // cut each step: step r feeds step r+1's join AND its own count —
      // the funnel would otherwise replay the whole prefix per step
      val a = graft.operators.Lineage.cut(ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tus")).as("ta")))
      val b = graft.operators.Lineage.cut(
        ev.filter(col("event_type") === "click").join(a, "user_id")
          .filter(col("tus") >= col("ta"))
          .groupBy("user_id").agg(min(col("tus")).as("tb")))
      val c = ev.filter(col("event_type") === "purchase").join(b, "user_id")
        .filter(col("tus") >= col("tb"))
        .groupBy("user_id").agg(min(col("tus")).as("tc"))
      val step = (n: Int, nm: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(n).as("step"), lit(nm).as("name"), col("users"))
      step(1, "view", a).union(step(2, "click", b)).union(step(3, "purchase", c))
        .orderBy(col("step"))
    }),

    // Kaplan-Meier survival table — time from first signup to first
    // subsequent purchase, right-censored at stream end (the classic
    // conversion-latency / churn readout). Emits the KM table at event
    // days only: n_risk, events, censored, and the per-step factor
    // 1 − d/n (one rounded division). The CUMULATIVE product is
    // deliberately not emitted — a float product over ordered steps is
    // order-dependent; consumers fold the factors themselves. Scale
    // shape: per-user firsts are two partial-aggregated min passes; the
    // risk-set cumsum windows over the DAY table only (stream-span
    // rows — the d44/d67 dimension-table rule), never per user.
    "q145_survival" -> ((s, d) =>
      survivalTable(events(s, d)).orderBy(col("t_day"))),

    // concurrency profile (sweep line) — how many 10-minute event
    // intervals are active at once, at every change point. The classic
    // formulation is `sum(delta) OVER (ORDER BY t)`, a SINGLE-task
    // global window; here the cumulative sum runs through
    // GlobalRank.withGlobalPrefixSum (range-partitioned two-phase
    // prefix sum — P partial sums to the driver, map-side offsets), so
    // no unpartitioned window exists anywhere in the plan
    // (plan-asserted). Boundary deltas aggregate per timestamp FIRST,
    // making the prefix-sum keys unique and the result deterministic.
    "q147_concurrency" -> ((s, d) => {
      val ev = events(s, d)
      val bounds = ev.select(col("tus").as("t"), lit(1L).as("delta"))
        .union(ev.select((col("tus") + expr("CAST(600000000 AS BIGINT)")).as("t"),
          lit(-1L).as("delta")))
        .groupBy(col("t")).agg(sum(col("delta")).as("delta"))
        .filter(col("delta") =!= 0)
      graft.operators.GlobalRank
        .withGlobalPrefixSum(bounds, "delta", "concurrency", col("t"))
        .select(col("t"), col("delta"), col("concurrency"))
        .orderBy(col("t"))
    }),

    // time-capped conversion funnel — q80 with the product-analytics
    // constraint that each step must land within 24 h of the previous
    // one (an uncapped funnel overcounts: a purchase months after the
    // click is not that click's conversion). Same scale shape as q80 —
    // per-step min aggregates chained through key joins, the cap is a
    // residual predicate on the join — and at sf0.01 the cap genuinely
    // bites (150 → 60 → 25 vs q80's 150 → 150 → 150-ish).
    "q150_capped_funnel" -> ((s, d) => {
      val cap = 86400000000L // 24 h in µs
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("tus"))
      // cut each step (the q80 rule)
      val a = graft.operators.Lineage.cut(ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tus")).as("ta")))
      val b = graft.operators.Lineage.cut(
        ev.filter(col("event_type") === "click").join(a, "user_id")
          .filter(col("tus") >= col("ta") && col("tus") <= col("ta") + cap)
          .groupBy("user_id").agg(min(col("tus")).as("tb")))
      val c = ev.filter(col("event_type") === "purchase").join(b, "user_id")
        .filter(col("tus") >= col("tb") && col("tus") <= col("tb") + cap)
        .groupBy("user_id").agg(min(col("tus")).as("tc"))
      val step = (n: Int, nm: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(n).as("step"), lit(nm).as("name"), col("users"))
      step(1, "view", a).union(step(2, "click", b)).union(step(3, "purchase", c))
        .orderBy(col("step"))
    }),

    // exponentially decayed rolling sum (integer half-life weights):
    // D_t = Σ_{j=1..10} value_{t-j} · 2^(10−j) per user stream — the
    // time-decay scoring primitive (recency-weighted engagement). The
    // power-of-two weights keep every term an EXACT decimal product, so
    // the sum is order-independent and hash-checkable; one window pass,
    // all ten lags share the same sort.
    "q81_decayed_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val terms = (1 to 10).map { j =>
        coalesce(lag(dec(col("value")), j).over(w), lit(0).cast(DecimalType(18, 2))) *
          lit(1L << (10 - j))
      }
      events(s, d)
        .withColumn("dsum", terms.reduce(_ + _).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("dsum"))
        .orderBy(col("event_id"))
    }),

    // coverage merge (gaps-and-islands): each event opens a 30-minute
    // activity interval; overlapping/touching intervals coalesce into
    // per-user coverage spans (operators.IntervalMerge) — one hash
    // shuffle on user_id, the island group-by reuses the window's
    // exchange. The dual of q29's session COUNTS: this materializes the
    // session intervals themselves.
    "q94_interval_merge" -> ((s, d) => {
      val iv = events(s, d).select(col("user_id"), col("tus").as("start_us"),
        (col("tus") + lit(1800L * 1000000L)).as("end_us"))
      graft.operators.IntervalMerge.merge(iv, Seq("user_id"), "start_us", "end_us")
        .orderBy(col("user_id"), col("start_us"))
    }),

    // time-weighted average: value held until the next event, weighted
    // by the segment duration — the metrics/finance primitive plain AVG
    // gets wrong on irregular samples. Segment products are exact
    // decimals (value DECIMAL × integer-micros duration), so the sum is
    // order-independent and the hash exact; one window + one aggregate
    // on the same user_id partitioning.
    "q96_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      events(s, d)
        .withColumn("next_tus", lead(col("tus"), 1).over(w))
        .filter(col("next_tus").isNotNull)
        // integer cents × integer micros: the sums stay in BIGINT, and the
        // only float ops are two hardware int64→double conversions plus
        // one IEEE division — bit-identical across engines (a decimal
        // sum cast to DOUBLE is NOT: DuckDB's decimal→double double-rounds
        // vs Java's correctly-rounded conversion, a 1-ulp hash mismatch)
        .withColumn("seg",
          (dec(col("value")) * 100).cast(LongType) * (col("next_tus") - col("tus")))
        .groupBy(col("user_id"))
        .agg(sum(col("seg")).as("wsum"), sum(col("next_tus") - col("tus")).as("dur"))
        .select(col("user_id"), col("dur"),
          (col("wsum").cast(DoubleType) / (col("dur").cast(DoubleType) * lit(100.0)))
            .as("twa"))
        .orderBy(col("user_id"))
    }),

    // cohort retention: users grouped by first-activity week, retention
    // matrix = distinct active users per (cohort, week-offset) plus the
    // rate against cohort size — the product-analytics staple. Exact
    // integer week math off epoch micros; two user_id-keyed aggregates
    // (the cohort map rides the first shuffle) and a broadcast of the
    // dimension-sized cohort counts.
    "q97_cohort_retention" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"),
        expr("tus div 604800000000").as("week")) // 7d in micros
      val cohort = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      val sizes = cohort.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
      e.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .join(broadcast(sizes), "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("active_users"),
          (col("active_users").cast(DoubleType) / col("cohort_users").cast(DoubleType))
            .as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // as-of join: latest prior purchase per user for every event
    "q32_asof_join" -> ((s, d) => {
      val e = events(s, d).select(col("event_id"), col("user_id"), col("tus"),
        col("event_type"), col("value"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.operators.AsofJoin.asofBackward(e, p, Seq("user_id"), "tus", "tus")
        .select(col("event_id"), col("user_id"), col("tus"), col("p_event_id"), col("p_value"))
        .orderBy(col("event_id"))
    }),

    // forward as-of: each event's NEXT purchase at-or-after it — the
    // attribution direction q32 can't express; same single-shuffle
    // union+window plan with the frame reversed (operators.AsofJoin)
    "q87_asof_forward" -> ((s, d) => {
      val e = events(s, d).select(col("event_id"), col("user_id"), col("tus"),
        col("event_type"), col("value"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.operators.AsofJoin.asofForward(e, p, Seq("user_id"), "tus", "tus")
        .select(col("event_id"), col("user_id"), col("tus"), col("p_event_id"), col("p_value"))
        .orderBy(col("event_id"))
    }),

    // --- rolling median (windowed exact percentile) -----------------------
    // per-user 4-row rolling median of the value series: `percentile`
    // as a WINDOW aggregate with a ROWS frame — the smoother/denoiser
    // shape for telemetry series. Per-user windows partition cleanly;
    // the frame is tiny and re-sorted per row, total order fixed by
    // (tus, event_id). round(4) absorbs the one interpolation-order
    // ulp between the engines' midpoint formulas.
    "q103_rolling_median" -> ((s, d) => {
      events(s, d).filter(col("user_id") < 100)
        .select(col("user_id"), col("event_id"), col("tus"), col("value"))
        .withColumn("med4", round(expr(
          """percentile(value, 0.5) OVER (PARTITION BY user_id
            |ORDER BY tus, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"""
            .stripMargin), 4))
        .select(col("user_id"), col("event_id"), col("med4"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // --- counter rate with reset detection (PromQL `rate`) ----------------
    // per-user increase accumulation where a value DROP means the
    // counter reset (the post-reset value is the whole increase), then
    // increase/second over the observed span. Per-key window + one agg
    // shuffle; increases are DECIMAL(18,6) before summing (exact,
    // associative), duration is exact integer micros.
    "q104_counter_rate" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      events(s, d)
        .withColumn("prev", lag(col("value"), 1).over(w))
        .withColumn("incd", when(col("prev").isNull, lit(0.0))
          .when(col("value") >= col("prev"), col("value") - col("prev"))
          .otherwise(col("value")).cast(DecimalType(18, 6)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("incd")).as("total_inc"),
          (max(col("tus")) - min(col("tus"))).as("dur_us"))
        .filter(col("dur_us") > 0)
        .select(col("user_id"), col("n_events"),
          round(col("total_inc").cast(DoubleType), 4).as("total_increase"),
          round(col("total_inc").cast(DoubleType) / (col("dur_us") / lit(1000000.0)), 6)
            .as("rate_per_sec"))
        .orderBy(col("user_id"))
    }),

    // --- native-exec as-of join ----------------------------------------------
    // q32's semantic through the CUSTOM PHYSICAL OPERATOR
    // (plans/AsofMergeJoin: LogicalPlan + SparkStrategy + SparkPlan,
    // two-pointer merge over declared co-partitioning + ordering —
    // EnsureRequirements plants the exchanges/sorts, AQE still applies).
    // Same DuckDB ASOF LEFT JOIN oracle as q32 — two independent
    // implementations, one truth.
    "q107_asof_exec" -> ((s, d) => {
      val e = events(s, d).select(col("event_id"), col("user_id"), col("tus"),
        col("event_type"), col("value"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.plans.AsofMergeJoin.asofBackward(e, p, Seq("user_id"), "tus", "tus")
        .select(col("event_id"), col("user_id"), col("tus"), col("p_event_id"), col("p_value"))
        .orderBy(col("event_id"))
    }),

    // forward twin through the same native exec — "next purchase at or
    // after each event"; q87's oracle, zero-copy merge (no candidate
    // buffering: the right head after the drop scan IS the match)
    "q108_asof_fwd_exec" -> ((s, d) => {
      val e = events(s, d).select(col("event_id"), col("user_id"), col("tus"),
        col("event_type"), col("value"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.plans.AsofMergeJoin.asofForward(e, p, Seq("user_id"), "tus", "tus")
        .select(col("event_id"), col("user_id"), col("tus"), col("p_event_id"), col("p_value"))
        .orderBy(col("event_id"))
    }),

    // --- bounded exponential smoothing (EWMA) --------------------------------
    // per-user smoothed value series: weights a^k over the last 8 rows,
    // renormalized over the rows that actually exist (sequence heads) —
    // the telemetry denoiser that, unlike a recursive full-history EWMA,
    // is expressible as ONE partitioned window pass (8 lags, fixed
    // expression tree → deterministic float math) and needs no
    // unbounded per-key state at 100 TB. a = 0.5 so every weight is an
    // exact binary double — both engines compute bit-identical terms.
    "q109_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val terms = (0 until 8).map { k =>
        val v = if (k == 0) col("value") else lag(col("value"), k).over(w)
        val wt = lit(math.pow(0.5, k))
        (coalesce(v * wt, lit(0.0)), when(v.isNotNull, wt).otherwise(lit(0.0)))
      }
      val num = terms.map(_._1).reduce(_ + _)
      val den = terms.map(_._2).reduce(_ + _)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("tus"), col("value"))
        .withColumn("ewma", round(num / den, 6))
        .select("event_id", "user_id", "tus", "ewma")
        .orderBy("event_id")
    }),

    // --- hopping (sliding) windows -------------------------------------------
    // 1-hour windows advancing every 30 minutes: each event lands in
    // exactly two hops, materialized by a 2-element explode before ONE
    // aggregation — the batch twin of streaming `window(ts, '1h',
    // '30m')`. Map-side expansion is a constant ×2 (never a shuffle
    // blow-up) and the agg combines partially before the exchange.
    "q112_hopping_windows" -> ((s, d) => {
      val hop = 1800L * 1000000L
      events(s, d)
        .withColumn("h0", expr(s"tus div $hop"))
        .select(col("event_type"), col("value"),
          explode(array(col("h0") * hop, (col("h0") - 1) * hop)).as("window_start"))
        .groupBy(col("window_start"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // --- activity streaks (gaps & islands) -----------------------------------
    // per-user longest run of CONSECUTIVE active days — the classic
    // islands pattern: day_index − row_number() is constant within a
    // consecutive run, so one partitioned window + one aggregation
    // finds every streak without any self-join.
    "q113_activity_streaks" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val days = events(s, d)
        .select(col("user_id"), expr("tus div 86400000000").as("day")).distinct()
      val streaks = days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
      streaks.groupBy(col("user_id"))
        .agg(sum(col("len")).as("active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy(col("user_id"))
    }),

    // --- RFM segmentation ----------------------------------------------------
    // recency / frequency / monetary quintiles per user — the classic
    // customer-value segmentation. Metrics are one grouped pass over
    // the events; the quintile assignment NEVER plans a global
    // (single-task) ntile window: each metric gets a global ordinal from
    // GlobalRank (range-partitioned parallel sort + per-partition
    // offsets — the zipWithIndex shape, P longs of driver state) and
    // ntile's exact bucket-size rule is then pure map-side arithmetic on
    // (rank, n), so the DuckDB ntile oracle matches unchanged. Monetary
    // stays DECIMAL until output so ordering ties are exact; every
    // ordinal order carries a user_id tiebreak. The old ntile-window
    // form survives as the RankTwinSpec test oracle.
    "q114_rfm" -> ((s, d) => {
      def seg(df: DataFrame, name: String, order: Column*): DataFrame = {
        val (idxDf, n) = graft.operators.GlobalRank
          .withGlobalIndexAndCount(df, "__idx", order: _*)
        idxDf.withColumn(name, ntileOfRank(col("__idx") + 1, n, 5)).drop("__idx")
      }
      val segd = seg(seg(seg(rfmBase(s, d),
        "r_seg", desc("recency"), col("user_id")),
        "f_seg", desc("frequency"), col("user_id")),
        "m_seg", desc("monetary"), col("user_id"))
      segd.select(col("user_id"), col("recency"), col("frequency"),
          col("monetary").cast(DoubleType).as("monetary"),
          col("r_seg"), col("f_seg"), col("m_seg"),
          concat(col("r_seg"), lit("-"), col("f_seg"), lit("-"), col("m_seg")).as("segment"))
        .orderBy(col("user_id"))
    }),

    // --- top user paths ------------------------------------------------------
    // the first three event types per user, joined into a path string,
    // counted across users — the sankey/path-analysis input. Ordered
    // collection is made deterministic by sorting the collected
    // (rn, type) structs, never by trusting collect_list order.
    "q115_top_paths" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .groupBy(col("user_id"))
        .agg(concat_ws(">", expr(
          "transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(desc("n_users"), col("path")).limit(20)
    }),

    // --- Markov transition matrix --------------------------------------------
    // P(next event type | type) over per-user event sequences — the
    // behavioral-model summary (and the path-analysis input). One
    // per-user lead window, one (type,next) agg; the per-type totals
    // are a dimension-sized broadcast. n/tot is exact long/long double
    // division in both engines.
    "q105_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val tr = events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
      tr.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          round(col("n") / col("tot"), 6).as("p"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    // --- A/B experiment readout ----------------------------------------------
    // variant = user_id parity; Welch's t on the value metric from
    // decimal-exact moment sums (identical doubles in both engines —
    // q60's rule), 2x2 conversion chi-square in exact integer counts
    // cast to double only for the final ratio. One agg shuffle + a
    // 2-row self cross — the experimentation readout at any scale.
    "q106_ab_test" -> ((s, d) => {
      val ev = events(s, d)
        .withColumn("variant", col("user_id") % 2)
        .withColumn("v", col("value").cast(DecimalType(18, 6)))
        .withColumn("conv", when(col("event_type") === "purchase", 1L).otherwise(0L))
      val g = ev.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast(DoubleType).as("sv"),
          sum((col("v") * col("v")).cast(DecimalType(28, 12))).cast(DoubleType).as("svv"),
          sum(col("conv")).as("nconv"))
        .withColumn("mean", col("sv") / col("n"))
        .withColumn("variance", (col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
      val a = g.filter(col("variant") === 0).select(col("n").as("n0"),
        col("nconv").as("c0"), col("mean").as("mean0"), col("variance").as("var0"))
      val b = g.filter(col("variant") === 1).select(col("n").as("n1"),
        col("nconv").as("c1"), col("mean").as("mean1"), col("variance").as("var1"))
      val diff = (col("c0") * (col("n1") - col("c1")) -
        (col("n0") - col("c0")) * col("c1")).cast(DoubleType)
      val den = col("n0").cast(DoubleType) * col("n1").cast(DoubleType) *
        (col("c0") + col("c1")).cast(DoubleType) *
        ((col("n0") - col("c0")) + (col("n1") - col("c1"))).cast(DoubleType)
      a.crossJoin(b).select(
        col("n0"), col("n1"), col("c0"), col("c1"),
        round(col("mean0"), 6).as("mean0"), round(col("mean1"), 6).as("mean1"),
        // + 0.0 canonicalizes -0.0 (a near-zero t rounds to -0.0 in
        // DuckDB but 0.0 here — the d26 lesson)
        (round((col("mean1") - col("mean0")) /
          sqrt(col("var1") / col("n1") + col("var0") / col("n0")), 4) + lit(0.0)).as("welch_t"),
        round(diff * diff * (col("n0") + col("n1")).cast(DoubleType) / den, 4).as("chi2"))
    }))

  val oracle: Map[String, String] = Map(
    "q134_window_distinct" ->
      """WITH e AS (SELECT DISTINCT event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hidx,
        |             user_id FROM events)
        |SELECT DISTINCT event_type, hidx,
        |  count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY hidx
        |                                RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS u3h
        |FROM e ORDER BY event_type, hidx""".stripMargin,

    "q132_stl_decompose" ->
      """WITH e AS (SELECT event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hidx,
        |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |h AS (SELECT event_type, hidx, CAST(sum(v) AS DECIMAL(18,2)) AS hv
        |      FROM e GROUP BY 1, 2),
        |t0 AS (SELECT event_type, hidx, hv,
        |         CAST(sum(hv) OVER w AS DECIMAL(18,2)) AS fs,
        |         count(*) OVER w AS fc
        |       FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hidx
        |                           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |t AS (SELECT event_type, hidx, hv, fs, CAST(fs AS DOUBLE) / 25 AS trend
        |      FROM t0 WHERE fc = 25),
        |sea AS (SELECT event_type, CAST(hidx % 24 AS INT) AS hod, count(*) AS n,
        |          CAST(CAST(sum(hv) AS DECIMAL(28,2)) * 25
        |               - CAST(sum(fs) AS DECIMAL(28,2)) AS DOUBLE)
        |            / (25.0 * count(*)) AS seasonal
        |        FROM t GROUP BY 1, 2)
        |SELECT t.event_type, t.hidx, CAST(t.hv AS DOUBLE) AS v, t.trend, sea.seasonal,
        |  CAST(t.hv AS DOUBLE) - t.trend - sea.seasonal AS resid
        |FROM t JOIN sea ON t.event_type = sea.event_type
        |               AND CAST(t.hidx % 24 AS INT) = sea.hod
        |ORDER BY t.event_type, t.hidx""".stripMargin,

    "q130_seasonal_anomaly" ->
      """WITH e AS (SELECT event_type,
        |             CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS INT) AS hr,
        |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |b AS (SELECT event_type, hr, count(*) AS n,
        |        CAST(sum(v) AS DOUBLE) AS sv,
        |        CAST(sum(CAST(v * v AS DECIMAL(28,4))) AS DOUBLE) AS sq
        |      FROM e GROUP BY 1, 2),
        |m AS (SELECT event_type, hr, n, sv / n AS mu,
        |        sqrt(greatest(sq / n - (sv / n) * (sv / n), 0.0)) AS sigma FROM b),
        |f AS (SELECT e.event_type, e.hr, count(*) AS n_anom
        |      FROM e JOIN m ON e.event_type = m.event_type AND e.hr = m.hr
        |      WHERE abs(CAST(e.v AS DOUBLE) - m.mu) > 3.0 * m.sigma GROUP BY 1, 2)
        |SELECT m.event_type, m.hr, m.n, coalesce(f.n_anom, 0) AS n_anom,
        |  m.mu AS mean_v, m.sigma AS sigma_v
        |FROM m LEFT JOIN f ON m.event_type = f.event_type AND m.hr = f.hr
        |ORDER BY m.event_type, m.hr""".stripMargin,

    "q103_rolling_median" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events
        |           WHERE user_id < 100)
        |SELECT user_id, event_id,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS med4
        |FROM e ORDER BY user_id, event_id""".stripMargin,

    "q107_asof_exec" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |p AS (SELECT user_id, tus, event_id AS p_event_id, value AS p_value FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.tus, p.p_event_id, p.p_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus >= p.tus
        |ORDER BY e.event_id""".stripMargin,

    "q108_asof_fwd_exec" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |p AS (SELECT user_id, tus, event_id AS p_event_id, value AS p_value FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.tus, p.p_event_id, p.p_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus <= p.tus
        |ORDER BY e.event_id""".stripMargin,

    "q109_ewma" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events)
        |SELECT event_id, user_id, tus,
        |  round((coalesce(value * 1.0, 0.0)
        |       + coalesce(lag(value, 1) OVER w * 0.5, 0.0)
        |       + coalesce(lag(value, 2) OVER w * 0.25, 0.0)
        |       + coalesce(lag(value, 3) OVER w * 0.125, 0.0)
        |       + coalesce(lag(value, 4) OVER w * 0.0625, 0.0)
        |       + coalesce(lag(value, 5) OVER w * 0.03125, 0.0)
        |       + coalesce(lag(value, 6) OVER w * 0.015625, 0.0)
        |       + coalesce(lag(value, 7) OVER w * 0.0078125, 0.0))
        |      / ((CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN 0.0625 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN 0.03125 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN 0.015625 ELSE 0.0 END)
        |       + (CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN 0.0078125 ELSE 0.0 END)), 6) AS ewma
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY event_id""".stripMargin,

    "q112_hopping_windows" ->
      """WITH e AS (SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |x AS (SELECT event_type, value, u.ws
        |      FROM e, unnest([(tus // 1800000000) * 1800000000,
        |                      (tus // 1800000000 - 1) * 1800000000]) AS u(ws))
        |SELECT ws AS window_start, event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q113_activity_streaks" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |days AS (SELECT DISTINCT user_id, tus // 86400000000 AS day FROM e),
        |g AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM days),
        |streaks AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |  max(len) AS longest_streak, count(*) AS n_streaks
        |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q114_rfm" ->
      """WITH e AS (SELECT user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |base AS (SELECT user_id, max(tus) AS recency, count(*) AS frequency,
        |           coalesce(sum(CASE WHEN event_type = 'purchase'
        |                         THEN CAST(value AS DECIMAL(18,2)) END),
        |                    CAST(0 AS DECIMAL(18,2))) AS monetary
        |         FROM e GROUP BY user_id),
        |seg AS (SELECT user_id, recency, frequency, monetary,
        |          ntile(5) OVER (ORDER BY recency DESC, user_id) AS r_seg,
        |          ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_seg,
        |          ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_seg
        |        FROM base)
        |SELECT user_id, recency, frequency, CAST(monetary AS DOUBLE) AS monetary,
        |  r_seg, f_seg, m_seg,
        |  r_seg || '-' || f_seg || '-' || m_seg AS segment
        |FROM seg ORDER BY user_id""".stripMargin,

    "q115_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |r AS (SELECT user_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rn
        |      FROM e),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "q105_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |l AS (SELECT event_type, lead(event_type) OVER (PARTITION BY user_id
        |        ORDER BY tus, event_id) AS next_type FROM e),
        |tr AS (SELECT event_type, next_type, count(*) AS n FROM l
        |       WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY 1)
        |SELECT tr.event_type, tr.next_type, tr.n, round(tr.n / tot.tot, 6) AS p
        |FROM tr JOIN tot USING (event_type) ORDER BY 1, 2""".stripMargin,

    "q106_ab_test" ->
      """WITH e AS (SELECT user_id % 2 AS variant, CAST(value AS DECIMAL(18,6)) AS v,
        |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv FROM events),
        |g AS (SELECT variant, count(*) AS n, CAST(sum(v) AS DOUBLE) AS sv,
        |        CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS svv,
        |        CAST(sum(conv) AS BIGINT) AS nconv
        |      FROM e GROUP BY variant),
        |s AS (SELECT variant, n, nconv, sv / n AS mean,
        |        (svv - sv * sv / n) / (n - 1) AS variance FROM g),
        |x AS (SELECT a.n AS n0, b.n AS n1, a.nconv AS c0, b.nconv AS c1,
        |        a.mean AS mean0, b.mean AS mean1, a.variance AS var0, b.variance AS var1
        |      FROM s a, s b WHERE a.variant = 0 AND b.variant = 1),
        |y AS (SELECT *, CAST(c0 * (n1 - c1) - (n0 - c0) * c1 AS DOUBLE) AS diff FROM x)
        |SELECT n0, n1, c0, c1,
        |  round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
        |  round((mean1 - mean0) / sqrt(var1 / n1 + var0 / n0), 4) + 0.0 AS welch_t,
        |  round(diff * diff * CAST(n0 + n1 AS DOUBLE) /
        |    (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(c0 + c1 AS DOUBLE) *
        |     CAST((n0 - c0) + (n1 - c1) AS DOUBLE)), 4) AS chi2
        |FROM y""".stripMargin,

    "q104_counter_rate" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |l AS (SELECT user_id, value, tus,
        |        lag(value) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
        |i AS (SELECT user_id, tus,
        |        CAST(CASE WHEN prev IS NULL THEN 0.0
        |             WHEN value >= prev THEN value - prev ELSE value END AS DECIMAL(18,6)) AS incd
        |      FROM l),
        |a AS (SELECT user_id, count(*) AS n_events, sum(incd) AS total_inc,
        |        max(tus) - min(tus) AS dur_us FROM i GROUP BY user_id)
        |SELECT user_id, n_events, round(CAST(total_inc AS DOUBLE), 4) AS total_increase,
        |  round(CAST(total_inc AS DOUBLE) / (dur_us / 1000000.0), 6) AS rate_per_sec
        |FROM a WHERE dur_us > 0 ORDER BY user_id""".stripMargin,

    "q90_ohlc" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_id, event_type, value FROM events),
        |b AS (SELECT *, tus - tus % 3600000000 AS hour_us FROM e),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY hour_us, event_type ORDER BY tus, event_id) AS ra,
        |        row_number() OVER (PARTITION BY hour_us, event_type ORDER BY tus DESC, event_id DESC) AS rd
        |      FROM b)
        |SELECT hour_us, event_type,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close,
        |  count(*) AS n_events
        |FROM r GROUP BY hour_us, event_type ORDER BY hour_us, event_type""".stripMargin,

    "q91_mad_outliers" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events),
        |n AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
        |r AS (SELECT e.*, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn FROM e),
        |med AS (SELECT r.event_type, r.value AS med FROM r JOIN n USING (event_type) WHERE rn = (n + 1) // 2),
        |dev AS (SELECT e.event_type, e.event_id, e.value, med.med,
        |          abs(e.value - med.med) AS adev FROM e JOIN med USING (event_type)),
        |r2 AS (SELECT dev.*, row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn FROM dev),
        |mad AS (SELECT r2.event_type, r2.adev AS mad FROM r2 JOIN n USING (event_type) WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, count(*) AS n_events, max(d.med) AS med, max(m.mad) AS mad,
        |  CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q82_sliding_windows" ->
      """WITH e AS (SELECT event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |x AS (SELECT event_type, value,
        |        unnest([tus - (tus % 3600000000),
        |                tus - (tus % 3600000000) - 3600000000]) AS win_us
        |      FROM e)
        |SELECT win_us, event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    "q80_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |a AS (SELECT user_id, min(tus) AS ta FROM ev WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(e.tus) AS tb FROM ev e JOIN a USING (user_id)
        |      WHERE e.event_type = 'click' AND e.tus >= a.ta GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.tus) AS tc FROM ev e JOIN b USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.tus >= b.tb GROUP BY 1)
        |SELECT 1 AS step, 'view' AS name, count(*) AS users FROM a
        |UNION ALL SELECT 2, 'click', count(*) FROM b
        |UNION ALL SELECT 3, 'purchase', count(*) FROM c
        |ORDER BY step""".stripMargin,

    "q150_capped_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |a AS (SELECT user_id, min(tus) AS ta FROM ev WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(e.tus) AS tb FROM ev e JOIN a USING (user_id)
        |      WHERE e.event_type = 'click' AND e.tus >= a.ta
        |        AND e.tus <= a.ta + 86400000000 GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.tus) AS tc FROM ev e JOIN b USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.tus >= b.tb
        |        AND e.tus <= b.tb + 86400000000 GROUP BY 1)
        |SELECT 1 AS step, 'view' AS name, count(*) AS users FROM a
        |UNION ALL SELECT 2, 'click', count(*) FROM b
        |UNION ALL SELECT 3, 'purchase', count(*) FROM c
        |ORDER BY step""".stripMargin,

    "q145_survival" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |su AS (SELECT user_id, min(tus) AS t0 FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT e.user_id, min(e.tus) AS t1 FROM ev e JOIN su USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.tus >= su.t0 GROUP BY 1),
        |tm AS (SELECT max(tus) AS tmax FROM ev),
        |subj AS (SELECT su.user_id,
        |    CASE WHEN pu.t1 IS NOT NULL THEN (pu.t1 - su.t0) // 86400000000
        |         ELSE (tm.tmax - su.t0) // 86400000000 END AS dur,
        |    (pu.t1 IS NOT NULL) AS ev
        |  FROM su LEFT JOIN pu USING (user_id) CROSS JOIN tm),
        |days AS (SELECT dur,
        |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM subj GROUP BY dur),
        |n AS (SELECT count(*) AS n_subjects FROM subj),
        |risk AS (SELECT dur, d, c,
        |    n.n_subjects - coalesce(CAST(sum(d + c) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
        |  FROM days CROSS JOIN n)
        |SELECT dur AS t_day, n_risk, d AS n_events, c AS n_censored,
        |  round(1.0 - CAST(d AS DOUBLE) / n_risk, 6) AS km_factor
        |FROM risk WHERE d > 0 ORDER BY t_day""".stripMargin,

    "q147_concurrency" ->
      """WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |b AS (SELECT tus AS t, 1 AS delta FROM ev
        |      UNION ALL SELECT tus + 600000000, -1 FROM ev),
        |agg AS (SELECT t, CAST(sum(delta) AS BIGINT) AS delta FROM b
        |        GROUP BY t HAVING sum(delta) <> 0)
        |SELECT t, delta,
        |  CAST(sum(delta) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS concurrency
        |FROM agg ORDER BY t""".stripMargin,

    "q81_decayed_sum" -> {
      val terms = (1 to 10).map { j =>
        s"coalesce(lag(CAST(value AS DECIMAL(18,2)), $j) OVER w, 0) * ${1L << (10 - j)}"
      }.mkString(" + ")
      s"""WITH e AS (SELECT event_id, user_id, value,
         |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events)
         |SELECT event_id, user_id, CAST($terms AS DOUBLE) AS dsum
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
         |ORDER BY event_id""".stripMargin
    },

    "q97_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |sizes AS (SELECT cohort_week, count(*) AS cohort_users FROM cohort GROUP BY cohort_week),
        |act AS (SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
        |          count(DISTINCT e.user_id) AS active_users
        |        FROM e JOIN cohort c USING (user_id) GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.active_users,
        |  CAST(a.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE) AS retention
        |FROM act a JOIN sizes s USING (cohort_week)
        |ORDER BY a.cohort_week, a.week_offset""".stripMargin,

    "q96_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |l AS (SELECT user_id, value, tus,
        |        lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS nt FROM e),
        |s AS (SELECT user_id,
        |        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * (nt - tus)) AS BIGINT) AS wsum,
        |        CAST(sum(nt - tus) AS BIGINT) AS dur
        |      FROM l WHERE nt IS NOT NULL GROUP BY user_id)
        |SELECT user_id, dur,
        |  CAST(wsum AS DOUBLE) / (CAST(dur AS DOUBLE) * 100.0) AS twa
        |FROM s ORDER BY user_id""".stripMargin,

    "q94_interval_merge" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS en FROM events),
        |m AS (SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY s, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM e),
        |i AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni FROM m),
        |g AS (SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY s, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM i)
        |SELECT user_id, min(s) AS start_us, max(en) AS end_us, count(*) AS n_merged
        |FROM g GROUP BY user_id, isl
        |ORDER BY user_id, start_us""".stripMargin,

    "q29_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |l AS (SELECT user_id, tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS gap FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q30_event_windows" ->
      """SELECT epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(ts AS TIMESTAMP)) % 3600000000 AS hour_us,
        | event_type, count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,

    "q31_event_props" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k_bucket,
        | count(*) AS cnt, max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "q33_gapfill" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(ts AS TIMESTAMP)) % 3600000000 AS hour_us,
        |            event_type FROM events),
        |b AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 3600000000, 3600000000)) AS hour_us FROM b),
        |types AS (SELECT DISTINCT event_type FROM e),
        |c AS (SELECT hour_us, event_type, count(*) AS cnt FROM e GROUP BY 1, 2)
        |SELECT s.hour_us, t.event_type, coalesce(c.cnt, 0) AS cnt
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN c ON c.hour_us = s.hour_us AND c.event_type = t.event_type
        |ORDER BY s.hour_us, t.event_type""".stripMargin,

    "q121_range_frame" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value FROM events)
        |SELECT event_id, event_type, tus,
        |  count(*) OVER w AS cnt_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY tus
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q122_linear_interp" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value FROM events),
        |h AS (SELECT event_type, tus - tus % 3600000000 AS hour_us, value FROM e),
        |known AS (SELECT event_type, hour_us,
        |            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |          FROM h GROUP BY event_type, hour_us),
        |b AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM h),
        |spine AS (SELECT unnest(range(lo, hi + 3600000000, 3600000000)) AS hour_us FROM b),
        |types AS (SELECT DISTINCT event_type FROM e),
        |grid AS (SELECT t.event_type, s.hour_us, k.v
        |         FROM spine s CROSS JOIN types t
        |         LEFT JOIN known k ON k.event_type = t.event_type AND k.hour_us = s.hour_us),
        |f AS (SELECT event_type, hour_us, v,
        |        last_value(v IGNORE NULLS) OVER wp AS pv,
        |        last_value(CASE WHEN v IS NOT NULL THEN hour_us END IGNORE NULLS) OVER wp AS pt,
        |        first_value(v IGNORE NULLS) OVER wn AS nv,
        |        first_value(CASE WHEN v IS NOT NULL THEN hour_us END IGNORE NULLS) OVER wn AS nt
        |      FROM grid
        |      WINDOW wp AS (PARTITION BY event_type ORDER BY hour_us
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (PARTITION BY event_type ORDER BY hour_us
        |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hour_us, (v IS NOT NULL) AS known,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (hour_us - pt) / (nt - pt) END AS interp
        |FROM f ORDER BY event_type, hour_us""".stripMargin,

    "q123_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        |           FROM events),
        |g AS (SELECT *, sum(is_p) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - is_p AS grp FROM e),
        |j AS (SELECT *, max(CASE WHEN is_p = 1 THEN value END)
        |        OVER (PARTITION BY user_id, grp) AS pv FROM g),
        |t AS (SELECT * FROM j WHERE event_type IN ('view', 'click') AND pv IS NOT NULL),
        |c AS (SELECT event_type, pv,
        |        row_number() OVER (PARTITION BY user_id, grp ORDER BY tus, event_id) AS pos,
        |        count(*) OVER (PARTITION BY user_id, grp) AS nt
        |      FROM t),
        |cr AS (SELECT event_type,
        |         CAST((CASE WHEN nt = 1 THEN CAST(1.0 AS DOUBLE)
        |                    WHEN nt = 2 THEN CAST(0.5 AS DOUBLE)
        |                    WHEN pos = 1 OR pos = nt THEN CAST(0.4 AS DOUBLE)
        |                    ELSE CAST(0.2 AS DOUBLE) / (nt - 2) END) * pv
        |              AS DECIMAL(18,6)) AS cv
        |       FROM c)
        |SELECT event_type, count(*) AS n_touches,
        |  round(CAST(sum(cv) AS DOUBLE), 4) AS attributed_value
        |FROM cr GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q124_drift_chi2" ->
      """WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value FROM events),
        |k AS (SELECT CAST(ceil(count(*) / 2.0) AS BIGINT) AS k FROM e),
        |o AS (SELECT value, row_number() OVER (ORDER BY tus, event_id) AS rn FROM e),
        |b AS (SELECT min(value) AS mn, max(value) AS mx FROM e),
        |tagged AS (SELECT o.value, (o.rn <= k.k) AS early,
        |    CASE WHEN mx = mn THEN 0
        |         ELSE least(9, CAST(floor((o.value - mn) * 10 / (mx - mn)) AS INT)) END AS bin
        |  FROM o CROSS JOIN k CROSS JOIN b),
        |hist AS (SELECT bin,
        |           CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
        |           CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |         FROM tagged GROUP BY bin),
        |t AS (SELECT sum(n_early) AS ne, sum(n_late) AS nl FROM hist)
        |SELECT bin, n_early, n_late,
        |  CASE WHEN n_early * (nl * 1.0 / ne) > 0 THEN
        |    round((n_late - n_early * (nl * 1.0 / ne)) * (n_late - n_early * (nl * 1.0 / ne))
        |          / (n_early * (nl * 1.0 / ne)), 6) END AS contrib
        |FROM hist CROSS JOIN t ORDER BY bin""".stripMargin,

    "q125_beacon_cv" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |g AS (SELECT user_id,
        |        tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS gap
        |      FROM e),
        |m AS (SELECT user_id, count(*) AS n_gaps,
        |        sum(gap) AS s1,
        |        sum(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0))) AS s2
        |      FROM g WHERE gap IS NOT NULL GROUP BY user_id HAVING count(*) >= 2)
        |SELECT user_id, n_gaps,
        |  CAST(s1 // n_gaps AS BIGINT) AS mean_gap_us,
        |  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_gaps)
        |             / (n_gaps - 1))
        |        / (CAST(s1 AS DOUBLE) / n_gaps), 6) AS cv
        |FROM m ORDER BY user_id""".stripMargin,

    "q126_autocorr" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |h AS (SELECT event_type, tus - tus % 3600000000 AS hour_us,
        |        CAST(sum(v) AS DECIMAL(18,2)) AS v
        |      FROM e GROUP BY 1, 2),
        |lags(lag) AS (VALUES (1), (2), (3)),
        |shifted AS (SELECT event_type, hour_us - 3600000000 * lag AS hour_us, v AS b, lag
        |            FROM h CROSS JOIN lags),
        |p AS (SELECT h.event_type, shifted.lag, h.v AS a, shifted.b
        |      FROM h JOIN shifted ON h.event_type = shifted.event_type
        |                         AND h.hour_us = shifted.hour_us),
        |m AS (SELECT event_type, lag, count(*) AS n,
        |        CAST(sum(a) AS DOUBLE) AS sa, CAST(sum(b) AS DOUBLE) AS sb,
        |        CAST(sum(CAST(a * b AS DECIMAL(28,4))) AS DOUBLE) AS sab,
        |        CAST(sum(CAST(a * a AS DECIMAL(28,4))) AS DOUBLE) AS saa,
        |        CAST(sum(CAST(b * b AS DECIMAL(28,4))) AS DOUBLE) AS sbb
        |      FROM p GROUP BY event_type, lag)
        |SELECT event_type, lag, n,
        |  round((sab - sa * sb / n) /
        |        (sqrt(saa - sa * sa / n) * sqrt(sbb - sb * sb / n)), 4) + 0.0 AS acf
        |FROM m WHERE n >= 3 ORDER BY event_type, lag""".stripMargin,

    "q136_cusum_changepoint" ->
      """WITH ev AS (SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |              CAST(floor(value * 1000) AS BIGINT) AS q FROM events),
        |tot AS (SELECT event_type, count(*) AS n, sum(q) AS tq FROM ev GROUP BY 1),
        |cs AS (SELECT ev.event_type, ev.event_id,
        |         CAST(row_number() OVER w AS BIGINT) AS i,
        |         sum(ev.q) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps
        |       FROM ev WINDOW w AS (PARTITION BY ev.event_type ORDER BY ev.tus, ev.event_id)),
        |sdev AS (SELECT cs.event_type, cs.event_id, cs.i, tot.n,
        |           abs(cs.ps * tot.n - cs.i * tot.tq) AS sabs
        |         FROM cs JOIN tot USING (event_type)),
        |top AS (SELECT event_type, event_id, i, n, sabs,
        |          row_number() OVER (PARTITION BY event_type ORDER BY sabs DESC, i) AS rk
        |        FROM sdev)
        |SELECT event_type, n, i AS cp_index, event_id AS cp_event_id,
        |  CAST(sabs AS DOUBLE) AS cusum_max
        |FROM top WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q64_session_window" ->
      """WITH e AS (SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_id FROM events),
        |l AS (SELECT user_id, value, tus, event_id,
        |        CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
        |             OR lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM e),
        |g AS (SELECT user_id, value, tus,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM l)
        |SELECT user_id, min(tus) AS sess_start_us, max(tus) + 1800000000 AS sess_end_us,
        |  count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start_us""".stripMargin,

    "q65_forward_fill" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |             CASE WHEN event_type = 'purchase' THEN value END AS pv
        |           FROM events WHERE user_id < 50)
        |SELECT user_id, tus, event_id,
        |  last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
        |FROM e ORDER BY user_id, tus, event_id""".stripMargin,

    "q32_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |p AS (SELECT user_id, tus, event_id AS p_event_id, value AS p_value FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.tus, p.p_event_id, p.p_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus >= p.tus
        |ORDER BY e.event_id""".stripMargin,

    "q87_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |p AS (SELECT user_id, tus, event_id AS p_event_id, value AS p_value FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.tus, p.p_event_id, p.p_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus <= p.tus
        |ORDER BY e.event_id""".stripMargin)
}
