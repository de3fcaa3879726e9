package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Core relational operator inventory (SURVEY.md §2.B / §2.C): projection,
  * filters, aggregation, joins (broadcast / shuffle / semi / anti / outer),
  * windows, set ops, rollup/cube/grouping sets, subqueries, scalar function
  * families, top-k. Every query has a DuckDB-oracle SQL twin with identical
  * column names and a total ORDER BY so results hash-match row-for-row.
  *
  * Cross-engine determinism rules used throughout:
  *  - double columns are cast to DECIMAL(18,2) before SUM/AVG (exact,
  *    associative — safe under any partitioning / aggregation order);
  *  - per-row double arithmetic is fine (identical IEEE ops both engines);
  *  - every result carries a deterministic total sort;
  *  - NULLS FIRST is spelled explicitly where rollup/cube introduce NULL keys.
  *
  * Scale notes (100 TB): all aggregates here are partial+final (map-side
  * combine) hash aggregates; the dimension sides of every join (region,
  * nation, customer-filtered, part) are broadcast explicitly so the fact
  * table (lineitem) never shuffles for them; window functions partition on
  * high-cardinality keys (custkey/user_id) so state per key stays tiny.
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  // Narrow, range-safe casts for lineitem money math: price < 10^7,
  // discount <= 0.10. Products like (9,2)x(4,2) -> (14,4) and their
  // partial sums stay in Spark's COMPACT long-backed decimal path, where
  // (18,2)x(18,2) -> (37,4) forces BigDecimal per row (see q01's note);
  // values are identical, overflow safety at 10^12 rows unchanged.
  private def decP(c: Column): Column = c.cast(DecimalType(9, 2))
  private def decD(c: Column): Column = c.cast(DecimalType(4, 2))
  private def oneMinusD(c: Column): Column = lit(1).cast(DecimalType(4, 2)) - decD(c)
  // Final outputs of decimal aggregates are cast to DOUBLE: the aggregate
  // itself stays exact/associative (decimal), and decimal→double is
  // correctly rounded in both Spark (BigDecimal.doubleValue) and DuckDB,
  // so the driver's pandas compare sees bit-identical float64 on both
  // sides. Leaving DECIMAL in the output broke the round-1 hash compare:
  // Spark parquet decimals load as Python Decimal('254462.00') while the
  // DuckDB oracle yields float64 254462.0 — different string forms.
  private def d2(c: Column): Column = c.cast(DoubleType)
  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s))
  // The TPC-H revenue term price×(1−discount) as exact scale-4 long
  // units: price_cents × (100 − disc_cents). Feed to ExactSum.sumUnits
  // (_, 4) — bit-identical to d2(sum(decP(price) × oneMinusD(disc)))
  // at long-sum speed (see q01's note and functions/ExactSum.scala).
  private def revenueUnits: Column =
    graft.functions.ExactSum.cents(col("l_extendedprice"), 2) *
      (lit(100L) - graft.functions.ExactSum.cents(col("l_discount"), 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation ---------------------------------------------------
    "q01_pricing_summary" -> ((s, d) => {
      // Exact fixed-point sums at LONG speed ([[graft.functions
      // .ExactSum]]): per row, exact_cents reproduces the double→decimal
      // cast's unscaled long (codegen StaticInvoke), the discounted term
      // is pure long arithmetic at scale 4 (cents × (100 − disc_cents)),
      // and SumSplit128 accumulates into a base-2^31 split long state
      // that holds 2^93 summed units — overflow-safe far past 10^12-row
      // 100-TB totals, where both a plain SUM(BIGINT) (wraps/throws) and
      // Spark's decimal SUM buffers (per-row Decimal alloc + overflow
      // check; measured 6× slower over 60M rows) fall short. Values are
      // bit-identical to the decimal formulation (ExactSumSpec), so the
      // oracle keeps its (18,2) casts. One deliberate divergence from
      // the pre-round-9 plan: that plan cast through DECIMAL(9,2)/(4,2),
      // which NULLs any input past 10^7 — exact_cents stays real up to
      // ~9.2e16 unscaled, matching the (18,2) ORACLE rather than the
      // replaced narrow casts if inputs ever exceed TPC-H's documented
      // ranges (wider correctness, not a regression).
      // exact_cents(l_extendedprice)
      // appears in two aggregates but is computed once per row
      // (whole-stage codegen subexpression elimination).
      val uQ = graft.functions.ExactSum.cents(col("l_quantity"), 2)
      val uP = graft.functions.ExactSum.cents(col("l_extendedprice"), 2)
      val uDisc = uP * (lit(100L) - graft.functions.ExactSum.cents(col("l_discount"), 2))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2001-09-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          graft.functions.ExactSum.sumUnits(uQ, 2).as("sum_qty"),
          graft.functions.ExactSum.sumUnits(uP, 2).as("sum_base_price"),
          graft.functions.ExactSum.sumUnits(uDisc, 4).as("sum_disc_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q06_revenue_forecast" -> ((s, d) => {
      // price_cents × disc_cents = scale-4 units, summed exactly at
      // long speed (see q01's rationale)
      val units = graft.functions.ExactSum.cents(col("l_extendedprice"), 2) *
        graft.functions.ExactSum.cents(col("l_discount"), 2)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(graft.functions.ExactSum.sumUnits(units, 4).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Three single-purpose aggregates cross-joined (all 1-row), NOT one
    // multi-distinct agg: Spark plans two distinct aggregates in one agg
    // via Expand — every fact row triples before the partial hash
    // aggregate, the dominant cost at sf10 (5.5 s, the worst scaler in
    // the bench). Split, each branch scans ONE pruned parquet column
    // (total bytes read unchanged — columnar), dedups map-side, and
    // shuffles only distinct keys; the count branch scans no columns at
    // all. The branches are independent stages of one job and run
    // concurrently.
    "q11_distinct_counts" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.agg(countDistinct(col("l_partkey")).as("cnt_part"))
        .crossJoin(l.agg(countDistinct(col("l_suppkey")).as("cnt_supp")))
        .crossJoin(l.agg(count(lit(1)).as("cnt_rows")))
    }),

    "q19_case_buckets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("bucket",
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.ExactSum.sumExact(col("l_extendedprice"), 2).as("sum_price"))
        .orderBy(col("bucket"))
    }),

    // --- filters + projection -----------------------------------------
    "q02_filter_project" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice") > 100000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          (col("o_totalprice") * 0.9).as("discounted"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    }),

    "q15_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // --- joins ---------------------------------------------------------
    // Unconditional broadcast hints only on the true dimension side
    // (the filtered customer segment). The orders⋈customer result is
    // SF-LINEAR (~20% of orders) — a forced broadcast there is an OOM
    // at 100× because explicit hints are not size-gated and AQE cannot
    // override them. It gets the STATS-GATED hint instead
    // ([[graft.operators.Joins.broadcastIfSmall]], proxied by the two
    // scan-level inputs): zero-shuffle broadcast at bench SF, automatic
    // fall-through to AQE's shuffle join once the estimate outgrows
    // autoBroadcastJoinThreshold.
    "q03_shipping_priority" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
      l.join(
          graft.operators.Joins.broadcastIfSmall(
            o.join(broadcast(c), o("o_custkey") === c("c_custkey")), o, c),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(graft.functions.ExactSum.sumUnits(revenueUnits, 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Unconditional hints only on region (5 rows) and nation (25
    // rows) — constant-size dimensions at every SF. The SF-LINEAR
    // sides (ASIA customer slice ~20% of customers, supplier, the
    // orders⋈customer pre-join) get the stats-gated hint: at bench SF
    // every one fits the broadcast threshold and the whole chain is
    // map-only; as SF grows each gate closes independently, degrading
    // join-by-join to AQE shuffle joins.
    //
    // Join ORDER is the scale decision here, twice over:
    // 1. orders pre-joins the ASIA customer slice BEFORE meeting
    //    lineitem (the earlier shape — customer last — re-shuffled the
    //    full 60M-row joined fact on o_custkey at sf10, the single most
    //    expensive exchange in the bench; pre-joining shuffles 15M
    //    orders instead).
    // 2. lineitem meets the SELECTIVE oc side FIRST, supplier second:
    //    the l⋈oc inner join cuts the fact to the ~20% of rows with
    //    ASIA customers, so only that remainder re-shuffles on
    //    l_suppkey — l⋈sup-first shuffled all 60M rows on suppkey and
    //    THEN all 60M (+width of s_nationkey) again on orderkey
    //    (measured at sf10: 10.6 s → 7.5 s from this swap alone).
    // Inner-join reassociation both times — identical result.
    "q05_local_supplier" -> ((s, d) => {
      import graft.operators.Joins.broadcastIfSmall
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d).join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, d)
      val c = broadcastIfSmall(
        cust.join(broadcast(n), col("c_nationkey") === col("n_nationkey")), cust)
      val oRaw = Tables.orders(s, d)
      val oc = broadcastIfSmall(
        oRaw.join(c, col("o_custkey") === col("c_custkey")), oRaw, cust)
      val sup = broadcastIfSmall(Tables.supplier(s, d))
      val l = Tables.lineitem(s, d)
      l.join(oc, l("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === sup("s_suppkey") &&
          sup("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(graft.functions.ExactSum.sumUnits(revenueUnits, 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q04_semi_join" -> ((s, d) => {
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    "q13_anti_join" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_mktsegment"))
    }),

    // Pre-aggregate the fact side BEFORE the left join (the canonical
    // 100-TB rewrite; q07 read 2.7× on 10× data as a raw join): the
    // per-custkey counts ride the shuffle with map-side partial
    // aggregation — ~|customers| rows cross the wire instead of every
    // order row — and the join then carries ONE row per customer.
    // Exactly the raw left join's counts: count(o_orderkey) =
    // Σ per-key counts; count(*) = matched rows + 1 per orderless
    // customer = Σ coalesce(cnt, 1). The oracle stays the raw join.
    "q07_left_join_counts" -> ((s, d) => {
      val oc = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d)
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(sum(coalesce(col("cnt"), lit(0L))).as("order_cnt"),
          sum(coalesce(col("cnt"), lit(1L))).as("row_cnt"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- windows --------------------------------------------------------
    // One shuffle, not two: the window needs o_custkey clustering and the
    // deterministic output needs a global (o_custkey, …) order. A hash
    // window shuffle followed by orderBy range-shuffles the ENTIRE output
    // a second time (15M rows at sf10). RangePartitioning(o_custkey)
    // satisfies BOTH requirements — equal keys can't straddle a range
    // boundary, and it is a valid prefix of the output OrderedDistribution
    // — so the explicit repartitionByRange makes the final sort a cheap
    // in-partition re-sort with no second exchange.
    "q08_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .repartitionByRange(col("o_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q09_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Decimal sum kept HERE deliberately: running-window frames
      // re-evaluate the aggregate per row, where the built-in decimal
      // sum's return-the-buffer evaluate beats ExactSum's state
      // reconstruction (measured 3.7 vs 4.9 s at sf10); the ExactSum
      // rewrite only pays off in hash aggregates (q01/q03/q05/...).
      Tables.orders(s, d)
        .repartitionByRange(col("o_custkey"))
        .withColumn("run_total", d2(sum(dec(col("o_totalprice"))).over(w)))
        .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q10_window_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 5)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rnk"), col("drnk"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
    }),

    // --- set operations -------------------------------------------------
    "q12_intersect" -> ((s, d) => {
      val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bigSpenders = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(bigSpenders).orderBy(col("c_custkey"))
    }),

    "q14_except" -> ((s, d) => {
      val all = Tables.customer(s, d).select(col("c_custkey"))
      val bigSpenders = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("c_custkey"))
      all.except(bigSpenders).orderBy(col("c_custkey"))
    }),

    "q25_union_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(lit("cust").as("src"), col("c_custkey").as("key"))
      val p = Tables.supplier(s, d).select(lit("supp").as("src"), col("s_suppkey").as("key"))
      c.unionAll(p).groupBy(col("src"))
        .agg(count(lit(1)).as("cnt"), max(col("key")).as("max_key"))
        .orderBy(col("src"))
    }),

    // --- rollup / cube / grouping sets ----------------------------------
    // Grouping lattices run over a PRE-AGGREGATED base: Spark's Expand
    // operator replicates its input once per grouping set, so expanding
    // the raw fact table triples/quadruples the rows flowing into the
    // aggregate. count/sum are reassociable, so aggregating to the full
    // grouping key first (map-side combine, one tiny result) and then
    // expanding THAT is semantically identical — at 100 TB it is the
    // difference between expanding 10^12 rows and expanding a few
    // thousand.
    "q16_rollup" -> ((s, d) => {
      // inner 60M-row pass sums exact cent units at long speed; the
      // outer lattice re-sums the ≤6 exact DECIMAL(38,0) partials and
      // scales back — identical values, decimal math only on the tiny side
      val base = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("c"), graft.functions.ExactSum.sumUnitsRaw(
          graft.functions.ExactSum.cents(col("l_quantity"), 2)).as("q"))
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("c")).as("cnt"), d2(sum(col("q")) / lit(100)).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q17_cube" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("c"))
      base.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    "q18_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""WITH base AS (
              |  SELECT l_returnflag, l_linestatus, count(*) AS c
              |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
              |SELECT l_returnflag, l_linestatus, sum(c) AS cnt
              |FROM base
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // --- subqueries -----------------------------------------------------
    "q20_exists_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE EXISTS (SELECT 1 FROM orders o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
              |ORDER BY c_custkey""".stripMargin)
    }),

    "q21_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_totalprice > 0.98 * (SELECT max(o_totalprice) FROM orders)
              |ORDER BY o_orderkey""".stripMargin)
    }),

    "q22_in_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql("""SELECT c_custkey, c_nationkey FROM customer
              |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
              |  AND c_acctbal > 9000
              |ORDER BY c_custkey""".stripMargin)
    }),

    // TPC-H Q21's shape on our columns: per-row EXISTS plus a
    // NOT EXISTS over the SAME correlated table — the hardest standard
    // decorrelation pattern (Catalyst plans both as semi/anti joins on
    // l_orderkey; no per-row subquery execution survives). Blame the
    // sole supplier whose item came back returned in a multi-supplier
    // finalized order.
    "q142_late_supplier_blame" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      s.sql("""SELECT s_name, count(*) AS numwait
              |FROM supplier, lineitem l1, orders
              |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
              |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              |  AND EXISTS (SELECT 1 FROM lineitem l2
              |              WHERE l2.l_orderkey = l1.l_orderkey
              |                AND l2.l_suppkey <> l1.l_suppkey)
              |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
              |                  WHERE l3.l_orderkey = l1.l_orderkey
              |                    AND l3.l_suppkey <> l1.l_suppkey
              |                    AND l3.l_returnflag = 'R')
              |GROUP BY s_name
              |ORDER BY numwait DESC, s_name
              |LIMIT 20""".stripMargin)
    }),

    // --- scalar function families --------------------------------------
    "q23_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").like("%bolt%"))
        .select(col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 3).as("type3"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "o", "0").as("leeted"))
        .orderBy(col("p_partkey"))
    }),

    "q24_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.ExactSum.sumExact(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("yr"), col("mo"))
    }),

    "q26_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_quantity")).as("sq"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_discount") * 100).as("ce"),
          abs(col("l_extendedprice") - 30000.0).as("ab"),
          (col("l_partkey") % 7).as("md"))
        // (l_orderkey, l_linenumber) is not unique in the generator
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("fl"), col("sq"), col("md"), col("ce"))
    }),

    // --- pivot ----------------------------------------------------------
    "q27_pivot_status" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy(col("yr"))
    }),

    // --- cross join ------------------------------------------------------
    "q34_cross_join" -> ((s, d) => {
      Tables.region(s, d)
        .crossJoin(Tables.orders(s, d).select(col("o_orderstatus")).distinct())
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    }),

    // --- skew-safe salted join (must equal the plain join → oracle) ------
    "q36_salted_join" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      graft.operators.SkewJoin.saltedEquiJoin(o, c, "o_custkey", saltBuckets = 8)
        .orderBy(col("o_orderkey"))
    }),

    // --- typed UDAF (Aggregator) -----------------------------------------
    "q35_udaf_sumsq" -> ((s, d) => {
      graft.functions.Udafs.registerAll(s)
      Tables.lineitem(s, d)
        .withColumn("q", col("l_quantity").cast(LongType))
        .groupBy(col("l_returnflag"))
        .agg(call_udf("sum_sq", col("q")).as("sum_sq"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    // --- ordered collect + null-handling function family ------------------
    "q38_collect_sorted" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    "q39_null_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
          when(col("o_totalprice") > 300000, col("o_totalprice")).as("big_or_null"))
        .groupBy(col("status_filled"))
        .agg(count(lit(1)).as("cnt"),
          count(col("status_or_null")).as("non_null_cnt"),
          count(col("big_or_null")).as("big_cnt"))
        .orderBy(col("status_filled"))
    }),

    "q40_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.ExactSum.sumExact(col("o_totalprice"), 2).as("total"))
        .filter(col("n_orders") >= 8)
        .orderBy(col("o_custkey"))
    }),

    "q41_date_arith" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("ship_lag_days"))
        .filter(col("l_orderkey") < 500)
        // (l_orderkey, l_linenumber) is not unique in the generator —
        // include the computed column for a total order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_lag_days"))
    }),

    "q42_string_split" -> ((s, d) => {
      Tables.part(s, d)
        // array results are flattened to strings: the driver's pandas
        // compare cannot sort/hash ndarray cells (round-1 q42 crash)
        .select(col("p_partkey"), array_join(split(col("p_name"), " "), " ").as("words"),
          array_join(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)), ",").as("alpha_runs"))
        .filter(col("p_partkey") < 200)
        .orderBy(col("p_partkey"))
    }),

    "q43_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"))
        .rangeBetween(-1000L, 0L)
      Tables.customer(s, d)
        .withColumn("peers_within_1000",
          count(lit(1)).over(w))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"), col("peers_within_1000"))
        .orderBy(col("c_custkey"))
    }),

    "q44_lead_lag_defaults" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1, -1L).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q45_bit_ops" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey").bitwiseAND(255)).as("band"),
          (col("l_partkey").bitwiseOR(col("l_suppkey"))).as("bor"),
          (col("l_partkey").bitwiseXOR(col("l_suppkey"))).as("bxor"),
          shiftleft(col("l_linenumber"), 3).as("shl"))
        // (l_orderkey, l_linenumber) is not unique in the generator
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("bxor"), col("bor"))
    }),

    // --- exact percentiles (Spark `percentile` and DuckDB `quantile_cont`
    // both linearly interpolate — bit-identical on this data)
    "q37_percentiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
          expr("percentile(l_extendedprice, 0.5)").as("median_price"),
          expr("percentile(l_extendedprice, 0.95)").as("p95_price"))
        .orderBy(col("l_returnflag"))
    }),

    // --- approximate percentile (rows-only: sketch internals differ) ----
    "q46_approx_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("p95_approx"))
        .orderBy(col("l_returnflag"))
    }),

    // --- approximate (rows-only check: sketch internals differ) ---------
    "q28_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
    }),

    // MIXED-FAMILY inet ordering — closes the one observable divergence
    // from the reference's INET column type (zeek_reader.cpp:144-154
    // makes addr DuckDB INET, whose ORDER BY follows Postgres: FAMILY
    // first — every IPv4 before every IPv6 — then numeric within the
    // family, so "10.0.0.9" sorts before "10.0.0.10"; our StringType
    // addresses sort lexically). The codegen inet_sort_key expression
    // renders each address as its 17-byte family-tagged key (0x00=v4,
    // 0x01=v6, then 16 v6-mapped address bytes), and ranks come from
    // GlobalRank.withGlobalIndex (range-partition + zipWithIndex —
    // never a single-task window), so the order is OBSERVABLE to the
    // hash compare (which canonicalizes row order away). Every 5th
    // event contributes an fd00::/16 address instead of a v4 one, so
    // the family-first rule itself is oracle-verified, not just
    // spec-pinned. The oracle re-derives the total order from (family,
    // octets | group) and the key bytes from hex — same order, no inet
    // extension needed. v4 octet mixes force 1-, 2-, and 3-digit
    // octets to interleave (the lexical trap).
    "q151_inet_order" -> ((s, d) => {
      val ips = Tables.events(s, d).select(
          when(col("event_id") % 5 === 4,
            concat(lit("fd00::"), lower(hex((col("event_id") * 11) % 4096))))
          .otherwise(
            concat(lit("10."), (col("event_id") % 200).cast(StringType), lit("."),
              ((col("event_id") * 7) % 256).cast(StringType), lit("."),
              ((col("event_id") * 13) % 256).cast(StringType))).as("ip"))
        .distinct()
      val keyed = ips.withColumn("k",
        graft.inet.InetFunctions.inet_sort_key(s, col("ip")))
      graft.operators.GlobalRank.withGlobalIndex(keyed, "rk", col("k"))
        .select(col("rk"), col("ip"), lower(hex(col("k"))).as("key_hex"))
        .orderBy(col("rk"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | min(l_quantity) AS min_qty,
        | max(l_extendedprice) AS max_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q06_revenue_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q11_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS cnt_part, count(DISTINCT l_suppkey) AS cnt_supp,
        | count(*) AS cnt_rows FROM lineitem""".stripMargin,

    "q19_case_buckets" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'small' WHEN l_quantity < 30 THEN 'medium' ELSE 'large' END AS bucket,
        | count(*) AS cnt, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q02_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_totalprice * 0.9 AS discounted
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice > 100000
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "q15_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q03_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_local_supplier" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey AND c_nationkey = n_nationkey
        |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q13_anti_join" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_left_join_counts" ->
      """SELECT c_mktsegment, count(o_orderkey) AS order_cnt, count(*) AS row_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q08_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_window_rank_dense" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk, drnk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
        |    dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk
        |  FROM customer) x
        |WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,

    "q12_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY c_custkey""".stripMargin,

    "q14_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
        |ORDER BY c_custkey""".stripMargin,

    "q25_union_all" ->
      """SELECT src, count(*) AS cnt, max(key) AS max_key FROM (
        |  SELECT 'cust' AS src, c_custkey AS key FROM customer
        |  UNION ALL
        |  SELECT 'supp' AS src, s_suppkey AS key FROM supplier) u
        |GROUP BY src ORDER BY src""".stripMargin,

    "q16_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q17_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q18_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q20_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q21_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.98 * (SELECT max(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q22_in_subquery" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |  AND c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "q142_late_supplier_blame" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    "q23_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up_name, length(p_name) AS name_len,
        | substr(p_type, 1, 3) AS type3,
        | concat_ws('/', p_brand, p_type) AS brand_type,
        | regexp_replace(p_name, 'o', '0', 'g') AS leeted
        |FROM part WHERE p_name LIKE '%bolt%' ORDER BY p_partkey""".stripMargin,

    "q24_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        | count(*) AS cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

    "q26_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, sqrt(l_quantity) AS sq,
        | CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        | CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
        | abs(l_extendedprice - 30000.0) AS ab, l_partkey % 7 AS md
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, fl, sq, md, ce""".stripMargin,

    "q27_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "q34_cross_join" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        |ORDER BY r_name, o_orderstatus""".stripMargin,

    "q36_salted_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin,

    "q38_collect_sorted" ->
      """SELECT l_returnflag, array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q40_having" ->
      """SELECT o_custkey, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 8 ORDER BY o_custkey""".stripMargin,

    "q41_date_arith" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INT) AS ship_lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber, ship_lag_days""".stripMargin,

    "q42_string_split" ->
      """SELECT p_partkey, array_to_string(string_split(p_name, ' '), ' ') AS words,
        | array_to_string(regexp_extract_all(p_name, '[a-z]+', 0), ',') AS alpha_runs
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin,

    "q43_window_range_frame" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
        |   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS peers_within_1000
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q44_lead_lag_defaults" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_orderkey, 1, -1) OVER w AS prev_key,
        | lead(o_orderkey, 1, -1) OVER w AS next_key,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q45_bit_ops" ->
      """SELECT l_orderkey, l_linenumber,
        | l_partkey & 255 AS band, l_partkey | l_suppkey AS bor,
        | xor(l_partkey, l_suppkey) AS bxor,
        | CAST(l_linenumber << 3 AS INT) AS shl
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber, bxor, bor""".stripMargin,

    "q39_null_funcs" ->
      """SELECT coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        | count(*) AS cnt,
        | count(nullif(o_orderstatus, 'O')) AS non_null_cnt,
        | count(CASE WHEN o_totalprice > 300000 THEN o_totalprice END) AS big_cnt
        |FROM orders GROUP BY 1 ORDER BY status_filled""".stripMargin,

    "q37_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.25) AS p25_price,
        | quantile_cont(l_extendedprice, 0.5) AS median_price,
        | quantile_cont(l_extendedprice, 0.95) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q35_udaf_sumsq" ->
      // DuckDB sum(BIGINT) widens to HUGEINT, which lands in pandas as
      // float64 — cast back to BIGINT to match Spark's int64
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_sq,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q28_approx_distinct: intentionally no oracle — HLL sketches differ
    // across engines; driver records a rows-only check.

    // family-first total order re-derived arithmetically: fam sorts v4
    // (0) before v6 (1), then octets / the last v6 group; key_hex is
    // the 17-byte tagged key spelled out per family.
    "q151_inet_order" ->
      """WITH raw AS (SELECT DISTINCT
        |    CASE WHEN event_id % 5 = 4 THEN 1 ELSE 0 END AS fam,
        |    CASE WHEN event_id % 5 = 4 THEN (event_id * 11) % 4096 ELSE event_id % 200 END AS a,
        |    CASE WHEN event_id % 5 = 4 THEN 0 ELSE (event_id * 7) % 256 END AS b,
        |    CASE WHEN event_id % 5 = 4 THEN 0 ELSE (event_id * 13) % 256 END AS c
        |  FROM events)
        |SELECT row_number() OVER (ORDER BY fam, a, b, c) - 1 AS rk,
        |  CASE WHEN fam = 1 THEN 'fd00::' || printf('%x', a)
        |       ELSE '10.' || CAST(a AS VARCHAR) || '.' || CAST(b AS VARCHAR) || '.' ||
        |            CAST(c AS VARCHAR) END AS ip,
        |  CASE WHEN fam = 1 THEN '01fd00' || repeat('0', 24) || printf('%04x', a)
        |       ELSE '00' || repeat('0', 20) || 'ffff' ||
        |            printf('%02x%02x%02x%02x', 10, a, b, c) END AS key_hex
        |FROM raw ORDER BY rk""".stripMargin
  )
}
