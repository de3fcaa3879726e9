package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Second wave of the SURVEY.md §2.B/§2.C operator inventory: JSON
  * extraction, extended string functions, edit distance, arg-max /
  * median aggregates, ordered string aggregation, boolean/bitwise
  * aggregates, unpivot, first/last/nth window values, full outer join,
  * correlated aggregate subqueries.
  *
  * Same determinism rules as [[CoreQueries]]: decimal-exact aggregation
  * cast to DOUBLE at the end, total ORDER BY, alias parity with the
  * DuckDB oracle.
  */
object ExtendedQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** The q93/q139 synthetic CDC feed: v1 upserts (%5), v2 tombstones
    * (%10), v3 upserts (%20). */
  private def scd2Feed(s: SparkSession, d: String): DataFrame =
    scd2FeedOf(Tables.orders(s, d))

  /** [[scd2Feed]] over an explicit orders frame — shared by q149 and its
    * key-prefix-sliced twin (one builder, no drift). */
  private def scd2FeedOf(orders: DataFrame): DataFrame = {
    val v1 = orders.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), lit(1L).as("version"), lit("U").as("op"),
        lit("X1").as("o_orderstatus"), (col("o_totalprice") + 100).as("o_totalprice"))
    val v2 = orders.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit(2L).as("version"), lit("D").as("op"),
        lit(null).cast(StringType).as("o_orderstatus"),
        lit(null).cast(DoubleType).as("o_totalprice"))
    val v3 = orders.filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), lit(3L).as("version"), lit("U").as("op"),
        lit("X3").as("o_orderstatus"), (col("o_totalprice") + 300).as("o_totalprice"))
    v1.unionByName(v2).unionByName(v3)
  }

  /** q135's personalized-pagerank body over explicit frames — shared by
    * the full query and the q135s twin. */
  private def q135Body(orders: DataFrame, line: DataFrame,
      customer: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(line.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    val seeds = customer.filter(col("c_custkey") < 10)
      .select(concat(lit("c"), col("c_custkey")).as("node"))
    graft.operators.PageRank.personalizedPageRank(edges, seeds, iters = 5)
      .filter(col("node").startsWith("s") && col("val") > 0)
      .orderBy(col("val").desc, col("node").asc)
      .limit(20)
  }

  /** q149's as-of dimension lookup over explicit orders/lineitem frames
    * — the shared full-query + q149s twin body. */
  private def q149Body(orders: DataFrame, line: DataFrame): DataFrame = {
    val hist = graft.operators.Scd2.buildHistory(scd2FeedOf(orders), Seq("o_orderkey"))
    val facts = line
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 3 + 1).cast(LongType).as("asof"))
    facts.join(hist,
        facts("l_orderkey") === hist("o_orderkey") &&
          col("valid_from") <= col("asof") &&
          (col("valid_to").isNull || col("asof") < col("valid_to")),
        "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("asof"),
        col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q75's oracle: the SAME integer fixed-point PageRank iterations as
    * [[graft.operators.PageRank.integerPageRank]], unrolled as CTEs
    * (DuckDB `//` == Spark `div` for the all-positive values here). */
  private def pagerankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node, 150000 + (85 * coalesce(x.s, 0)) // 100 AS val
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.val // d.deg) AS s
         |    FROM r${i - 1} r JOIN deg d ON r.node = d.node
         |    JOIN edges e ON e.src = r.node GROUP BY e.dst) x ON n.node = x.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS val FROM nodes),
       |$iterCtes
       |SELECT node, CAST(val AS BIGINT) AS val FROM r$iters
       |WHERE node LIKE 's%'
       |ORDER BY val DESC, node LIMIT 20""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // incremental aggregate maintenance (materialized-view maintenance):
    // the per-customer rollup is built by folding seven year-batches into
    // the state table one merge at a time (operators.IncrementalAgg);
    // the ORACLE computes the same aggregate DIRECTLY over the whole
    // table, so the hash proves maintenance ≡ recompute. Each merge
    // shuffles only its batch — at 100 TB the maintenance tick costs
    // O(batch), not O(history); see IncrementalAgg's scaladoc for the
    // bucketed-state zero-shuffle variant.
    "q92_incremental_agg" -> ((s, d) => {
      import graft.operators.IncrementalAgg
      val o = Tables.orders(s, d).withColumn("yr", year(col("o_orderdate")))
      val keys = Seq("o_custkey")
      val state = (1996 to 2001).foldLeft(
        IncrementalAgg.init(o.filter(col("yr") === 1995), keys, "o_totalprice")) {
        (st, y) => IncrementalAgg.merge(st, o.filter(col("yr") === y), keys, "o_totalprice")
      }
      IncrementalAgg.view(state)
        .select(col("o_custkey"), col("cnt"),
          // decimal-exact internally; DOUBLE at the output boundary (the
          // q01 convention — the driver compare is dtype-sensitive)
          col("sum_v").cast(DoubleType).as("sum_v"), col("min_v"),
          // raw IEEE division (identical inputs ⇒ identical bits in both
          // engines); round() here would re-introduce engine-specific
          // half-way behavior on the 4th decimal
          col("max_v"), col("avg_v"))
        .orderBy(col("o_custkey"))
    }),

    // --- JSON extraction (distinct from q31's regexp path) --------------
    "q47_json_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy((col("k") % 5).as("k_mod"))
        .agg(count(lit(1)).as("cnt"), max(col("k")).as("max_k"),
          min(col("k")).as("min_k"))
        .orderBy(col("k_mod"))
    }),

    // --- extended string family -----------------------------------------
    "q48_string_funcs2" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, ".").as("lp"),
          rpad(col("p_brand"), 12, ".").as("rp"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          reverse(col("p_name")).as("rev"),
          instr(col("p_name"), "o").as("pos_o"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 4)").as("r4"),
          expr("repeat(p_brand, 2)").as("rep2"))
        .orderBy(col("p_partkey"))
    }),

    "q49_edit_distance" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), lit("promo burnished copper")).as("lev"),
          levenshtein(col("p_brand"), col("p_type")).as("lev_bt"))
        .orderBy(col("p_partkey"))
    }),

    // --- arg-max / arg-min / median aggregates ---------------------------
    "q50_argmax_median" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(max_by(col("p_name"), struct(col("p_retailprice"), col("p_partkey"))).as("priciest"),
          min_by(col("p_name"), struct(col("p_retailprice"), col("p_partkey"))).as("cheapest"),
          expr("percentile(p_retailprice, 0.5)").as("median_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("p_brand"))
    }),

    // --- ordered string aggregation --------------------------------------
    "q51_string_agg" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_acctbal") > 9900)
        .groupBy(col("c_mktsegment"))
        .agg(array_join(sort_array(collect_list(col("c_name"))), ",").as("names"),
          count(lit(1)).as("cnt"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- boolean / conditional / bitwise aggregates ----------------------
    "q52_bool_bit_aggs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(bool_or(col("l_quantity") > 49).as("any_big"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          count_if(col("l_discount") > 0.05).as("n_disc"),
          bit_or(col("l_linenumber")).as("b_or"),
          bit_and(col("l_linenumber")).as("b_and"),
          bit_xor(col("l_linenumber")).as("b_xor"))
        .orderBy(col("l_returnflag"))
    }),

    // --- unpivot (wide → long) -------------------------------------------
    "q53_unpivot" -> ((s, d) => {
      val wide = Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
      wide.unpivot(Array(col("yr")), Array(col("F"), col("O"), col("P")),
          "status", "cnt")
        .orderBy(col("yr"), col("status"))
    }),

    // --- first/last/nth window values ------------------------------------
    "q54_first_last_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        // single-shuffle shape (q08/q09 pattern): range partitioning by
        // o_custkey serves the window AND the final ordered output
        .repartitionByRange(col("o_custkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // --- distribution window functions ------------------------------------
    "q61_percent_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .filter(col("c_custkey") < 500)
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    }),

    // --- hash-threshold sampled distinct (deterministic sketch core) ------
    // the 1/256 hash-sample estimator behind adaptive-sampling distinct
    // sketches, made cross-engine deterministic via md5 — unlike HLL
    // (q28, rows-only) this one hash-checks exactly
    "q67_sampled_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), md5(col("l_orderkey").cast("string")).as("h"))
        .filter(substring(col("h"), 1, 2) === "00")
        .agg((countDistinct(col("l_orderkey")) * 256).as("est_distinct"),
          count(lit(1)).as("n_sampled"))
    }),

    // --- bucketed range join (point-in-interval, no nested loop) ----------
    "q66_range_join" -> ((s, d) =>
      q66Body(Tables.part(s, d), Tables.lineitem(s, d))),

    // sliced oracle twin of q66 (see q95s): the oracle's unbucketed
    // interval join OOMs at sf10's 2M intervals × 60M points; both sides
    // pin to constants inside the oracle-proven sf1 scale, oracle SQL
    // derived from q66's own string, Spark body shared.
    "q66s_range_join_sliced" -> ((s, d) =>
      q66Body(Tables.part(s, d).filter(col("p_partkey") < PartSliceBound),
        Tables.lineitem(s, d).filter(col("l_orderkey") < OrderSliceBound))),

    // --- lateral join (correlated per-row top-n subquery) -----------------
    "q63_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer_v c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_v o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey < 100
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    }),

    // --- mode aggregate (deterministic tie-break) -------------------------
    "q62_mode" -> ((s, d) => {
      graft.operators.ModeOp.modeBy(Tables.orders(s, d),
        Seq("o_orderstatus"), "o_orderpriority")
        .orderBy(col("o_orderstatus"))
    }),

    // --- full outer join --------------------------------------------------
    "q55_full_outer" -> ((s, d) => {
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      rich.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNull, "order_only")
            .when(col("o_custkey").isNull, "cust_only")
            .otherwise("both").as("side"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("custkey"))
    }),

    // --- date parts / truncation ------------------------------------------
    "q57_date_parts" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          // DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based
          (dayofweek(col("o_orderdate")) - 1).as("dw"),
          dayofyear(col("o_orderdate")).as("dy"),
          weekofyear(col("o_orderdate")).as("wk"),
          quarter(col("o_orderdate")).as("q"),
          // date outputs are cast to timestamp: Spark parquet DATE loads
          // into pandas as datetime.date objects while the DuckDB oracle
          // yields datetime64 — timestamps round-trip identically
          date_trunc("month", col("o_orderdate")).as("mstart"),
          last_day(col("o_orderdate")).cast(TimestampType).as("mend"))
        .orderBy(col("o_orderkey"))
    }),

    "q58_interval_arith" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          add_months(col("o_orderdate"), 3).cast(TimestampType).as("plus3m"),
          date_add(col("o_orderdate").cast(DateType), 45).cast(TimestampType).as("plus45d"),
          date_sub(col("o_orderdate").cast(DateType), 7).cast(TimestampType).as("minus7d"))
        .orderBy(col("o_orderkey"))
    }),

    // --- map construction / access ---------------------------------------
    "q59_map_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .withColumn("m", map(lit("brand"), col("p_brand"), lit("type"), col("p_type")))
        .select(col("p_partkey"),
          element_at(col("m"), "brand").as("mb"),
          size(col("m")).as("msize"),
          array_join(map_keys(col("m")), ",").as("mkeys"))
        .orderBy(col("p_partkey"))
    }),

    // --- higher-order array functions (lambda family) ---------------------
    "q68_higher_order" -> ((s, d) => {
      Tables.part(s, d).filter(col("p_partkey") < 300)
        .withColumn("ws", split(col("p_name"), " "))
        .select(col("p_partkey"),
          exists(col("ws"), w => length(w) > 6).as("has_long"),
          forall(col("ws"), w => length(w) >= 3).as("all_ge3"),
          size(filter(col("ws"), w => w.startsWith("s"))).cast(LongType).as("n_s"),
          aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)).as("total_len"),
          array_join(transform(col("ws"), w => upper(substring(w, 1, 1))), "").as("initials"))
        .orderBy(col("p_partkey"))
    }),

    // --- error-tolerant arithmetic (try_* family) -------------------------
    "q69_try_arith" -> ((s, d) => {
      Tables.orders(s, d).filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          round(try_divide(col("o_totalprice").cast(DoubleType),
            (col("o_orderkey") % 7).cast(DoubleType)), 4).as("div7"),
          expr("try_cast(cast(o_orderkey AS STRING) AS BIGINT)").as("ok_cast"),
          expr("try_cast(o_orderstatus AS BIGINT)").as("bad_cast"))
        .orderBy(col("o_orderkey"))
    }),

    // --- GROUPING() markers over a rollup lattice -------------------------
    // distinguishes "NULL because subtotal row" from "NULL in the data" —
    // the part of the lattice family q16-q18 didn't exercise
    "q70_grouping_marks" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"),
          count(lit(1)).as("cnt"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("g_status"), col("g_prio"), col("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last, col("g_status"), col("g_prio"))
    }),

    // --- ntile quartiles ---------------------------------------------------
    // equi-depth bucketing per group — the remaining ranking window
    // function the q08-q61 family didn't exercise. The (desc price,
    // orderkey) order is total, so bucket assignment is deterministic;
    // the per-bucket aggregate keeps the output bounded.
    "q71_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("bucket", ntile(4).over(w))
        .groupBy(col("o_orderpriority"), col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderpriority"), col("bucket"))
    }),

    // --- array set algebra -------------------------------------------------
    // intersect/union/except with sort+join canonicalization (engines
    // order set results differently; sorted CSV strings compare exactly)
    "q72_array_set_ops" -> ((s, d) => {
      val ref = array(Seq("small", "red", "blue", "ring", "bolt").map(lit): _*)
      Tables.part(s, d).filter(col("p_partkey") < 400)
        .withColumn("words", split(col("p_name"), " "))
        .select(col("p_partkey"),
          array_join(array_sort(array_intersect(col("words"), ref)), ",").as("inter"),
          array_join(array_sort(array_union(col("words"), ref)), ",").as("uni"),
          array_join(array_sort(array_except(col("words"), ref)), ",").as("exc"),
          array_contains(col("words"), "red").as("has_red"))
        .orderBy(col("p_partkey"))
    }),

    // --- regexp_extract_all ------------------------------------------------
    "q73_regexp_extract_all" -> ((s, d) => {
      Tables.part(s, d).filter(col("p_partkey") < 400)
        .select(col("p_partkey"),
          array_join(expr("regexp_extract_all(concat(p_name, '-', lower(p_type)), '[a-z]+', 0)"), ",")
            .as("letter_runs"),
          expr("regexp_extract_all(p_brand, '\\\\d+', 0)[0]").as("brand_num"),
          size(expr("regexp_extract_all(p_name, '[aeiou]', 0)")).as("n_vowels"))
        .orderBy(col("p_partkey"))
    }),

    // --- iterative graph: fixed-point PageRank ------------------------------
    // supplier centrality over the customer↔supplier purchase graph —
    // the iterative-computation operator class beyond d09's connected
    // components. Integer fixed-point arithmetic makes 5 rounds of
    // damped propagation bit-identical in both engines (the oracle
    // unrolls the same iterations as CTEs).
    // personalized PageRank from a customer-segment seed set (custkey
    // < 10): "which suppliers matter to THESE customers" — the
    // recommendation/locality variant of q75. Teleport mass lands only
    // on seeds; per-round plan identical to the global variant (the
    // seed flag rides the node table), integer fixed-point throughout,
    // unrolled-CTE oracle.
    "q135_ppr" -> ((s, d) =>
      q135Body(Tables.orders(s, d), Tables.lineitem(s, d), Tables.customer(s, d))),

    // sliced oracle twin of q135 (see q75s): same 5 personalized
    // integer-pagerank rounds on the bipartite graph restricted to
    // l_suppkey < SuppSliceBound; oracle derived from q135's own
    // unrolled-rounds SQL, Spark body shared.
    "q135s_ppr_sliced" -> ((s, d) =>
      q135Body(Tables.orders(s, d),
        Tables.lineitem(s, d).filter(col("l_suppkey") < SuppSliceBound),
        Tables.customer(s, d))),

    "q75_graph_pagerank" -> ((s, d) =>
      q75Body(Tables.orders(s, d), Tables.lineitem(s, d))),

    // sliced oracle twin of q75 (see q95s) — the ITERATIVE graph-SQL
    // representative: same 5 integer pagerank rounds on the bipartite
    // graph restricted to l_suppkey < SuppSliceBound (customers join in
    // unsliced; the graph is what shrinks). Oracle derived from q75's
    // own unrolled-rounds SQL, Spark body shared.
    "q75s_graph_pagerank_sliced" -> ((s, d) =>
      q75Body(Tables.orders(s, d),
        Tables.lineitem(s, d).filter(col("l_suppkey") < SuppSliceBound))),

    // --- count-min-sketch heavy hitters -------------------------------------
    // Spark's count_min_sketch aggregate + the graft cms_estimate probe
    // (Spark ships the writer but no SQL reader). The sketch is a real
    // partial/merge aggregate over the fact stream; the 1-row sketch
    // broadcasts against the key table for probing. The ORACLE checks
    // the formal CMS guarantee as a boolean, with the output rows chosen
    // by EXACT counts (both SF-stable). Until round 10 it asserted
    // est == exact, which only holds while the sketch width (~2718 at
    // eps=0.001) dwarfs the key space: the sf1 sweep (10k suppliers)
    // broke it the moment real collisions appeared — the sketch WORKING
    // as designed. The asserted bound is exact ≤ est ≤ exact +
    // 3·ceil(eps·N): the textbook 1× bound holds only with confidence
    // 0.99 PER KEY (depth 5 at delta=0.01), so on a brand-new dataset a
    // top-10 key has ~10% total chance of deterministically violating it
    // — a gate must not fail on the sketch meeting its own contract. At
    // 3× the per-row Markov bound is 1/(3e) and the per-key failure
    // probability (1/(3e))^5 ≈ 3e-5 — SF-stable in practice. A FAILURE
    // here therefore means a real defect (under-estimate, or error far
    // outside the sketch's guarantee), not an unlucky dataset. The
    // ScalaTest property spec pins the tight 1× bound on a fixed corpus.
    "q74_cms_heavy_hitters" -> ((s, d) => {
      graft.functions.SketchExpressions.registerAll(s)
      val li = Tables.lineitem(s, d)
      val sk = li.agg(expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_rows"))
      val keys = li.groupBy("l_suppkey").agg(count(lit(1)).as("exact_cnt"))
      keys.crossJoin(broadcast(sk))
        .select(col("l_suppkey"), col("exact_cnt"),
          (expr("cms_estimate(sk, l_suppkey)") >= col("exact_cnt") &&
            expr("cms_estimate(sk, l_suppkey)") <=
              col("exact_cnt") + lit(3) * ceil(col("n_rows") * lit(0.001))).as("est_ok"))
        .orderBy(col("exact_cnt").desc, col("l_suppkey").asc)
        .limit(10)
    }),

    // --- recursive CTE (tree walk) ------------------------------------------
    // Spark 4.1's WITH RECURSIVE (UnionLoop): a binary-tree walk over a
    // dense re-keying of orders (node i's parent is i div 2), carrying a
    // root-to-node decimal path sum. UNION ALL recursion reaches each
    // node exactly once (it is a tree), so no dedup is needed — Spark
    // does not support UNION-dedup recursion yet. The dense ids come
    // from one row_number over a bounded keyspace prefix, materialized
    // EAGERLY (localCheckpoint): UnionLoop re-evaluates every referenced
    // plan on every iteration, so an inline base would re-scan and
    // re-sort the table once per level — measured 10x the runtime. The
    // recursion itself is iterative equi-joins keyed on the parent id —
    // the same scale shape as PageRank/DedupClusters.
    "q76_recursive_tree" -> ((s, d) => {
      val ids = Tables.orders(s, d).filter(col("o_orderkey") <= 20000)
        .select(row_number().over(Window.orderBy(col("o_orderkey"))).as("id"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
        .localCheckpoint()
      ids.createOrReplaceTempView("q76_ids")
      s.sql("""WITH RECURSIVE ids AS (SELECT id, price FROM q76_ids),
              |tree(id, depth, path_sum) AS (
              |  SELECT id, 0, price FROM ids WHERE id = 1
              |  UNION ALL
              |  SELECT c.id, t.depth + 1,
              |         CAST(t.path_sum + c.price AS DECIMAL(18,2))
              |  FROM ids c JOIN tree t ON c.id DIV 2 = t.id
              |  WHERE c.id > 1
              |)
              |SELECT depth, count(*) AS cnt,
              |       CAST(sum(path_sum) AS DOUBLE) AS total,
              |       CAST(max(path_sum) AS DOUBLE) AS max_path
              |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    // --- triangle counting ---------------------------------------------------
    // per-supplier triangle participation in the co-purchase graph
    // (suppliers adjacent when they serve ≥ 5 common orders — the weight
    // floor keeps edge density bounded as orders grow: at sf0.1 it is
    // ~10% of the pair space where ≥2 is ~70%). The Spark side runs the
    // degree-ordered O(m^1.5) plan (operators.Triangles); the oracle
    // enumerates by id order — same triangles, same counts.
    "q77_triangle_count" -> ((s, d) => q77Body(Tables.lineitem(s, d))),

    // sliced oracle twin of q77 (see q95s): the oracle's id-order
    // triangle enumeration over the full co-purchase graph OOMs at
    // sf10; the graph restricted to l_suppkey < SuppSliceBound is
    // sf0.1-sized at any SF, oracle derived from q77's own SQL, Spark
    // body shared.
    "q77s_triangle_count_sliced" -> ((s, d) =>
      q77Body(Tables.lineitem(s, d).filter(col("l_suppkey") < SuppSliceBound))),

    // --- z-order layout ------------------------------------------------------
    // Morton-curve clustering stats: bucket the fact table by the top 6
    // bits of the 16-bit z-value over (partkey, suppkey) mod 256 and
    // report each bucket's bounding rectangle. Each bucket's min/max
    // ranges stay ≤ 1/8 of either key's domain — exactly the footer-
    // stats property that makes a z-sorted 100 TB table prunable on
    // BOTH columns (operators.ZOrder; geometric bound proven in
    // ZOrderSpec). The oracle recomputes the interleave from the same
    // generated bit expression.
    "q79_zorder_layout" -> ((s, d) => {
      val z = graft.operators.ZOrder.zValue2(
        col("l_partkey") % 256, col("l_suppkey") % 256, bits = 8)
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 256).as("px"), (col("l_suppkey") % 256).as("sy"), z.as("z"))
        .groupBy(shiftright(col("z"), 10).as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("px")).as("pk_lo"), max(col("px")).as("pk_hi"),
          min(col("sy")).as("sk_lo"), max(col("sy")).as("sk_hi"))
        .orderBy(col("bucket"))
    }),

    // --- zone-map skipping effectiveness --------------------------------------
    // the "was the z-order rewrite worth it?" readout: simulate 64-file
    // layouts under (a) the q79 z-order and (b) a hash-scatter
    // insertion order, build per-file min/max zone maps on the partkey
    // dimension, and count how many files four range predicates can
    // skip under each layout. All integers (file ids, bounds, skip
    // counts), so the whole report hash-checks; the z-order layout
    // should skip most files while the scatter layout skips none —
    // exactly the footer-stats argument for paying the layout shuffle.
    // Scale shape: two partial-aggregated zone-map passes + a broadcast
    // 4-row predicate table; never a row-level predicate join.
    "q148_zonemap_skip" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val z = graft.operators.ZOrder.zValue2(
        col("l_partkey") % 256, col("l_suppkey") % 256, bits = 8)
      val rows = Tables.lineitem(s, d)
        .select((col("l_partkey") % 256).as("px"),
          shiftright(z, 10).as("zfile"), (col("l_orderkey") % 64).as("hfile"))
      def zones(fileCol: String, layout: String) =
        rows.groupBy(col(fileCol).as("file"))
          .agg(min(col("px")).as("lo"), max(col("px")).as("hi"))
          .withColumn("layout", lit(layout))
      val zmaps = zones("zfile", "zorder").union(zones("hfile", "scatter"))
      val preds = Seq((0, 31), (64, 95), (128, 159), (192, 223))
        .toDF("p_lo", "p_hi")
      zmaps.crossJoin(broadcast(preds))
        .groupBy(col("layout"), col("p_lo"), col("p_hi"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("hi") < col("p_lo") || col("lo") > col("p_hi"), 1L)
            .otherwise(0L)).as("n_skipped"))
        .withColumn("n_scanned", col("n_files") - col("n_skipped"))
        .orderBy(col("layout"), col("p_lo"))
    }),

    // --- 3-D z-order layout ---------------------------------------------------
    // q79 with a THIRD key column interleaved (operators.ZOrder.zValueN):
    // top-6-bit buckets stay bounded boxes in ALL THREE dims, so footer
    // stats prune on any of the three predicates. The oracle recomputes
    // the interleave from the same generated bit expression.
    "q85_zorder3d" -> ((s, d) => {
      val z = graft.operators.ZOrder.zValueN(
        Seq(col("l_partkey") % 64, col("l_suppkey") % 64, col("l_orderkey") % 64),
        bits = 6)
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 64).as("px"), (col("l_suppkey") % 64).as("sy"),
          (col("l_orderkey") % 64).as("oz"), z.as("z"))
        .groupBy(shiftright(col("z"), 12).as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("px")).as("pk_lo"), max(col("px")).as("pk_hi"),
          min(col("sy")).as("sk_lo"), max(col("sy")).as("sk_hi"),
          min(col("oz")).as("ok_lo"), max(col("oz")).as("ok_hi"))
        .orderBy(col("bucket"))
    }),

    // --- Hilbert-curve layout -------------------------------------------------
    // q79's layout with the Hilbert curve instead of Morton: the custom
    // codegen expression (functions.HilbertIndex2 — a per-level state
    // machine no flat bit-shuffle can express) walks the curve inline in
    // whole-stage codegen. 256-cell buckets are EXACT 16x16 subsquares
    // (HilbertSpec), so per-file footer stats are as tight as possible.
    // The oracle replays the identical walk as one CTE per level.
    "q98_hilbert_layout" -> ((s, d) => {
      graft.functions.HilbertIndex2.registerAll(s)
      val h = graft.operators.Hilbert.hValue2(
        col("l_partkey") % 64, col("l_suppkey") % 64, bits = 6)
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 64).as("px"), (col("l_suppkey") % 64).as("sy"), h.as("h"))
        .groupBy(shiftright(col("h"), 8).as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("px")).as("pk_lo"), max(col("px")).as("pk_hi"),
          min(col("sy")).as("sk_lo"), max(col("sy")).as("sk_hi"))
        .orderBy(col("bucket"))
    }),

    // --- mergeable histogram quantiles ----------------------------------------
    // equi-width-histogram p50/p90/p99 per status: the histogram is a
    // plain (status, bin) count aggregate — partial/map-side combinable
    // and MERGEABLE across batches/partitions (the property approx sketch
    // quantiles need), quantile extraction then runs over the tiny
    // histogram. ceil targets in exact integer math ((n*p+99) div 100);
    // floor() before the BIGINT cast on BOTH sides (DuckDB's raw
    // double→int cast ROUNDS where Spark truncates — a known trap).
    "q99_histogram_quantile" -> ((s, d) => {
      val binned = Tables.orders(s, d)
        .select(col("o_orderstatus"),
          floor(col("o_totalprice") / 1000).cast(LongType).as("bin"))
        .groupBy(col("o_orderstatus"), col("bin")).agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy(col("o_orderstatus")).orderBy(col("bin"))
      val wn = Window.partitionBy(col("o_orderstatus"))
      val cum = binned.withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(wn))
      def pBin(p: Int) = min(when(
        col("cum") >= expr(s"(n * $p + 99) div 100"), col("bin"))).as(s"p${p}_bin")
      cum.groupBy(col("o_orderstatus"))
        .agg(max(col("n")).as("n"), pBin(50), pBin(90), pBin(99))
        .orderBy(col("o_orderstatus"))
    }),

    // --- exact distinct via mergeable bitmaps ---------------------------------
    // COUNT(DISTINCT) recomputed as bitmap aggregation (Spark 3.5+
    // bitmap_* functions): per-bucket bitmaps are partial-aggregated
    // map-side and MERGE — the pattern that makes repeated/rolled-up
    // exact distinct counts cheap at 100 TB (store the bitmaps once,
    // answer every rollup by OR-ing them) where COUNT(DISTINCT) re-
    // shuffles raw keys each time. Hash-checked against the plain
    // COUNT(DISTINCT) — exactness is the point.
    "q100_bitmap_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), expr("bitmap_bucket_number(o_custkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").as("bm"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(expr("bitmap_count(bm)")).as("distinct_customers"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- linear regression aggregates -----------------------------------------
    // regr_slope / regr_intercept / regr_r2 semantics recomputed from
    // decimal-exact raw moments (q60's rule: the doubles the two engines
    // combine at the END are bit-identical because every SUM is decimal —
    // the built-in regr_* accumulate doubles in partial-agg order and
    // cannot hash-match). One map-side-combined shuffle; the moment
    // tuple is the classic mergeable regression state.
    "q101_regression" -> ((s, d) => {
      val x = col("l_quantity").cast(DecimalType(9, 2))
      val y = col("l_discount").cast(DecimalType(4, 2))
      val m = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
          sum(x * y).cast(DoubleType).as("sxy"),
          sum(x * x).cast(DoubleType).as("sxx"), sum(y * y).cast(DoubleType).as("syy"))
      val cxy = col("sxy") - col("sx") * col("sy") / col("n")
      val cxx = col("sxx") - col("sx") * col("sx") / col("n")
      val cyy = col("syy") - col("sy") * col("sy") / col("n")
      m.select(col("l_returnflag"), col("n"),
          (cxy / cxx).as("slope"),
          (col("sy") / col("n") - cxy / cxx * (col("sx") / col("n"))).as("intercept"),
          (cxy * cxy / (cxx * cyy)).as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    // --- Jaro-Winkler record linkage ------------------------------------------
    // fuzzy-match scoring via the codegen-native jaro_winkler expression
    // (StaticInvoke — no UDF boxing), checked against DuckDB's
    // implementation of the same Winkler-1990 definition. The pair set
    // here is a bounded self-join; a 100 TB linkage run would block
    // first (d27's prefix join / LSH) and score only candidate pairs
    // with this expression.
    // --- market-basket co-occurrence (association mining) --------------------
    // part pairs co-ordered in the same order with support ≥ 2 orders,
    // scored by confidence and lift. The pair expansion is per-order and
    // quadratic in basket size — bounded here by TPC-H's ≤7-line orders;
    // at 100 TB cap or sample oversized baskets BEFORE the self-join
    // (one pathological 10^6-item basket is 10^12 pairs). Item counts
    // and the scalar total broadcast; the only large shuffles are the
    // order-keyed self-join and the pair aggregation. All scores are
    // single-division integer ratios → bit-identical across engines.
    "q110_market_basket" -> ((s, d) => {
      // cut: the distinct basket-item table backs the basket total, the
      // item counts, and both self-join sides — four replays without it
      val li = graft.operators.Lineage.cut(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
      val totals = li.agg(countDistinct(col("ok")).as("total"))
      val item = li.groupBy("pk").agg(count(lit(1)).as("c"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 2)
      pairs.crossJoin(broadcast(totals))
        .join(broadcast(item.withColumnRenamed("pk", "pa").withColumnRenamed("c", "ca")), "pa")
        .join(broadcast(item.withColumnRenamed("pk", "pb").withColumnRenamed("c", "cb")), "pb")
        .select(col("pa"), col("pb"), col("cab"),
          round(col("cab") * lit(1.0) / col("ca"), 6).as("confidence"),
          round(col("cab") * lit(1.0) * col("total") / (col("ca") * col("cb")), 6).as("lift"))
        .orderBy(desc("lift"), col("pa"), col("pb")).limit(100)
    }),

    // --- blocked record linkage (fuzzy entity matching) ----------------------
    // a deterministically-corrupted twin of the part names (two chars
    // chopped) is linked back to the catalog: equi-join on a cheap
    // blocking key (4-char prefix) + Jaro-Winkler residual + argmax per
    // dirty record. THE scale formulation of fuzzy matching — candidate
    // pairs are |block|², never |catalog|² (q102 is the all-pairs scalar
    // check; this is the join you actually run). Blocking recall is
    // exact here by construction (truncation preserves the prefix);
    // real pipelines OR several blocking keys.
    // BOUNDED AUDIT SLICE (p_partkey <= 20000: the whole part table at
    // every gate SF, a fixed-size prefix at scale — d08/d41's
    // convention, mirrored in the oracle). TPC-H p_name's first word
    // comes from ~92 colors, so 4-char prefix blocks grow LINEARLY with
    // SF and the block self-join grows quadratically: at sf10 this was
    // ~4·10^10 Jaro-Winkler evaluations (caught by the round-12 sf10
    // sweep — the d41 failure class). The slice keeps the exact
    // ground-truth linkage constant-cost at any SF; an unbounded
    // production run needs finer blocking + per-block caps.
    "q111_record_linkage" -> ((s, d) => {
      graft.functions.StringSimilarity.registerAll(s)
      val part = Tables.part(s, d).filter(col("p_partkey") <= 20000)
      val cat = part.select(col("p_partkey").as("cat_key"),
        col("p_name").as("cat_name"), substring(col("p_name"), 1, 4).as("blk"))
      // kernel-input spread (the d06/d07 rule, guide §2.5): the catalog
      // side broadcasts, so every Jaro-Winkler pair evaluation runs
      // INSIDE the probe side's scan tasks — and the audit slice is a
      // bounded ~20k-row scan (ONE split at every SF), which serialized
      // ~4·10⁶ JW calls onto one core (16.9 s of a 17.2 s wall at
      // sf0.1). Round-robin spread of the tiny probe side before the
      // join parallelizes pair scoring; the per-dirty-key argmax window
      // re-shuffles by dirty_key anyway, so results are
      // arrival-order-independent (total (jw, cat_key) order per key).
      val dirty = graft.dedup.Dedup.parallelizeForKernel(part
        .select(col("p_partkey").as("dirty_key"),
          expr("substring(p_name, 1, length(p_name) - 2)").as("dirty_name"))
        .withColumn("blk", substring(col("dirty_name"), 1, 4)))
      val scored = dirty.join(cat, "blk")
        .withColumn("jw", call_function("jaro_winkler", col("dirty_name"), col("cat_name")))
        .filter(col("jw") >= 0.9)
      val w = Window.partitionBy(col("dirty_key")).orderBy(desc("jw"), col("cat_key"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("dirty_key"), col("cat_key"), round(col("jw"), 4).as("jw"))
        .orderBy(col("dirty_key"))
    }),

    // --- KMV distinct sketch (custom TypedImperativeAggregate) ---------------
    // per-source distinct-document estimate through the deterministic
    // k-minimum-values sketch: a REAL partial/merge Catalyst aggregate
    // (bounded 8k-byte state, mergeable across partitions/batches) whose
    // md5-based estimator the oracle reproduces bit-for-bit — the
    // hash-checkable stand-in for approx_count_distinct's engine-private
    // HLL. k=16 < the 25-docs-per-source cardinality, so the ESTIMATION
    // path (not the exact small-set path) is what hashes at sf0.01;
    // sf0.001's sparser sources exercise the exact path too.
    "q116_kmv_distinct" -> ((s, d) => {
      graft.functions.KmvSketch.registerAll(s)
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(round(call_function("kmv_distinct", col("text"), lit(16)), 4).as("est_distinct"),
          countDistinct(col("text")).as("exact_distinct"))
        .orderBy(col("source"))
    }),

    // the two-level ROLLUP: per-source sketches materialize as binary
    // states, then a second aggregation folds the stored states into
    // the global estimate WITHOUT rescanning documents — the daily-
    // summary-table pattern. Bottom-k merge is exact, so the oracle is
    // simply the DIRECT global sketch: rollup ≡ recompute, hash-proven.
    "q118_kmv_rollup" -> ((s, d) => {
      graft.functions.KmvSketch.registerAll(s)
      Tables.documents(s, d).groupBy(col("source"))
        .agg(call_function("kmv_state", col("text"), lit(16)).as("st"))
        .agg(round(call_function("kmv_merge_estimate", col("st"), lit(16)), 4).as("est_distinct"),
          count(lit(1)).as("n_states"))
    }),

    // the sampling twin: k example values per group in ONE pass with
    // bounded state — bottom-k-by-hash as a mergeable aggregate (no
    // global sort, no rand() irreproducibility); emitted in draw order
    "q117_kmv_sample" -> ((s, d) => {
      graft.functions.KmvSketch.registerAll(s)
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(call_function("kmv_sample", col("doc_id").cast("string"), lit(5)).as("sample"))
        .select(col("source"), posexplode(col("sample")))
        .select(col("source"), col("pos"), col("col").as("doc_id"))
        .orderBy(col("source"), col("pos"))
    }),

    // --- multi-source BFS shortest paths -------------------------------------
    // hop distances over each customer's order-succession chain (order →
    // next order by date), seeded at every customer's FIRST order —
    // operators.ShortestPaths' frontier-based bounded BFS. The oracle is
    // an INDEPENDENT formulation: on a successor chain the hop distance
    // IS the chain position, so row_number()-1 capped at the round bound
    // must equal 5 rounds of frontier propagation — two algorithms, one
    // truth (stronger than replaying the same rounds).
    "q119_bfs_distances" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val chain = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
        .withColumn("rn", row_number().over(w))
      val edges = chain.filter(col("nxt").isNotNull)
        .select(col("o_orderkey").as("src"), col("nxt").as("dst"))
      val sources = chain.filter(col("rn") === 1)
        .select(col("o_orderkey").as("node"))
      graft.operators.ShortestPaths.bfsDistances(edges, sources, rounds = 5)
        .select(col("node").as("o_orderkey"), col("dist"))
        .orderBy(col("o_orderkey"))
    }),

    // --- weighted shortest paths (min-plus Bellman-Ford) ---------------------
    // minimum elapsed-days paths over each customer's order graph:
    // successor edges weighted by the day gap PLUS skip-one edges at
    // half the two-hop gap (integer-division discount) — so the minimum
    // genuinely chooses between routes. operators.ShortestPaths'
    // delta-based bounded relaxation; the oracle replays the identical
    // min-plus rounds as unrolled CTEs (integer weights → bit-identical
    // distances in any engine). Completes the graph family's weighted
    // half next to q119's unit-weight BFS.
    "q127_weighted_paths" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val chain = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
        .withColumn("nd", lead(col("o_orderdate"), 1).over(w))
        .withColumn("nxt2", lead(col("o_orderkey"), 2).over(w))
        .withColumn("nd2", lead(col("o_orderdate"), 2).over(w))
        .withColumn("rn", row_number().over(w))
      val hop = chain.filter(col("nxt").isNotNull)
        .select(col("o_orderkey").as("src"), col("nxt").as("dst"),
          datediff(col("nd"), col("o_orderdate")).as("w"))
      val skip = chain.filter(col("nxt2").isNotNull)
        .select(col("o_orderkey").as("src"), col("nxt2").as("dst"),
          expr("datediff(nd2, o_orderdate) div 2").as("w"))
      val sources = chain.filter(col("rn") === 1)
        .select(col("o_orderkey").as("node"))
      graft.operators.ShortestPaths
        .weightedDistances(hop.union(skip), sources, rounds = 4)
        .select(col("node").as("o_orderkey"), col("dist"))
        .orderBy(col("o_orderkey"))
    }),

    // --- KMV set algebra -----------------------------------------------------
    // pairwise source-overlap estimates from STORED sketch states (the
    // Beyer et al. pair estimator): matches within the merged bottom-k,
    // union estimate from its kth minimum, Jaccard/intersection derived —
    // the audience-overlap probe that runs on a summary table without
    // rescanning or co-shuffling the corpora. The state table is rows =
    // #sources, so the pair join broadcasts; every step is 60-bit integer
    // set arithmetic + IEEE divisions the oracle replays bit-for-bit.
    "q120_kmv_set_ops" -> ((s, d) => {
      graft.functions.KmvSketch.registerAll(s)
      val st = Tables.documents(s, d).groupBy(col("source"))
        .agg(call_function("kmv_state", col("text"), lit(16)).as("st"))
      val a = st.select(col("source").as("source_a"), col("st").as("sta"))
      val b = st.select(col("source").as("source_b"), col("st").as("stb"))
      a.join(broadcast(b), col("source_a") < col("source_b"))
        .withColumn("ps", call_function("kmv_pair_stats", col("sta"), col("stb"), lit(16)))
        .select(col("source_a"), col("source_b"),
          col("ps.matches").as("matches"), col("ps.union_est").as("union_est"),
          col("ps.inter_est").as("inter_est"), col("ps.jaccard_est").as("jaccard_est"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    "q102_jaro_winkler" -> ((s, d) => {
      graft.functions.StringSimilarity.registerAll(s)
      val a = Tables.part(s, d).filter(col("p_partkey") <= 20)
        .select(col("p_partkey").as("k1"), col("p_name").as("n1"))
      val b = Tables.part(s, d).filter(col("p_partkey") <= 20)
        .select(col("p_partkey").as("k2"), col("p_name").as("n2"))
      a.join(broadcast(b), col("k1") < col("k2"))
        .select(col("k1"), col("k2"),
          round(call_function("jaro_winkler", col("n1"), col("n2")), 4).as("jw"),
          round(call_function("jaro_sim", col("n1"), col("n2")), 4).as("jaro"))
        .orderBy(col("k1"), col("k2"))
    }),

    // --- CDC merge (MERGE INTO semantics) -------------------------------------
    // latest-wins change application over a synthetic three-version feed:
    // v1 upserts keys %5, v2 deletes keys %10, v3 re-upserts keys %20 —
    // so superseded updates, tombstones, AND delete-then-reinsert all
    // exercise (operators.CdcMerge). The oracle replays the same feed
    // relationally.
    "q84_cdc_merge" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val v1 = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit(1L).as("version"), lit("U").as("op"),
          lit("X1").as("o_orderstatus"), (col("o_totalprice") + 100).as("o_totalprice"))
      val v2 = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit(2L).as("version"), lit("D").as("op"),
          lit(null).cast(StringType).as("o_orderstatus"),
          lit(null).cast(DoubleType).as("o_totalprice"))
      val v3 = orders.filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), lit(3L).as("version"), lit("U").as("op"),
          lit("X3").as("o_orderstatus"), (col("o_totalprice") + 300).as("o_totalprice"))
      graft.operators.CdcMerge.applyChanges(
        base, v1.unionByName(v2).unionByName(v3), Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // SCD type-2 history build from the SAME change feed as q84: every
    // upsert opens a [valid_from, valid_to) interval closed by the key's
    // next change (tombstones close without opening). One key-partitioned
    // window — O(changes) at any dimension size (operators.Scd2); the
    // hash also pins the q84 ≡ snapshotAt(∞) relationship the spec proves.
    "q93_scd2" -> ((s, d) =>
      graft.operators.Scd2.buildHistory(scd2Feed(s, d), Seq("o_orderkey"))
        .orderBy(col("o_orderkey"), col("valid_from"))),

    // point-in-time (bitemporal) read of the q93 history: the state of
    // every order AS OF version 2 — v1 upserts visible except where the
    // v2 tombstone closed them, v3 not yet. One map-only interval
    // filter over the history (Scd2.snapshotAt) — the time-travel read
    // a lakehouse serves from the SCD2 artifact without replaying the
    // feed. Oracle rebuilds the same intervals with a lead window.
    "q139_scd2_snapshot" -> ((s, d) =>
      graft.operators.Scd2.snapshotAt(
          graft.operators.Scd2.buildHistory(scd2Feed(s, d), Seq("o_orderkey")),
          asOf = 2L)
        .orderBy(col("o_orderkey"))),

    // SCD2 as-of dimension LOOKUP — the lakehouse fact-enrichment
    // pattern q93/q139 build toward: each fact row joins the version of
    // its dimension key that was valid AT ITS OWN as-of time (here
    // asof = l_linenumber % 3 + 1 over the q93 history). The join is
    // EQUI on the key — the interval predicate is a residual filter on
    // the few history rows per key — so at 100 TB this is a plain
    // co-partitioned key join, never a range join across keys. Facts
    // whose as-of falls in a tombstone hole (deleted at v2, no v3)
    // surface with NULL attributes — the honest "key did not exist
    // then" answer, not a silent drop.
    "q149_scd2_lookup" -> ((s, d) =>
      q149Body(Tables.orders(s, d), Tables.lineitem(s, d))),

    // sliced oracle twin of q149 (the dXXs pattern): DuckDB's planner
    // runs the full as-of lookup's interval-residual left join >900 s
    // at sf10; the twin key-prefix-slices BOTH sides of the equi-key
    // (orders AND lineitem under OrderSliceBound), which is exactly the
    // full result restricted to l_orderkey < bound — same shared body,
    // oracle derived from q149's own SQL. Full row keeps its sf10
    // dual-topology bytediff mode.
    "q149s_scd2_lookup_sliced" -> ((s, d) =>
      q149Body(Tables.orders(s, d).filter(col("o_orderkey") < OrderSliceBound),
        Tables.lineitem(s, d).filter(col("l_orderkey") < OrderSliceBound))),

    // skyline (Pareto front) over part: cheapest-for-the-size trade-off
    // curve — map-side local Pareto prune, then an exact dominance
    // anti-join over the broadcast-sized candidates (operators.Skyline);
    // the full table is read once with no shuffle.
    "q95_skyline" -> ((s, d) => q95Body(Tables.part(s, d))),

    // sliced oracle twin of q95 (the PipelineQueries dXXs pattern): the
    // oracle's NOT-EXISTS skyline is quadratic in parts and times out at
    // sf10; this runs the same operator BODY (one shared builder — the
    // Spark-side no-drift guarantee) on p_partkey < PartSliceBound with
    // the oracle derived from q95's own SQL. Full row keeps its sf10
    // bytediff mode; the twin carries oracle semantics there.
    "q95s_skyline_sliced" -> ((s, d) =>
      q95Body(Tables.part(s, d).filter(col("p_partkey") < PartSliceBound))),

    // --- bag-semantics set operations ------------------------------------------
    // INTERSECT ALL / EXCEPT ALL (multiset counts, not distinct sets —
    // q12/q14 cover the DISTINCT forms); summarized per status so the
    // result is small and totally ordered
    "q88_bag_setops" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val a = orders.filter(col("o_orderkey") % 2 === 0).select(col("o_orderstatus"))
      val b = orders.filter(col("o_orderkey") % 3 === 0).select(col("o_orderstatus"))
      val ia = a.intersectAll(b).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = a.exceptAll(b).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.unionByName(ea)
        .select(col("op"), col("o_orderstatus"), col("n"))
        .orderBy(col("op"), col("o_orderstatus"))
    }),

    // --- union by name with missing columns --------------------------------------
    // schema-evolution-friendly append: branches with different column
    // subsets align by NAME, absent columns NULL-fill (Spark
    // allowMissingColumns ≡ DuckDB UNION ALL BY NAME). DuckDB sorts
    // NULLS LAST by default where Spark sorts NULLS FIRST — the oracle
    // pins NULLS FIRST explicitly.
    "q89_union_by_name" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val a = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      a.unionByName(b, allowMissingColumns = true)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"), col("o_orderstatus").asc_nulls_first)
    }),

    // --- data-quality profile (Deequ-style expectations) ----------------------
    // all five orders metrics ride ONE conditional-aggregate pass
    // (operators.DataQuality.profile); referential integrity is the one
    // second-relation check — an aggregated left probe against the
    // DISTINCT parent keys, never a row-multiplying join.
    "q86_dq_checks" -> ((s, d) => {
      import graft.operators.DataQuality._
      val orders = Tables.orders(s, d)
      val prof = profile(orders, Seq(
        Check("orders_rows", count(lit(1))),
        Check("o_custkey_null_frac", nullFraction("o_custkey")),
        Check("o_orderkey_distinct_ratio", distinctRatio("o_orderkey")),
        Check("o_totalprice_min", min(col("o_totalprice"))),
        Check("o_totalprice_max", max(col("o_totalprice")))))
      val orphan = orphanFraction(Tables.lineitem(s, d), "l_orderkey",
        orders, "o_orderkey")
        .select(lit("lineitem_orderkey_orphan_frac").as("metric"),
          col("orphan_frac").as("value"))
      prof.unionByName(orphan).orderBy("metric")
    }),

    // --- GROUP BY ALL / ORDER BY ALL ------------------------------------------
    // the analyst-shorthand resolution rules (every non-aggregate select
    // item becomes a grouping key), supported by both engines
    "q83_group_by_all" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS yr,
              |  count(*) AS cnt,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              |FROM orders
              |GROUP BY ALL
              |ORDER BY ALL""".stripMargin)
    }),

    // --- FILTER clause on aggregates -----------------------------------------
    "q78_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, count(*) AS cnt,
              |  count(*) FILTER (WHERE l_quantity > 25) AS big_cnt,
              |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
              |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev,
              |  max(l_shipdate) FILTER (WHERE l_linestatus = 'F') AS last_f
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // --- statistical aggregates via exact moments --------------------------
    // Built-in corr/stddev accumulate doubles in partition order (non-
    // deterministic cross-engine); computing the moments as exact decimal
    // sums and combining them in double afterwards is order-independent
    // and bit-identical in both engines.
    // Second variable is l_discount (≤ 0.11), not l_extendedprice: every
    // moment's scaled integer then stays far below 2^53 through ~sf100,
    // where decimal→double is a single correctly-rounded step in both
    // engines. (DuckDB converts int128-backed decimals via
    // (double)int128 / 10^scale — TWO roundings once the scaled value
    // exceeds 2^53, which made Σ(price²) differ in the last ulp.)
    "q60_stats_moments" -> ((s, d) => {
      // narrow range-safe casts (quantity <= 50, discount <= 0.10): the
      // x*x / x*y / y*y products stay compact-long decimals (same values)
      val x = col("l_quantity").cast(DecimalType(9, 2))
      val y = col("l_discount").cast(DecimalType(4, 2))
      val m = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
          sum(x * y).cast(DoubleType).as("sxy"),
          sum(x * x).cast(DoubleType).as("sxx"), sum(y * y).cast(DoubleType).as("syy"))
      m.select(col("l_returnflag"), col("n"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("sd_qty"),
          (((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)) /
            (sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)) *
             sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)))).as("corr_qp"))
        .orderBy(col("l_returnflag"))
    }),

    // --- correlated aggregate subquery ------------------------------------
    "q56_correlated_agg" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      // orders worth more than 2× their customer's total/count (decimal-
      // exact comparison: no division, no doubles)
      s.sql("""SELECT o_orderkey, o_custkey FROM orders o
              |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
              |      2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
              |           FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
              |ORDER BY o_orderkey""".stripMargin)
    }))

  /** q95s/q66s sliced-twin oracles, DERIVED from the full queries' own
    * oracle strings (the PipelineQueries dXXs mechanism): q95's skyline
    * NOT-EXISTS is quadratic in parts and times out at sf10's 2M rows;
    * q66's interval join OOMs on 2M intervals × 60M points. The twins
    * pin both sides to constants inside the oracle-proven sf1 scale. */
  lazy val oracle: Map[String, String] = oracleBase ++ Map(
    // q95's oracle references part twice ("FROM part p" / "FROM part q"
    // — both sides of the NOT EXISTS slice, by design)
    "q95s_skyline_sliced" -> TwinSql.subst("q95s_skyline_sliced",
      oracleBase("q95_skyline"),
      "FROM part", s"FROM (SELECT * FROM part WHERE p_partkey < $PartSliceBound)",
      expected = 2),
    "q66s_range_join_sliced" -> TwinSql.subst("q66s_range_join_sliced",
      TwinSql.subst("q66s_range_join_sliced", oracleBase("q66_range_join"),
        "FROM part", s"FROM (SELECT * FROM part WHERE p_partkey < $PartSliceBound)"),
      "FROM lineitem",
      s"FROM (SELECT * FROM lineitem WHERE l_orderkey < $OrderSliceBound)"),
    // graph-SQL family: the co-purchase graph restricted to suppliers
    // below the bound (customers/orders join in unsliced — the graph is
    // what shrinks, identically on both engines)
    "q77s_triangle_count_sliced" -> TwinSql.subst("q77s_triangle_count_sliced",
      oracleBase("q77_triangle_count"),
      "FROM lineitem", s"FROM (SELECT * FROM lineitem WHERE l_suppkey < $SuppSliceBound)"),
    "q75s_graph_pagerank_sliced" -> TwinSql.subst("q75s_graph_pagerank_sliced",
      oracleBase("q75_graph_pagerank"),
      "JOIN lineitem ON",
      s"JOIN (SELECT * FROM lineitem WHERE l_suppkey < $SuppSliceBound) lineitem ON"),
    "q135s_ppr_sliced" -> TwinSql.subst("q135s_ppr_sliced",
      oracleBase("q135_ppr"),
      "JOIN lineitem ON",
      s"JOIN (SELECT * FROM lineitem WHERE l_suppkey < $SuppSliceBound) lineitem ON"),
    // q149's twin slices BOTH sides of the o_orderkey = l_orderkey
    // equi-key — the derived SQL is the full oracle with every orders
    // and lineitem source key-prefix-bounded (3 feed arms + the facts)
    "q149s_scd2_lookup_sliced" -> TwinSql.subst("q149s_scd2_lookup_sliced",
      TwinSql.subst("q149s_scd2_lookup_sliced", oracleBase("q149_scd2_lookup"),
        "FROM orders", s"FROM (SELECT * FROM orders WHERE o_orderkey < $OrderSliceBound)",
        expected = 3),
      "FROM lineitem",
      s"FROM (SELECT * FROM lineitem WHERE l_orderkey < $OrderSliceBound)"))

  /** Constant bounds for the twins: 20k parts / 600k orderkeys / 2k
    * suppliers — the whole corpus at SF ≤ 0.1, a constant fraction
    * beyond. */
  private[queries] val PartSliceBound = 20000L
  private[queries] val OrderSliceBound = 600000L
  private[queries] val SuppSliceBound = 2000L

  // ---- shared bodies for each full query + its qXXs sliced twin (the
  // Spark-side no-drift guarantee matching the derived oracle) --------

  private def q95Body(parts: DataFrame): DataFrame =
    graft.operators.Skyline.skyline(
      parts.select(col("p_partkey"), col("p_retailprice"), col("p_size")),
      Seq(("p_retailprice", false), ("p_size", true)))
      .orderBy(col("p_partkey"))

  private def q66Body(parts: DataFrame, lineitem: DataFrame): DataFrame = {
    val intervals = parts.select(col("p_partkey"),
      (col("p_retailprice") - 5.0).as("lo"), (col("p_retailprice") + 5.0).as("hi"))
    val points = lineitem.select(col("l_extendedprice").as("price"))
    graft.operators.RangeJoin.pointInInterval(points, intervals,
      "price", "lo", "hi", bucketWidth = 50.0)
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n_in_range"))
      .orderBy(col("p_partkey"))
  }

  private def q77Body(lineitem: DataFrame): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 5)
      .select("a", "b")
    graft.operators.Triangles.perVertexTriangles(edges)
      .select(col("v").as("suppkey"), col("tri_cnt"))
      .orderBy(col("tri_cnt").desc, col("suppkey"))
  }

  private def q75Body(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    graft.operators.PageRank.integerPageRank(edges, iters = 5)
      .filter(col("node").startsWith("s"))
      .orderBy(col("val").desc, col("node").asc)
      .limit(20)
  }

  private val oracleBase: Map[String, String] = Map(
    // the DIRECT full-table aggregate — the incremental fold must equal it
    "q116_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |        count(*) OVER (PARTITION BY source) AS nd
        |      FROM h),
        |e AS (SELECT source, max(CASE WHEN rn = 16 THEN h END) AS h16, max(nd) AS nd
        |      FROM r GROUP BY source),
        |x AS (SELECT source, count(DISTINCT text) AS exact_distinct FROM documents GROUP BY source)
        |SELECT e.source,
        |  round(CASE WHEN e.nd < 16 THEN CAST(e.nd AS DOUBLE)
        |             ELSE 15 * CAST(1152921504606846976 AS DOUBLE) / e.h16 END, 4) AS est_distinct,
        |  x.exact_distinct
        |FROM e JOIN x ON e.source = x.source
        |ORDER BY e.source""".stripMargin,

    "q118_kmv_rollup" ->
      """WITH h AS (SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents),
        |r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn, count(*) OVER () AS nd FROM h),
        |e AS (SELECT max(CASE WHEN rn = 16 THEN h END) AS h16, max(nd) AS nd FROM r)
        |SELECT round(CASE WHEN nd < 16 THEN CAST(nd AS DOUBLE)
        |             ELSE 15 * CAST(1152921504606846976 AS DOUBLE) / h16 END, 4) AS est_distinct,
        |  (SELECT count(DISTINCT source) FROM documents) AS n_states
        |FROM e""".stripMargin,

    "q117_kmv_sample" ->
      """WITH r AS (SELECT source, CAST(doc_id AS VARCHAR) AS v,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS rn
        |      FROM documents)
        |SELECT source, CAST(rn - 1 AS INT) AS pos, v AS doc_id
        |FROM r WHERE rn <= 5 ORDER BY source, pos""".stripMargin,

    // the same pair estimator replayed from raw hashes: per-source
    // bottom-16, merged bottom-16 (set union), match count, kth-minimum
    // union estimate, derived intersection/Jaccard — every division
    // mirrored term-for-term
    "q120_kmv_set_ops" ->
      """WITH h AS (SELECT DISTINCT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents),
        |bk AS (SELECT source, h FROM (
        |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h) t
        |  WHERE rn <= 16),
        |src AS (SELECT DISTINCT source FROM documents),
        |pr AS (SELECT x.source AS sa, y.source AS sb FROM src x JOIN src y ON x.source < y.source),
        |uni AS (SELECT DISTINCT pr.sa, pr.sb, bk.h
        |        FROM pr JOIN bk ON bk.source = pr.sa OR bk.source = pr.sb),
        |lk AS (SELECT sa, sb, h FROM (
        |    SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn FROM uni) t
        |  WHERE rn <= 16),
        |st AS (SELECT sa, sb, count(*) AS lsize, max(h) AS kth FROM lk GROUP BY sa, sb),
        |m AS (SELECT lk.sa, lk.sb, count(*) AS matches
        |      FROM lk JOIN bk ba ON ba.source = lk.sa AND ba.h = lk.h
        |              JOIN bk bb ON bb.source = lk.sb AND bb.h = lk.h
        |      GROUP BY lk.sa, lk.sb)
        |SELECT st.sa AS source_a, st.sb AS source_b,
        |  CAST(coalesce(m.matches, 0) AS BIGINT) AS matches,
        |  CASE WHEN st.lsize < 16 THEN CAST(st.lsize AS DOUBLE)
        |       ELSE 15 * CAST(1152921504606846976 AS DOUBLE) / st.kth END AS union_est,
        |  CAST(coalesce(m.matches, 0) AS DOUBLE) *
        |    (CASE WHEN st.lsize < 16 THEN CAST(st.lsize AS DOUBLE)
        |          ELSE 15 * CAST(1152921504606846976 AS DOUBLE) / st.kth END) / st.lsize AS inter_est,
        |  CAST(coalesce(m.matches, 0) AS DOUBLE) / st.lsize AS jaccard_est
        |FROM st LEFT JOIN m ON st.sa = m.sa AND st.sb = m.sb
        |ORDER BY source_a, source_b""".stripMargin,

    // the identical min-plus rounds, unrolled: r_{i+1}(v) =
    // min(r_i(v), min over edges (r_i(u) + w)) — integer-exact
    "q127_weighted_paths" -> {
      def round(prev: String, cur: String): String =
        s"""$cur AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM $prev
           |    UNION ALL
           |    SELECT e.dst AS node, $prev.dist + e.w AS dist
           |    FROM $prev JOIN e ON $prev.node = e.src) GROUP BY node)""".stripMargin
      s"""WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
         |    lead(o_orderkey) OVER w AS nxt, lead(o_orderdate) OVER w AS nd,
         |    lead(o_orderkey, 2) OVER w AS nxt2, lead(o_orderdate, 2) OVER w AS nd2,
         |    row_number() OVER w AS rn
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         |e AS (SELECT o_orderkey AS src, nxt AS dst,
         |        CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(nd AS DATE)) AS BIGINT) AS w
         |      FROM c WHERE nxt IS NOT NULL
         |      UNION ALL
         |      SELECT o_orderkey, nxt2,
         |        CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(nd2 AS DATE)) // 2 AS BIGINT)
         |      FROM c WHERE nxt2 IS NOT NULL),
         |r0 AS (SELECT o_orderkey AS node, CAST(0 AS BIGINT) AS dist FROM c WHERE rn = 1),
         |${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")},
         |${round("r3", "r4")}
         |SELECT node AS o_orderkey, dist FROM r4 ORDER BY o_orderkey""".stripMargin
    },

    // independent formulation: on a successor chain, BFS hop distance
    // from the chain head IS the (0-based) chain position
    "q119_bfs_distances" ->
      """WITH pos AS (SELECT o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) - 1 AS dist
        |  FROM orders)
        |SELECT o_orderkey, CAST(dist AS BIGINT) AS dist
        |FROM pos WHERE dist <= 5 ORDER BY o_orderkey""".stripMargin,

    "q110_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS total FROM li),
        |item AS (SELECT pk, count(*) AS c FROM li GROUP BY pk),
        |pair AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS cab
        |         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |         GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, cab,
        |  round(cab * 1.0 / ia.c, 6) AS confidence,
        |  round(cab * 1.0 * n.total / (ia.c * ib.c), 6) AS lift
        |FROM pair, n
        |JOIN item ia ON pa = ia.pk
        |JOIN item ib ON pb = ib.pk
        |ORDER BY lift DESC, pa, pb LIMIT 100""".stripMargin,

    "q111_record_linkage" ->
      """WITH p0 AS (SELECT * FROM part WHERE p_partkey <= 20000),
        |cat AS (SELECT p_partkey AS cat_key, p_name AS cat_name,
        |               substr(p_name, 1, 4) AS blk FROM p0),
        |dirty AS (SELECT p_partkey AS dirty_key,
        |            substr(p_name, 1, length(p_name) - 2) AS dirty_name,
        |            substr(p_name, 1, 4) AS blk FROM p0),
        |scored AS (SELECT dirty_key, cat_key,
        |             jaro_winkler_similarity(dirty_name, cat_name) AS jw
        |           FROM dirty JOIN cat USING (blk)
        |           WHERE jaro_winkler_similarity(dirty_name, cat_name) >= 0.9),
        |best AS (SELECT dirty_key, cat_key, jw,
        |           row_number() OVER (PARTITION BY dirty_key ORDER BY jw DESC, cat_key) AS rn
        |         FROM scored)
        |SELECT dirty_key, cat_key, round(jw, 4) AS jw FROM best WHERE rn = 1
        |ORDER BY dirty_key""".stripMargin,

    "q92_incremental_agg" ->
      """WITH a AS (SELECT o_custkey, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_v,
        |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v
        |FROM orders GROUP BY 1)
        |SELECT o_custkey, cnt, CAST(sum_v AS DOUBLE) AS sum_v, min_v, max_v,
        |  CAST(sum_v AS DOUBLE) / cnt AS avg_v
        |FROM a ORDER BY o_custkey""".stripMargin,

    "q68_higher_order" ->
      """SELECT p_partkey,
        | len(list_filter(string_split(p_name, ' '), w -> length(w) > 6)) > 0 AS has_long,
        | len(list_filter(string_split(p_name, ' '), w -> NOT length(w) >= 3)) = 0 AS all_ge3,
        | CAST(len(list_filter(string_split(p_name, ' '), w -> starts_with(w, 's'))) AS BIGINT) AS n_s,
        | CAST(list_sum(list_transform(string_split(p_name, ' '), w -> length(w))) AS BIGINT) AS total_len,
        | array_to_string(list_transform(string_split(p_name, ' '), w -> upper(w[1:1])), '') AS initials
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "q69_try_arith" ->
      """SELECT o_orderkey,
        | round(CAST(o_totalprice AS DOUBLE) / nullif(CAST(o_orderkey % 7 AS DOUBLE), 0), 4) AS div7,
        | TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS ok_cast,
        | TRY_CAST(o_orderstatus AS BIGINT) AS bad_cast
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,

    "q70_grouping_marks" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        | count(*) AS cnt
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST, g_status, g_prio""".stripMargin,

    "q71_ntile" ->
      """WITH b AS (SELECT o_orderpriority, o_totalprice,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS bucket
        | FROM orders)
        |SELECT o_orderpriority, bucket, count(*) AS cnt,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM b GROUP BY o_orderpriority, bucket
        |ORDER BY o_orderpriority, bucket""".stripMargin,

    "q75_graph_pagerank" -> pagerankOracle(5),

    "q135_ppr" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""r$i AS (SELECT m.node, m.is_seed * 150000 + (85 * coalesce(x.s, 0)) // 100 AS val
           |  FROM marked m LEFT JOIN (
           |    SELECT e.dst AS node, sum(r.val // d.deg) AS s
           |    FROM r${i - 1} r JOIN deg d ON r.node = d.node
           |    JOIN edges e ON e.src = r.node GROUP BY e.dst) x ON m.node = x.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |seeds AS (SELECT DISTINCT 'c' || c_custkey AS node FROM customer WHERE c_custkey < 10),
         |marked AS (SELECT n.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
         |           FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
         |r0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS val FROM marked),
         |$iterCtes
         |SELECT node, CAST(val AS BIGINT) AS val FROM r5
         |WHERE node LIKE 's%' AND val > 0
         |ORDER BY val DESC, node LIMIT 20""".stripMargin
    },

    "q76_recursive_tree" ->
      """WITH RECURSIVE ids AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_orderkey <= 20000
        |),
        |tree(id, depth, path_sum) AS (
        |  SELECT id, 0 AS depth, price FROM ids WHERE id = 1
        |  UNION ALL
        |  SELECT c.id, t.depth + 1,
        |         CAST(t.path_sum + c.price AS DECIMAL(18,2))
        |  FROM ids c JOIN tree t ON c.id // 2 = t.id
        |  WHERE c.id > 1
        |)
        |SELECT depth, count(*) AS cnt,
        |       CAST(sum(path_sum) AS DOUBLE) AS total,
        |       CAST(max(path_sum) AS DOUBLE) AS max_path
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin,

    "q77_triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
        |p AS (SELECT x.sk AS a, y.sk AS b FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
        |e AS (SELECT a, b FROM p GROUP BY a, b HAVING count(*) >= 5),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |verts AS (SELECT u AS vx FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
        |SELECT vx AS suppkey, count(*) AS tri_cnt FROM verts
        |GROUP BY vx ORDER BY tri_cnt DESC, suppkey""".stripMargin,

    "q79_zorder_layout" -> {
      val z = graft.operators.ZOrder.zValue2Sql("(l_partkey % 256)", "(l_suppkey % 256)", bits = 8)
      s"""SELECT ($z >> 10) AS bucket, count(*) AS cnt,
         |  min(l_partkey % 256) AS pk_lo, max(l_partkey % 256) AS pk_hi,
         |  min(l_suppkey % 256) AS sk_lo, max(l_suppkey % 256) AS sk_hi
         |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "q148_zonemap_skip" -> {
      val z = graft.operators.ZOrder.zValue2Sql("(l_partkey % 256)", "(l_suppkey % 256)", bits = 8)
      s"""WITH rows_ AS (SELECT (l_partkey % 256) AS px, ($z >> 10) AS zfile,
         |               (l_orderkey % 64) AS hfile FROM lineitem),
         |zm AS (SELECT 'zorder' AS layout, zfile AS file, min(px) AS lo, max(px) AS hi
         |       FROM rows_ GROUP BY zfile
         |       UNION ALL
         |       SELECT 'scatter', hfile, min(px), max(px) FROM rows_ GROUP BY hfile),
         |preds(p_lo, p_hi) AS (VALUES (0, 31), (64, 95), (128, 159), (192, 223))
         |SELECT zm.layout, preds.p_lo, preds.p_hi, count(*) AS n_files,
         |  CAST(sum(CASE WHEN zm.hi < preds.p_lo OR zm.lo > preds.p_hi
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
         |  count(*) - CAST(sum(CASE WHEN zm.hi < preds.p_lo OR zm.lo > preds.p_hi
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned
         |FROM zm CROSS JOIN preds
         |GROUP BY zm.layout, preds.p_lo, preds.p_hi
         |ORDER BY zm.layout, preds.p_lo""".stripMargin
    },

    "q85_zorder3d" -> {
      val z = graft.operators.ZOrder.zValueNSql(
        Seq("(l_partkey % 64)", "(l_suppkey % 64)", "(l_orderkey % 64)"), bits = 6)
      s"""SELECT ($z >> 12) AS bucket, count(*) AS cnt,
         |  min(l_partkey % 64) AS pk_lo, max(l_partkey % 64) AS pk_hi,
         |  min(l_suppkey % 64) AS sk_lo, max(l_suppkey % 64) AS sk_hi,
         |  min(l_orderkey % 64) AS ok_lo, max(l_orderkey % 64) AS ok_hi
         |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "q98_hilbert_layout" -> {
      val ctes = graft.operators.Hilbert.hilbertCtes(
        "base", "px", "sy", bits = 6, carry = Seq("px", "sy"))
      s"""WITH base AS (SELECT (l_partkey % 64) AS px, (l_suppkey % 64) AS sy FROM lineitem),
         |$ctes
         |SELECT (hd >> 8) AS bucket, count(*) AS cnt,
         |  min(px) AS pk_lo, max(px) AS pk_hi,
         |  min(sy) AS sk_lo, max(sy) AS sk_hi
         |FROM h6 GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "q99_histogram_quantile" ->
      """WITH b AS (SELECT o_orderstatus, CAST(floor(o_totalprice / 1000) AS BIGINT) AS bin
        |           FROM orders),
        |h AS (SELECT o_orderstatus, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT o_orderstatus, bin,
        |        sum(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bin) AS cum,
        |        sum(cnt) OVER (PARTITION BY o_orderstatus) AS n
        |      FROM h)
        |SELECT o_orderstatus, CAST(max(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bin END) AS p50_bin,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bin END) AS p90_bin,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bin END) AS p99_bin
        |FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q100_bitmap_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS distinct_customers
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    // identical double combination order as the Spark side (every SUM is
    // decimal-exact; the final arithmetic mirrors term-for-term)
    "q101_regression" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
        |  sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n) AS intercept,
        |  (sxy - sx * sy / n) * (sxy - sx * sy / n) /
        |    ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q102_jaro_winkler" ->
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw,
        |  round(jaro_similarity(a.p_name, b.p_name), 4) AS jaro
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey <= 20 AND b.p_partkey <= 20
        |ORDER BY k1, k2""".stripMargin,

    "q84_cdc_merge" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |ch AS (
        |  SELECT o_orderkey, 1 AS version, 'U' AS op, 'X1' AS o_orderstatus,
        |         o_totalprice + 100 AS o_totalprice FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'U', 'X3', o_totalprice + 300 FROM orders WHERE o_orderkey % 20 = 0),
        |latest AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |           FROM ch),
        |l1 AS (SELECT o_orderkey, op, o_orderstatus, o_totalprice FROM latest WHERE rn = 1),
        |merged AS (
        |  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM l1)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM l1 WHERE op <> 'D')
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM merged ORDER BY o_orderkey""".stripMargin,

    "q93_scd2" ->
      """WITH ch AS (
        |  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, 'U' AS op, 'X1' AS o_orderstatus,
        |         o_totalprice + 100 AS o_totalprice FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(2 AS BIGINT), 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(3 AS BIGINT), 'U', 'X3', o_totalprice + 300 FROM orders WHERE o_orderkey % 20 = 0),
        |h AS (SELECT *, lead(version) OVER (PARTITION BY o_orderkey ORDER BY version) AS valid_to
        |      FROM ch)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, version AS valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM h WHERE op <> 'D'
        |ORDER BY o_orderkey, valid_from""".stripMargin,

    "q139_scd2_snapshot" ->
      """WITH ch AS (
        |  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, 'U' AS op, 'X1' AS o_orderstatus,
        |         o_totalprice + 100 AS o_totalprice FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(2 AS BIGINT), 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(3 AS BIGINT), 'U', 'X3', o_totalprice + 300 FROM orders WHERE o_orderkey % 20 = 0),
        |h AS (SELECT *, lead(version) OVER (PARTITION BY o_orderkey ORDER BY version) AS valid_to
        |      FROM ch)
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM h WHERE op <> 'D' AND version <= 2 AND (valid_to IS NULL OR valid_to > 2)
        |ORDER BY o_orderkey""".stripMargin,

    "q149_scd2_lookup" ->
      """WITH ch AS (
        |  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, 'U' AS op, 'X1' AS o_orderstatus,
        |         o_totalprice + 100 AS o_totalprice FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(2 AS BIGINT), 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(3 AS BIGINT), 'U', 'X3', o_totalprice + 300 FROM orders WHERE o_orderkey % 20 = 0),
        |h AS (SELECT *, lead(version) OVER (PARTITION BY o_orderkey ORDER BY version) AS valid_to
        |      FROM ch),
        |hist AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
        |                version AS valid_from, valid_to
        |         FROM h WHERE op <> 'D'),
        |facts AS (SELECT l_orderkey, l_linenumber,
        |            CAST(l_linenumber % 3 + 1 AS BIGINT) AS asof
        |          FROM lineitem WHERE l_orderkey % 5 = 0)
        |SELECT f.l_orderkey, f.l_linenumber, f.asof,
        |       hist.o_orderstatus, hist.o_totalprice
        |FROM facts f LEFT JOIN hist
        |  ON f.l_orderkey = hist.o_orderkey
        | AND hist.valid_from <= f.asof
        | AND (hist.valid_to IS NULL OR f.asof < hist.valid_to)
        |ORDER BY f.l_orderkey, f.l_linenumber""".stripMargin,

    "q95_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p.p_partkey""".stripMargin,

    "q88_bag_setops" ->
      """WITH a AS (SELECT o_orderstatus FROM orders WHERE o_orderkey % 2 = 0),
        |b AS (SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |ia AS (SELECT o_orderstatus FROM a INTERSECT ALL SELECT o_orderstatus FROM b),
        |ea AS (SELECT o_orderstatus FROM a EXCEPT ALL SELECT o_orderstatus FROM b),
        |u AS (
        |  SELECT 'intersect_all' AS op, o_orderstatus, count(*) AS n FROM ia GROUP BY 2
        |  UNION ALL
        |  SELECT 'except_all', o_orderstatus, count(*) FROM ea GROUP BY 2)
        |SELECT op, o_orderstatus, n FROM u ORDER BY op, o_orderstatus""".stripMargin,

    "q89_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM u
        |ORDER BY o_orderkey, o_orderstatus NULLS FIRST""".stripMargin,

    "q86_dq_checks" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS orders_rows,
        |    round(avg(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 4) AS o_custkey_null_frac,
        |    round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 4) AS o_orderkey_distinct_ratio,
        |    CAST(min(o_totalprice) AS DOUBLE) AS o_totalprice_min,
        |    CAST(max(o_totalprice) AS DOUBLE) AS o_totalprice_max
        |  FROM orders),
        |orph AS (
        |  SELECT round(avg(CASE WHEN o.o_orderkey IS NULL THEN 1.0 ELSE 0.0 END), 4) AS v
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey),
        |u AS (
        |  SELECT 'orders_rows' AS metric, orders_rows AS value FROM m
        |  UNION ALL SELECT 'o_custkey_null_frac', o_custkey_null_frac FROM m
        |  UNION ALL SELECT 'o_orderkey_distinct_ratio', o_orderkey_distinct_ratio FROM m
        |  UNION ALL SELECT 'o_totalprice_min', o_totalprice_min FROM m
        |  UNION ALL SELECT 'o_totalprice_max', o_totalprice_max FROM m
        |  UNION ALL SELECT 'lineitem_orderkey_orphan_frac', v FROM orph)
        |SELECT metric, value FROM u ORDER BY metric""".stripMargin,

    "q83_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS yr,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,

    "q78_filtered_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  count(*) FILTER (WHERE l_quantity > 25) AS big_cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev,
        |  max(l_shipdate) FILTER (WHERE l_linestatus = 'F') AS last_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q74_cms_heavy_hitters" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS exact_cnt FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey, exact_cnt, TRUE AS est_ok
        |FROM c ORDER BY exact_cnt DESC, l_suppkey LIMIT 10""".stripMargin,

    "q72_array_set_ops" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part WHERE p_partkey < 400),
        |r AS (SELECT ['small','red','blue','ring','bolt'] AS ref)
        |SELECT p_partkey,
        |  coalesce(array_to_string(list_sort(list_intersect(words, ref)), ','), '') AS inter,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(words, ref))), ','), '') AS uni,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(words), x -> NOT list_contains(ref, x))), ','), '') AS exc,
        |  list_contains(words, 'red') AS has_red
        |FROM w CROSS JOIN r ORDER BY p_partkey""".stripMargin,

    "q73_regexp_extract_all" ->
      """SELECT p_partkey,
        | array_to_string(regexp_extract_all(p_name || '-' || lower(p_type), '[a-z]+'), ',') AS letter_runs,
        | regexp_extract_all(p_brand, '\d+')[1] AS brand_num,
        | CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels
        |FROM part WHERE p_partkey < 400 ORDER BY p_partkey""".stripMargin,

    "q47_json_funcs" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 5 AS k_mod,
        | count(*) AS cnt,
        | max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        | min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin,

    "q48_string_funcs2" ->
      """SELECT p_partkey, lpad(p_brand, 12, '.') AS lp, rpad(p_brand, 12, '.') AS rp,
        | translate(p_name, 'aeiou', 'AEIOU') AS tr, reverse(p_name) AS rev,
        | strpos(p_name, 'o') AS pos_o, left(p_name, 4) AS l4, right(p_name, 4) AS r4,
        | repeat(p_brand, 2) AS rep2
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "q49_edit_distance" ->
      """SELECT p_partkey, levenshtein(p_name, 'promo burnished copper') AS lev,
        | levenshtein(p_brand, p_type) AS lev_bt
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,

    "q50_argmax_median" ->
      // arg_max with a struct tiebreaker isn't available in DuckDB, so the
      // oracle spells out max_by(name, struct(price, key)) semantics with
      // row_number windows (price DESC,key DESC / price ASC,key ASC)
      """WITH r AS (SELECT p_brand, p_name,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey DESC) AS rx,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS rn
        |  FROM part),
        |g AS (SELECT p_brand, quantile_cont(p_retailprice, 0.5) AS median_price, count(*) AS cnt
        |      FROM part GROUP BY p_brand)
        |SELECT g.p_brand, mx.p_name AS priciest, mn.p_name AS cheapest, g.median_price, g.cnt
        |FROM g
        |JOIN (SELECT p_brand, p_name FROM r WHERE rx = 1) mx USING (p_brand)
        |JOIN (SELECT p_brand, p_name FROM r WHERE rn = 1) mn USING (p_brand)
        |ORDER BY p_brand""".stripMargin,

    "q51_string_agg" ->
      """SELECT c_mktsegment,
        | string_agg(c_name, ',' ORDER BY c_name) AS names, count(*) AS cnt
        |FROM customer WHERE c_acctbal > 9900
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q52_bool_bit_aggs" ->
      """SELECT l_returnflag,
        | bool_or(l_quantity > 49) AS any_big,
        | bool_and(l_quantity > 0) AS all_pos,
        | CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
        | CAST(bit_or(l_linenumber) AS BIGINT) AS b_or,
        | CAST(bit_and(l_linenumber) AS BIGINT) AS b_and,
        | CAST(bit_xor(l_linenumber) AS BIGINT) AS b_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q53_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |    count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |    count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |  FROM orders GROUP BY 1)
        |SELECT yr, status, CAST(cnt AS BIGINT) AS cnt
        |FROM wide UNPIVOT (cnt FOR status IN ("F", "O", "P"))
        |ORDER BY yr, status""".stripMargin,

    "q54_first_last_window" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_key,
        | last_value(o_orderkey) OVER w AS last_key,
        | nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q61_percent_rank" ->
      """SELECT c_custkey, c_mktsegment,
        | percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM customer WHERE c_custkey < 500
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q67_sampled_distinct" ->
      """SELECT count(DISTINCT l_orderkey) * 256 AS est_distinct, count(*) AS n_sampled
        |FROM lineitem WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) = '00'""".stripMargin,

    "q66_range_join" ->
      """WITH p AS (SELECT p_partkey, p_retailprice - 5.0 AS lo, p_retailprice + 5.0 AS hi FROM part),
        |l AS (SELECT l_extendedprice AS price FROM lineitem)
        |SELECT p_partkey, count(*) AS n_in_range
        |FROM p JOIN l ON l.price >= p.lo AND l.price <= p.hi
        |GROUP BY 1 ORDER BY p_partkey""".stripMargin,

    "q63_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey < 100
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q62_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS mode_n
        |           FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY mode_n DESC, o_orderpriority) AS rn FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_val, mode_n
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "q55_full_outer" ->
      """WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
        |big AS (SELECT o_custkey, count(*) AS n_big FROM orders
        |        WHERE o_totalprice > 400000 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        | CASE WHEN c_custkey IS NULL THEN 'order_only'
        |      WHEN o_custkey IS NULL THEN 'cust_only'
        |      ELSE 'both' END AS side,
        | CAST(coalesce(n_big, 0) AS BIGINT) AS n_big
        |FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q57_date_parts" ->
      """SELECT o_orderkey,
        | CAST(dayofweek(o_orderdate) AS INT) AS dw,
        | CAST(dayofyear(o_orderdate) AS INT) AS dy,
        | CAST(weekofyear(o_orderdate) AS INT) AS wk,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
        | CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS mend
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "q58_interval_arith" ->
      """SELECT o_orderkey,
        | CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m,
        | CAST(CAST(o_orderdate AS DATE) + 45 AS TIMESTAMP) AS plus45d,
        | CAST(CAST(o_orderdate AS DATE) - 7 AS TIMESTAMP) AS minus7d
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "q59_map_funcs" ->
      """SELECT p_partkey,
        | map(['brand','type'], [p_brand, p_type])['brand'][1] AS mb,
        | CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS INT) AS msize,
        | array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS mkeys
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "q60_stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
        |  ((sxy - sx * sy / n) / (n - 1)) /
        |    (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))) AS corr_qp
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q56_correlated_agg" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
        |      2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |           FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
}
