package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator coverage (SURVEY.md §2B: projection/filter,
  * joins of every flavor, aggregation, sort/limit, set ops, subqueries,
  * CTEs, having, case, string/date functions).
  *
  * Each query is written with the DataFrame API (declarative — Catalyst
  * does pushdown/pruning/join-selection), and has a DuckDB oracle in
  * [[Relational.oracle]] producing identical column names, types, and
  * row order. Computed doubles are rounded (sums to 2dp) so partial-agg
  * float association differences between engines can't flip the hash.
  *
  * Scale notes (100 TB): every query here is shuffle-minimal — group-bys
  * are partial-aggregated map-side by Catalyst; dimension joins
  * (nation/region/supplier/customer) are broadcast; fact-fact joins
  * (orders⋈lineitem) hash-shuffle on the join key, which is the
  * unavoidable co-location; top-k is TakeOrderedAndProject (no global
  * sort).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: hash agg w/ map-side partial agg.
    "q01_agg_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Filter + projection: predicates/columns push into the parquet scan.
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") >= 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // TPC-H Q3-style: 3-way join + agg + top-k (TakeOrderedAndProject).
    "q03_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Left outer join + agg over the nullable side.
    "q04_join_left" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(
          count(l("l_linenumber")).as("n_lines"),
          round(coalesce(sum("l_quantity"), lit(0.0)), 2).as("sum_qty"))
        .orderBy("o_orderkey")
    }),

    // Left semi join (EXISTS).
    "q05_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Left anti join (NOT EXISTS).
    "q06_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Full outer join of two aggregates.
    "q07_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("cnt_c"))
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("cnt_s"))
      c.join(sup, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("cnt_c"), lit(0L)).as("cnt_c"),
          coalesce(col("cnt_s"), lit(0L)).as("cnt_s"))
        .orderBy("nk")
    }),

    // TPC-H Q5-style 6-way join; dims broadcast, facts shuffle on keys.
    "q08_join_multiway" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // Global sort + limit → TakeOrderedAndProject (no full sort at scale).
    "q09_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
    }),

    // DISTINCT (hash aggregate on the projection).
    "q10_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // GROUP BY + HAVING.
    "q11_having" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("tot_bal"))
        .filter(col("n_cust") > 3)
        .orderBy("c_nationkey")
    }),

    // Conditional aggregation (CASE WHEN inside agg).
    "q12_case_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          round(sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(lit(0.0))), 2).as("qty_returned"),
          round(sum(when(col("l_returnflag") =!= "R", col("l_quantity")).otherwise(lit(0.0))), 2).as("qty_kept"),
          count(when(col("l_discount") > 0.05, lit(1))).as("n_discounted"))
        .orderBy("l_linestatus")
    }),

    // UNION ALL of two typed projections.
    "q13_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"), lit("customer").as("src"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("k"), lit("supplier").as("src"))
      c.unionAll(sup).orderBy("src", "k")
    }),

    // INTERSECT (distinct semantics).
    "q14_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(sup).orderBy("nk")
    }),

    // EXCEPT (distinct semantics).
    "q15_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.except(sup).orderBy("nk")
    }),

    // String functions: LIKE, substr, length, concat, regexp_extract.
    "q16_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        when(col("p_name").like("%widget%"), lit(1)).otherwise(lit(0)).as("is_widget"))
        .orderBy("p_partkey")
    }),

    // Date functions: year/month breakdown + truncation.
    "q17_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("tot"))
        .orderBy("y", "m")
    }),

    // IN (uncorrelated subquery) → Catalyst rewrites to semi join.
    "q18_in_subquery" -> ((s, dir) => {
      val keys = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
      val o = t(s, dir, "orders")
      o.join(broadcast(keys), o("o_custkey") === keys("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("tot"))
    }),

    // Scalar subquery: orders above the global average price.
    "q19_scalar_subquery" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val avgPrice = o.agg(avg("o_totalprice").as("ap"))
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("ap"))
        .agg(count(lit(1)).as("n_above"),
          round(min("o_totalprice"), 2).as("min_above"))
    }),

    // CTE shape (TPC-H Q13-style distribution).
    "q20_cte_distribution" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val counts = c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(o("o_orderkey")).as("c_count"))
      counts.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ROLLUP (group cols coalesced to 'ALL' for engine-neutral ordering).
    "q21_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    }),

    // CUBE.
    "q22_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"))
        .orderBy("st", "pri")
    }),

    // GROUPING SETS (Spark SQL surface).
    "q23_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY rf, ls""")
    }),

    // Aggregate FILTER clause + array_agg (SURVEY §2B aggregation row):
    // shared SQL text runs verbatim on both engines (list_sort is the
    // dialect shim on the Spark side, native on DuckDB).
    "q37_filter_agg" -> ((s, dir) => {
      graft.functions.DialectShims.register(s)
      Tables.registerAll(s, dir)
      s.sql(filterAggSql)
    }),

    // Correlated EXISTS / NOT EXISTS (Catalyst ExistenceJoin → semi +
    // anti joins): shared ANSI text runs verbatim on both engines.
    "q41_exists_correlated" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(existsSql)
    }),

    // Exact grouped percentiles (sort-based `percentile`, linear
    // interpolation — same definition as DuckDB quantile_cont). The
    // exact aggregate buffers each group's values, which is the right
    // tool for dashboard-sized groups; at 100 TB swap in
    // `approx_percentile` (t-digest sketch, fixed-size buffers,
    // partial-aggregable) — PercentileSpec pins the two to within
    // sketch tolerance so the swap is a one-word change.
    "q39_percentiles" -> ((s, dir) => {
      // One percentile aggregate computes all four cut points in a
      // single pass; flattened to scalar columns (the oracle differ
      // hashes rows, so array-valued cells are off the table).
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))")
            .as("q"))
        .select(col("l_returnflag"), col("n"),
          round(element_at(col("q"), 1), 4).as("p25"),
          round(element_at(col("q"), 2), 4).as("p50"),
          round(element_at(col("q"), 3), 4).as("p75"),
          round(element_at(col("q"), 4), 4).as("p95"))
        .orderBy("l_returnflag")
    }),

    // DuckDB-dialect pass-through: the SAME SQL text the reference's
    // users write (strptime/strftime/epoch_ms/list/list_sort/len/
    // regexp_matches/json_structure) runs on spark.sql via the
    // FunctionRegistry shims (graft.functions.DialectShims) — every
    // shim rewrites to a native Catalyst expression at analysis time,
    // so the plan stays whole-stage-codegen'd. Oracle = byte-identical
    // SQL on DuckDB.
    "q35_dialect" -> ((s, dir) => {
      graft.functions.DialectShims.register(s)
      Tables.registerAll(s, dir)
      s.sql(dialectSql)
    })
  )

  /** Shared SQL text for q37: runs verbatim on BOTH engines. */
  /** Shared ANSI text for q41: suppliers with ≥1 large-quantity line
    * and zero returned lines, counted per nation.
    */
  private val existsSql = """
      SELECT n_name, count(*) AS n_suppliers
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        AND NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_suppkey = s_suppkey
                          AND l_quantity > 49 AND l_returnflag = 'R')
      GROUP BY n_name ORDER BY n_name"""

  private val filterAggSql = """
      SELECT o_orderpriority,
             count(*) AS n_orders,
             count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
             round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS avg_f,
             array_to_string(list_sort(array_agg(DISTINCT o_orderstatus)), '|') AS statuses
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Shared SQL text for q35: runs verbatim on BOTH engines. */
  private val dialectSql = """
      SELECT event_type,
             strftime(min(ts), '%Y-%m-%d %H:%M') AS first_seen,
             epoch_ms(min(ts)) AS first_ms,
             array_to_string(list_sort(list(DISTINCT json_structure(props))), '|') AS prop_shapes,
             array_to_string(list_slice(list_sort(list(DISTINCT json_structure(props))), 1, 2), '&') AS top_shapes,
             len(min(event_type)) AS type_len,
             strpos(event_type, 'e') AS e_pos,
             starts_with(event_type, 'c') AS starts_c,
             round(list_cosine_similarity(list_value(1.0, 2.0, 2.0), list_value(2.0, 1.0, 2.0)), 4) AS vec_cos,
             round(list_distance(list_value(0.0, 0.0), list_value(3.0, 4.0)), 4) AS vec_l2,
             round(list_inner_product(list_value(1.5, 2.5), list_value(2.0, 4.0)), 4) AS vec_dot,
             string_agg(DISTINCT substr(event_type, 1, 2), '~') AS prefix_agg,
             array_to_string(string_split_regex(min(event_type), '[aeiou]+'), '-') AS consonant_runs,
             count(*) AS n
      FROM events
      WHERE regexp_matches(event_type, '^(click|view|error|purchase)$')
        AND ts >= strptime('2024-01-01 00:00:00', '%Y-%m-%d %H:%M:%S')
      GROUP BY event_type
      ORDER BY event_type"""

  val oracle: Map[String, String] = Map(
    "q01_agg_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 2) AS avg_qty,
             round(avg(l_extendedprice), 2) AS avg_price,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_discount > 0.05 AND l_quantity >= 30
      ORDER BY l_orderkey, l_linenumber""",
    "q03_join_topk" -> """
      SELECT o_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             o_orderdate
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q04_join_left" -> """
      SELECT o_orderkey, count(l_linenumber) AS n_lines,
             round(coalesce(sum(l_quantity), 0), 2) AS sum_qty
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey ORDER BY o_orderkey""",
    "q05_join_semi" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      ORDER BY o_orderkey""",
    "q06_join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "q07_join_full" -> """
      WITH c AS (SELECT c_nationkey AS nk, count(*) AS cnt_c FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey AS nk, count(*) AS cnt_s FROM supplier GROUP BY 1)
      SELECT coalesce(c.nk, s.nk) AS nk,
             coalesce(cnt_c, 0) AS cnt_c, coalesce(cnt_s, 0) AS cnt_s
      FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nk""",
    "q08_join_multiway" -> """
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q09_sort_limit" -> """
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    "q10_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority""",
    "q11_having" -> """
      SELECT c_nationkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS tot_bal
      FROM customer GROUP BY c_nationkey HAVING count(*) > 3
      ORDER BY c_nationkey""",
    "q12_case_agg" -> """
      SELECT l_linestatus,
             round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS qty_returned,
             round(sum(CASE WHEN l_returnflag <> 'R' THEN l_quantity ELSE 0 END), 2) AS qty_kept,
             count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q13_union_all" -> """
      SELECT * FROM (
        SELECT cast(c_custkey AS bigint) AS k, 'customer' AS src FROM customer
        UNION ALL
        SELECT cast(s_suppkey AS bigint) AS k, 'supplier' AS src FROM supplier
      ) ORDER BY src, k""",
    "q14_intersect" -> """
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",
    "q15_except" -> """
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",
    "q16_string_funcs" -> """
      SELECT p_partkey, upper(p_brand) AS brand_u,
             substr(p_name, 1, 8) AS name8,
             cast(length(p_name) AS int) AS name_len,
             concat(p_brand, '/', p_type) AS brand_type,
             regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
             CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget
      FROM part ORDER BY p_partkey""",
    "q17_date_funcs" -> """
      SELECT cast(year(o_orderdate) AS int) AS y,
             cast(month(o_orderdate) AS int) AS m,
             count(*) AS n_orders, round(sum(o_totalprice), 2) AS tot
      FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    "q18_in_subquery" -> """
      SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS tot
      FROM orders WHERE o_custkey IN
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')""",
    "q19_scalar_subquery" -> """
      SELECT count(*) AS n_above, round(min(o_totalprice), 2) AS min_above
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
    "q20_cte_distribution" -> """
      WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      SELECT c_count, count(*) AS custdist FROM c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q21_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls""",
    "q22_cube" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS st,
             coalesce(o_orderpriority, 'ALL') AS pri,
             count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY st, pri""",
    "q23_grouping_sets" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rf, ls""",
    "q35_dialect" -> dialectSql,
    "q37_filter_agg" -> filterAggSql,
    "q41_exists_correlated" -> existsSql,
    "q39_percentiles" -> """
      SELECT l_returnflag, count(*) AS n,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
