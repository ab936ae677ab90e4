package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operator coverage (SURVEY.md §2.3 checklist) over the
  * driver test tables, each with a DuckDB oracle.
  *
  * Numeric-determinism policy: every aggregated money/metric column is
  * computed in exact decimal arithmetic (`cast(decimal)` → sum → cast
  * double) so Spark and the DuckDB oracle produce bit-identical doubles
  * regardless of per-partition summation order. Raw double columns are
  * passed through untouched. Averages are expressed as exact-decimal sum
  * divided by count (both engines then do one identical double division).
  *
  * Scale notes (100 TB design intent, verified on local plans):
  *  - dimension joins (`part`, `nation`, `region`, `supplier`) are
  *    explicitly `broadcast()` — no shuffle of the fact table for them;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key only
  *    after filters are pushed below the join;
  *  - window queries partition by high-cardinality keys (l_orderkey), so
  *    state per partition stays tiny;
  *  - no `collect()` anywhere; all top-k via `orderBy.limit` (Spark
  *    plans TakeOrderedAndProject — no full sort at scale).
  */
object Relational {

  private def dec(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  /** Exact revenue term: price*(1-discount) in pure decimal arithmetic. */
  private def discPrice(price: Column, disc: Column): Column =
    dec(price, 12, 2) * (lit(1) - dec(disc, 4, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation over the fact table (reference: per-group set/stat
    // rollups, SURVEY §2.3 "Aggregations"; shape of TPC-H Q1).
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- projection + predicate pushdown (reference: Mongo projections /
    // find() filters, SURVEY T30). Filter and 4-column read reach the scan.
    "q02_filter_pushdown" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1996-01-01").cast("timestamp") &&
                $"l_discount" >= 0.05 && $"l_quantity" < 24)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
    },

    // ---- broadcast hash join with small dim (reference: label↔Concept
    // vocabulary joins, SURVEY T10/T12 — always broadcast).
    "q03_broadcast_join_agg" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part")
      li.join(broadcast(part), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"),
             sum(dec($"l_quantity")).cast("double").as("sum_qty"),
             sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
        .orderBy($"p_brand")
    },

    // ---- multi-way join: fact⋈fact shuffled on key, dims broadcast
    // (reference: custom_id request↔response join + vocab joins, T24/S8).
    "q04_multi_join_revenue" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    },

    // ---- left semi join / EXISTS (reference: "are_all_requests_complete"
    // pending gates, SURVEY T23).
    "q05_semi_join_exists" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val bigOrders = Tables.load(s, dir, "orders")
        .filter($"o_totalprice" > 400000.0).select($"o_custkey")
      cust.join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    // ---- left anti join / NOT EXISTS (reference: the incremental
    // "missing work" frontier planner, SURVEY T23 — the core of the
    // batch planner: expected LEFT ANTI JOIN ledger).
    "q06_anti_join_frontier" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val done = Tables.load(s, dir, "orders")
        .filter($"o_totalprice" > 400000.0).select($"o_custkey")
      cust.join(done, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // ---- first-row-per-group window (reference: "first chunk" selection
    // + first-occurrence dedup, SURVEY T1 / §2.3 "Window functions").
    "q07_first_per_group" -> { (s, dir) =>
      import s.implicits._
      // (l_orderkey, l_linenumber) is not unique in the test data — a
      // total order over content columns keeps rn=1 deterministic.
      val w = Window.partitionBy($"l_orderkey")
        .orderBy($"l_linenumber", $"l_partkey", $"l_suppkey", $"l_extendedprice")
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"l_orderkey", $"l_partkey", $"l_quantity")
        .orderBy($"l_orderkey")
    },

    // ---- running-sum window + bucket assignment (reference: the JSONL
    // batch-file packer's token budget, SURVEY S6 — running total div
    // limit → file bucket).
    "q08_running_sum_pack" -> { (s, dir) =>
      import s.implicits._
      // Total order within each order (see q07) so running sums are
      // deterministic; ties beyond these columns can only be rows whose
      // swap leaves every running sum unchanged.
      val ord = Seq($"l_linenumber", $"l_partkey", $"l_quantity", $"l_extendedprice")
      val w = Window.partitionBy($"l_orderkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wBefore = Window.partitionBy($"l_orderkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          sum(dec($"l_quantity")).over(w).cast("double").as("run_qty"),
          floor(coalesce(sum(dec($"l_quantity")).over(wBefore), lit(java.math.BigDecimal.ZERO))
            .cast("double") / 100.0).cast("long").as("bucket"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey")
    },

    // ---- global top-k (reference: smallest-documents-first batch
    // planning sort + limit, SURVEY T30). Plans as TakeOrderedAndProject.
    "q09_topk_orders" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // ---- T30 random sample (reference `$sample size: 1`,
    // `manufacturer_service.py:68-86`). Engine-portable determinism:
    // order by md5 of a salted key — a uniform pseudorandom permutation
    // both engines compute identically (same trick as the dedup-suite
    // hashes), so the sample is oracled exactly instead of rows-only.
    // Plans as TakeOrderedAndProject: one-pass map-side partial top-k,
    // never a full sort — the sample shape that survives 100 TB.
    "q28_random_sample" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .withColumn("smpl", md5(concat(lit("sample:"), $"o_orderkey".cast("string"))))
        .orderBy($"smpl")
        .limit(100)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // ---- set intersection on Datasets (reference: pervasive `&`/`|`/`-`
    // set semantics, SURVEY §2.3 "Set ops").
    "q10_set_intersect" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part")
      def brandsFor(flag: String): DataFrame =
        li.filter($"l_returnflag" === flag)
          .join(broadcast(part), $"l_partkey" === $"p_partkey")
          .select($"p_brand").distinct()
      brandsFor("R").intersect(brandsFor("A")).orderBy($"p_brand")
    },

    // ---- exact duplicate detection by full content (reference: T1
    // exact-dup page drop — first occurrence kept; here grouped by value,
    // keeper = min id, as the hash-groupBy dedup path scales to 100 TB).
    "q11_exact_dedup_docs" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .groupBy($"text")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("dup_count"))
        .select($"keep_id", $"dup_count")
        .orderBy($"keep_id")
    },

    // ---- event-time bucketed aggregation (streaming-shaped; reference
    // S4 queue cadence → Structured Streaming; batch-equivalent window).
    "q12_event_time_window" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
        .agg(count(lit(1)).as("n"),
             sum(dec($"value", 18, 2)).cast("double").as("sum_value"))
        .orderBy($"hour_ts", $"event_type")
    },

    // ---- per-group distinct-set collection (reference: reconcile's
    // set-union rollups per company, SURVEY T24/T25 → collect_set).
    // Stringified lexicographically so the oracle compare is order-free.
    "q13_group_collect_set" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(array_join(array_sort(collect_set($"l_suppkey".cast("string"))), ",")
          .as("suppkeys"))
        .orderBy($"l_orderkey")
    },

    // ---- JSON parse with schema (reference: from_json response parsing,
    // SURVEY T9/T13 parse layer). Oracle uses an equivalent regex.
    "q14_json_extract_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .select(from_json($"props", lit("k INT")).getField("k").as("k"), $"value")
        .groupBy($"k")
        .agg(count(lit(1)).as("n"),
             sum(dec($"value", 18, 2)).cast("double").as("sum_value"))
        .orderBy($"k")
    },

    // ---- set difference on Datasets (reference `-` on result sets,
    // SURVEY §2.3 "Set ops": results − remove, expected − completed).
    "q25_set_except" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      def ordersFor(flag: String) =
        li.filter($"l_returnflag" === flag).select($"l_orderkey").distinct()
      ordersFor("N").except(ordersFor("R")).orderBy($"l_orderkey")
    },

    // ---- group-into-map (reference T12's known→unknowns grouping,
    // `map_from_entries(collect_list(...))` shape, SURVEY §2.3
    // "Aggregations"). Stringified sorted entries so the compare is
    // engine-neutral (duplicate keys exist in the data).
    "q26_group_into_map" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct($"l_linenumber".as("k"), $"l_suppkey".as("v")))),
            e => concat_ws(":", e.getField("k"), e.getField("v"))), ",")
          .as("line_supp_map"))
        .orderBy($"l_orderkey")
    },

    // ---- rollup (hierarchical subtotals region→nation→total).
    "q27_rollup_revenue" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_items"),
             sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
        .orderBy($"r_name", $"n_name")
    },

    // ---- CUBE over two group keys: all four grouping sets in ONE pass
    // over the fact table (each map task emits partial aggregates per
    // set — no re-scan per set, which is the point of cube at scale).
    "q46_cube_revenue" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_items"),
             sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- weighted PageRank on the supplier→customer nation trade
    // graph, in fixed-point integer arithmetic (bit-identical BIGINT
    // ranks across engines — see graph/PageRank for the float-policy
    // argument). The per-round join+agg on the node id is the plan
    // shape that runs at billions of edges; here the graph is the
    // 25-nation trade network extracted by the same star joins as q04.
    "q57_pagerank_trade" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      val sup = Tables.load(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      val ord = Tables.load(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val cust = Tables.load(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      val edges = li
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy($"s_nationkey", $"c_nationkey")
        .agg(count(lit(1)).as("w"))
        .select($"s_nationkey".as("src"), $"c_nationkey".as("dst"), $"w")
      val nodes = Tables.load(s, dir, "nation").select($"n_nationkey".as("node"))
      graft.graph.PageRank.ranks(nodes, "node", edges, "src", "dst", "w", iters = PrIters)
        .orderBy($"node")
    },

    // ---- data-quality constraint report: four Deequ-style checks over
    // lineitem in ONE aggregation pass (completeness, composite-key
    // uniqueness — (orderkey, linenumber) is deliberately NOT unique in
    // this generator, the report proves it — range and set membership).
    // All metrics are exact long counts divided once in double.
    "q64_quality_report" -> { (s, dir) =>
      import s.implicits._
      import graft.plans.Constraints._
      report(Tables.load(s, dir, "lineitem"), Seq(
          Completeness("l_shipdate") -> 1.0,
          Uniqueness(Seq("l_orderkey", "l_linenumber")) -> 0.9,
          RangeConformance("l_discount", 0.0, 0.1) -> 1.0,
          Membership("l_returnflag", Seq("A", "N", "R")) -> 1.0))
        .orderBy($"check")
    },

    // ---- Z-order layout key: the multi-dimensional clustering value a
    // 100 TB table sorts/buckets by for data skipping on (customer,
    // date) predicates at once. Pure per-row bit math (codegen'd, no
    // shuffle beyond the gate's orderBy); zbucket = top 6 z-bits = the
    // 64-way range shard a writer would target.
    "q48_zorder_layout" -> { (s, dir) =>
      import s.implicits._
      val days = datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date"))
      val z = graft.plans.ZOrder.zValue(Seq($"o_custkey", days), bits = ZBits)
      Tables.load(s, dir, "orders")
        .select($"o_orderkey", z.as("zval"))
        .withColumn("zbucket", shiftright($"zval", 2 * ZBits - 6))
        .orderBy($"o_orderkey")
    },

    // ---- PIVOT: wide per-status revenue by priority in ONE aggregation
    // pass (explicit value list, so no extra distinct-values job and a
    // deterministic column set).
    "q49_pivot_priority" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", OrderPriorities)
        .agg(sum(dec($"o_totalprice")).cast("double"))
        .orderBy($"o_orderstatus")
    },

    // ---- BAG semantics: EXCEPT ALL preserves multiplicity (q25 is the
    // set form) — order keys with their line counts minus the returned
    // lines' multiset.
    "q53_except_all" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      li.select($"l_orderkey")
        .exceptAll(li.filter($"l_returnflag" === "R").select($"l_orderkey"))
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy($"l_orderkey")
    },

    // ---- ordered string aggregation (LISTAGG): deterministic via the
    // explicit sort inside the aggregate, same UTF8-binary order both
    // engines.
    "q54_string_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list($"c_name")), "|").as("names"))
        .orderBy($"c_mktsegment")
    }
  )

  /** TPC-H order priorities — the explicit pivot column set for q49,
    * mirrored into the oracle's CASE aggregates.
    */
  private val OrderPriorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Bits per dimension for q48 — 15 covers o_custkey and the epoch-day
    * range at the gate/bench SFs; larger keys quantize modulo 2^15,
    * identically on both engines (see ZOrder.zValue).
    */
  private val ZBits = 15

  /** q57 PageRank rounds + fixed-point scale — mirrored literally into
    * the oracle's unrolled iteration CTEs (damping 85/100, base
    * (1−d)·scale; see graph/PageRank for the integer semantics).
    */
  private val PrIters = 3
  private val PrScale = 1000000000000L

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,

    "q03_broadcast_join_agg" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q04_multi_join_revenue" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q05_semi_join_exists" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,

    "q06_anti_join_frontier" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,

    "q07_first_per_group" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM (
        |  SELECT l_orderkey, l_partkey, l_quantity,
        |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    "q08_running_sum_pack" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_qty,
        | CAST(FLOOR(CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |   OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 100.0) AS BIGINT) AS bucket
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q09_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q28_random_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY md5('sample:' || CAST(o_orderkey AS VARCHAR)) LIMIT 100""".stripMargin,

    "q10_set_intersect" ->
      """SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_returnflag = 'R'
        |INTERSECT
        |SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_returnflag = 'A'""".stripMargin,

    "q11_exact_dedup_docs" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY text""".stripMargin,

    "q12_event_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q13_group_collect_set" ->
      """SELECT l_orderkey, string_agg(s, ',' ORDER BY s) AS suppkeys FROM (
        |  SELECT DISTINCT l_orderkey, CAST(l_suppkey AS VARCHAR) AS s FROM lineitem)
        |GROUP BY l_orderkey""".stripMargin,

    "q14_json_extract_agg" ->
      """SELECT CAST(regexp_extract(props, '(\d+)', 1) AS INT) AS k,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "q25_set_except" ->
      """SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
        |EXCEPT
        |SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,

    "q26_group_into_map" ->
      """SELECT l_orderkey,
        | string_agg(CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR),
        |            ',' ORDER BY l_linenumber, l_suppkey) AS line_supp_map
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q27_rollup_revenue" ->
      """SELECT r_name, n_name, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q46_cube_revenue" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    // One UNION ALL branch per check; names/thresholds mirror the
    // Constraints definitions literally.
    "q64_quality_report" ->
      """SELECT * FROM (
        |  SELECT 'completeness(l_shipdate)' AS "check",
        |         CAST(COUNT(l_shipdate) AS DOUBLE) / COUNT(*) AS metric,
        |         CAST(COUNT(l_shipdate) AS DOUBLE) / COUNT(*) >= 1.0 AS passed
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'uniqueness(l_orderkey,l_linenumber)',
        |         CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / COUNT(*),
        |         CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / COUNT(*) >= 0.9
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'range(l_discount,[0.0,0.1])',
        |         CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS DOUBLE)
        |           / SUM(CASE WHEN l_discount IS NOT NULL THEN 1 ELSE 0 END),
        |         CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS DOUBLE)
        |           / SUM(CASE WHEN l_discount IS NOT NULL THEN 1 ELSE 0 END) >= 1.0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'membership(l_returnflag)',
        |         CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS DOUBLE)
        |           / SUM(CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 0 END),
        |         CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS DOUBLE)
        |           / SUM(CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 0 END) >= 1.0
        |  FROM lineitem)""".stripMargin,

    // Iterations unrolled as CTEs from the SAME constants as the Spark
    // side; every arithmetic step is BIGINT multiply/divide, so both
    // engines produce identical ranks (`//` and Spark `div` both
    // truncate, and all operands here are positive).
    "q57_pagerank_trade" -> {
      val base = PrScale * 15 / 100
      def iter(i: Int) =
        s"""r$i AS (
           |  SELECT n.node, CAST($base + (COALESCE(s.s, 0) * 85) // 100 AS BIGINT) AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst, CAST(SUM((r.rank * e.w) // e.tw) AS BIGINT) AS s
           |    FROM ew e JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst) s
           |  ON s.dst = n.node)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM lineitem l
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |tw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM e0 GROUP BY 1),
         |ew AS (SELECT e0.src, e0.dst, e0.w, tw.tw FROM e0 JOIN tw USING (src)),
         |nodes AS (SELECT n_nationkey AS node FROM nation),
         |r0 AS (SELECT node, CAST($PrScale AS BIGINT) AS rank FROM nodes),
         |${(1 to PrIters).map(iter).mkString(",\n")}
         |SELECT node, rank FROM r$PrIters""".stripMargin
    },

    // Generated from the SAME interleave loop as the Spark side
    // (ZOrder.zValueSql), like the MinHash oracle.
    "q48_zorder_layout" -> {
      val days = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
      val z = graft.plans.ZOrder.zValueSql(Seq("o_custkey", days), bits = ZBits)
      s"""SELECT o_orderkey, ($z) AS zval, (($z) >> ${2 * ZBits - 6}) AS zbucket FROM orders"""
    },

    // One CASE aggregate per pivot column — generated from the same
    // value list as the Spark pivot.
    "q49_pivot_priority" -> {
      val cols = OrderPriorities.map { p =>
        s"""CAST(SUM(CASE WHEN o_orderpriority = '$p' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "$p""""
      }.mkString(",\n ")
      s"SELECT o_orderstatus,\n $cols\nFROM orders GROUP BY o_orderstatus"
    },

    "q53_except_all" ->
      """WITH x AS (
        |  SELECT l_orderkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |SELECT l_orderkey, COUNT(*) AS n FROM x GROUP BY l_orderkey""".stripMargin,

    "q54_string_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |       string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM customer GROUP BY c_mktsegment""".stripMargin
  )
}
