package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.SparkEntry._

/** Core relational surface: TPC-H-ish aggregates, joins, windows, pagination, cube/rollup/pivot, as-of.
  *
  * Extracted verbatim from the SparkEntry registry; [[graft.SparkEntry]]
  * concatenates every family into the single driver-contract maps.
  */
private[graft] object CoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1-analog pricing summary: partial+final hash agg, one shuffle on the
    // two grouping keys (TPC-H Q1 shape).
    "q01_pricing_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("sum_disc_price"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),


    // J1: FK equi-join user→chats analog (customer ⋈ orders ⋈ nation);
    // nation broadcast (tiny dim), orders⋈customer shuffle-hash on key.
    "q02_nation_revenue" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"n_name")
    }),


    // J3 semi-join: registration duplicate-check analog (`main.py:36-38`).
    "q03_customers_with_orders" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),


    // J2/U2 anti-join: insert-if-absent / delete-by-predicate analog
    // (`pipeline2.py:315-331`).
    "q04_customers_without_orders" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),


    // W7 top-k: plans as TakeOrderedAndProject — no full sort at scale.
    "q05_top_orders" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),


    // P6 IN-list predicate (`QA_using_pinecone.py:41` metadata filter).
    "q06_segment_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),


    // W1/P9: row numbering + id synthesis `FormName + "_" + index`
    // (`pipeline1.py:700`, `pipeline2.py:130-132`).
    "q07_order_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("order_tag",
          concat($"o_custkey".cast("string"), lit("_"), $"rn".cast("string")))
        .select($"o_orderkey", $"o_custkey", $"rn", $"order_tag")
        .orderBy($"o_orderkey")
    }),


    // W2 running sum (`CummulativeTokenCount`, `pipeline1.py:139-146`).
    "q08_running_value" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("run_sum", round(sum($"value").over(w), 2))
        .select($"event_id", $"user_id", $"run_sum")
        .orderBy($"event_id")
    }),


    // A2 distinct (`SELECT DISTINCT form_name`, `pipeline2.py:60`).
    "q09_distinct_pairs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang", $"source").distinct()
        .orderBy($"lang", $"source")
    }),


    // U1 union (schema-aligned concat, `pipeline1.py:703`).
    "q12_entity_union" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_name".as("name"), lit("customer").as("kind"))
        .unionByName(
          t(s, dir, "supplier").select($"s_name".as("name"), lit("supplier").as("kind")))
        .orderBy($"kind", $"name")
    }),


    // W6 offset+limit pagination (`crud.py:32-33`).
    "q14_page" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
        .offset(100).limit(20)
    }),


    // Fact-fact shuffle join + calendar rollup (J1 at fact scale; AQE picks
    // the join strategy, aggregation is partial+final).
    "q41_monthly_revenue" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
        .orderBy($"month")
    }),


    // Multi-level aggregation (rollup): per-type and grand-total in one
    // pass (Expand + partial/final agg).
    "q46_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .rollup($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .select(coalesce($"event_type", lit("ALL")).as("event_type"), $"n", $"total_value")
        .orderBy($"event_type")
    }),


    // Pivot: per-user event-type counts as columns (conditional-agg form in
    // the oracle — the classic pivot lowering).
    "q47_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"user_id" < 10)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "error", "signup", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    }),


    // As-of join composed from union + ordered window (one shuffle on the
    // key): each error event picks up the user's most recent prior click
    // value. Oracle uses DuckDB's native ASOF LEFT JOIN.
    "q49_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.lastPriorValue(errors, clicks, "user_id", "ts", "value")
        .select($"event_id", $"user_id", round($"asof_value", 2).as("last_click_value"))
        .orderBy($"event_id")
    }),


    // ApplicationLog analog (`pipeline1.py:296-313`): one correlation id per
    // run, structured rows through a CollectionAccumulator (executor-safe),
    // then an aggregation over the run's log — counts per component/status,
    // n_runs proves every row carries the run's single correlation id.
    // Deterministic details derive from the documents table so the oracle
    // can recompute the expected matrix.
    "q51_app_log" -> ((s, dir) => {
      import s.implicits._
      val log = graft.query.ApplicationLog(s)
      val docs = t(s, dir, "documents")
      val perForm = docs.groupBy($"source")
        .agg(count(lit(1)).as("n"), max($"n_chars").as("mx"))
        .orderBy($"source")
        .collect()
      perForm.foreach { r =>
        val (src, n, mx) = (r.getString(0), r.getLong(1), r.getLong(2))
        log.log("pipeline1", "Info", s"extracted $src")
        log.log("pipeline1", "Info", s"chunked $src n=$n")
        if (mx > 350) log.log("pipeline1", "Error", s"oversized paragraph in $src")
      }
      log.log("pipeline2", "Info", s"indexed ${perForm.map(_.getLong(1)).sum} docs")
      log.toDF
        .groupBy($"Application_Component".as("component"),
          $"Application_LogStatus".as("log_status"))
        .agg(count(lit(1)).as("n_entries"),
          countDistinct($"Application_LogCorrelationID").as("n_runs"))
        .orderBy($"component", $"log_status")
    }),


    // CUBE with grouping_id — the full OLAP grouping-sets surface next to
    // q46's one-dim rollup: all four (status, priority) granularities in
    // ONE Expand + partial/final aggregate pass (never four scans), with
    // grouping_id disambiguating a real value from the aggregated-out
    // NULL. The 2-dim cube is 4× Expand rows into a partial agg —
    // map-side combine keeps the exchange grouped-rows-sized at 100 TB.
    "q202_cube_revenue" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("rev"))
        .select($"gid",
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"rev")
        .orderBy($"gid", $"status", $"priority")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, round(sum(l_extendedprice),2) AS sum_base_price, round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price, round(avg(l_discount),4) AS avg_disc, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_nation_revenue" ->
      """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name""",

    "q03_customers_with_orders" ->
      """SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",

    "q04_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",

    "q05_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q06_segment_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') ORDER BY c_custkey""",

    "q07_order_rank" ->
      """SELECT o_orderkey, o_custkey, rn, o_custkey::VARCHAR || '_' || rn::VARCHAR AS order_tag FROM (SELECT o_orderkey, o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) ORDER BY o_orderkey""",

    "q08_running_value" ->
      """SELECT event_id, user_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_sum FROM events ORDER BY event_id""",

    "q09_distinct_pairs" ->
      """SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""",

    "q12_entity_union" ->
      """SELECT * FROM (SELECT c_name AS name, 'customer' AS kind FROM customer UNION ALL SELECT s_name AS name, 'supplier' AS kind FROM supplier) ORDER BY kind, name""",

    "q14_page" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100""",

    "q41_monthly_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_items, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY month""",

    "q46_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY ROLLUP(event_type) ORDER BY event_type""",

    "q47_pivot" ->
      """SELECT user_id, sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click, sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view, sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error, sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id""",

    "q49_asof" ->
      """SELECT e.event_id, e.user_id, round(c.value, 2) AS last_click_value FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c ON e.user_id = c.user_id AND e.ts >= c.ts ORDER BY e.event_id""",

    "q51_app_log" ->
      """SELECT component, log_status, n_entries, n_runs FROM (
  SELECT 'pipeline1' AS component, 'Info' AS log_status, 2*count(DISTINCT source) AS n_entries, 1::BIGINT AS n_runs FROM documents
  UNION ALL
  SELECT 'pipeline1', 'Error', count(*), 1::BIGINT FROM (SELECT source, max(n_chars) AS mx FROM documents GROUP BY source) WHERE mx > 350
  UNION ALL
  SELECT 'pipeline2', 'Info', 1::BIGINT, 1::BIGINT
) WHERE n_entries > 0 ORDER BY component, log_status""",

    // q202: native CUBE + packed GROUPING bitmask, same 'ALL' coalesce
    "q202_cube_revenue" ->
      """SELECT grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid,
  coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
  count(*)::BIGINT AS n, round(sum(o_totalprice), 2) AS rev
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, status, priority""",
  )
}
