package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The general relational query surface (SURVEY.md §2.F): joins of every
  * flavor, grouped/rollup/cube/distinct aggregation, windows, top-k, set
  * ops, range joins — expressed as declarative DataFrame plans so Catalyst
  * handles pushdown, join selection, partial aggregation and AQE.
  *
  * Scale notes (100 TB target):
  *   - dimension tables (region/nation) are broadcast explicitly;
  *   - fact-fact joins (lineitem⋈orders) are key-equi shuffles that AQE
  *     sizes at runtime; the range predicate rides on the equi key so no
  *     nested-loop join ever appears;
  *   - aggregates are partial-final hash aggregates (map-side combine);
  *   - top-k compiles to TakeOrderedAndProject (no global sort).
  */
object Relational {

  /** Exact money accumulation: per-row double arithmetic (bit-identical in
    * any engine), DECIMAL sum (order-independent), DOUBLE at the end. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // --- aggregation (TPC-H Q1 shape; SURVEY Q1/Q2/Q6 aggregate surface)
    QueryDef.sql(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- multi-way join with broadcast dims (SURVEY §2.F joins)
    QueryDef.sql(
      "q2_join_broadcast",
      """SELECT r_name, n_name,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_rev"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // --- semi join (SURVEY H6 hit-path / EXISTS)
    QueryDef.sql(
      "q3_semi_join",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // --- anti join (SURVEY H6 miss-path / NOT EXISTS)
    QueryDef.sql(
      "q4_anti_join",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // --- window dedup: first-occurrence-wins (SURVEY H5 semantics)
    QueryDef.sql(
      "q5_window_dedup",
      """SELECT l_returnflag, COUNT(*) AS n_first_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_first
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity, l_returnflag) AS rn
        |  FROM lineitem) t
        |WHERE rn = 1
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // (l_orderkey, l_linenumber) is not unique in the synthetic data, so
      // the tie-break must cover every column the downstream agg reads.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      Tables(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_first_lines"), dsum(col("l_quantity")).as("qty_first"))
        .orderBy(col("l_returnflag"))
    },

    // --- top-k with unique tie-break (TakeOrderedAndProject, no full sort)
    QueryDef.sql(
      "q6_topk",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    },

    // --- rollup (SURVEY §2.F grouping sets)
    QueryDef.sql(
      "q7_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // --- cube
    QueryDef.sql(
      "q8_cube",
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    // --- distinct aggregation (SURVEY Q2 statistics-in-one-job shape)
    QueryDef.sql(
      "q9_distinct_agg",
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    },

    // --- set operations (SURVEY §2.F union/intersect/except)
    QueryDef.sql(
      "q10_setops",
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |     INTERSECT SELECT o_custkey FROM orders) t1) AS n_intersect,
        |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |     EXCEPT SELECT o_custkey FROM orders) t2) AS n_except,
        |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |     UNION SELECT o_custkey FROM orders) t3) AS n_union""".stripMargin) { (s, dir) =>
      val rich = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val ordered = Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      // one lazy plan, mirroring the scalar-subquery SQL: three 1-row
      // aggregates cross-joined (each side broadcasts); no driver actions
      rich.intersect(ordered).agg(count(lit(1)).as("n_intersect"))
        .crossJoin(rich.except(ordered).agg(count(lit(1)).as("n_except")))
        .crossJoin(rich.union(ordered).distinct().agg(count(lit(1)).as("n_union")))
    },

    // --- range predicate riding an equi join (SURVEY §2.F range joins)
    QueryDef.sql(
      "q11_range_join",
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // --- hash-index point lookup (SURVEY Q3 / H6: hash → id)
    QueryDef.sql(
      "q12_hash_lookup",
      """SELECT hash, c_custkey FROM (
        |  SELECT md5('WCD' || CAST(c_custkey AS VARCHAR)) AS hash, c_custkey
        |  FROM customer) t
        |WHERE hash = md5('WCD42')""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .select(md5(concat(lit("WCD"), col("c_custkey").cast("string"))).as("hash"),
          col("c_custkey"))
        .filter(col("hash") === md5(lit("WCD42")))
    },

    // --- scan + filter + bounded take (SURVEY A2: the all-pages range
    // scan with redirect filter and max_count)
    QueryDef.sql(
      "q14_scan_limit",
      """SELECT doc_id, source FROM documents
        |WHERE doc_id % 7 <> 0 ORDER BY doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
        .limit(100)
    },

    // --- sketch aggregation (SURVEY §2.F: HLL for the statistics report
    // at scale). The HLL estimate itself is engine-specific, so the
    // oracle checks the exact count plus the ≤5% relative-error CLAIM of
    // the estimate (oracle says: must hold) — stronger than rows-only;
    // the tighter ≤2% bound is additionally asserted in ExprPropertySpec.
    QueryDef.sql(
      "q16_approx_distinct",
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_ok"))
        .orderBy(col("event_type"))
    },

    // --- as-of join (SURVEY §2.F temporal joins): every click gets the
    // latest prior (or same-instant) view of the same user
    QueryDef.sql(
      "q15_asof_join",
      """WITH u AS (SELECT user_id, ts, event_id,
        |  (event_type = 'click') AS is_click FROM events
        |  WHERE event_type IN ('click','view')),
        |w AS (SELECT *, last_value(CASE WHEN NOT is_click THEN event_id END IGNORE NULLS)
        |        OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
        |              ROWS UNBOUNDED PRECEDING) AS asof_view_id
        |      FROM u)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, asof_view_id
        |FROM w WHERE is_click ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      graft.ops.JoinOps.asOfJoin(clicks, views, "user_id",
          "ts", "ts", "event_id", "view_id", "view_id")
        .orderBy(col("event_id"))
    },

    // --- TOLERANCED as-of join (q15 with a staleness bound): every
    // click gets its latest prior view ONLY if that view is at most one
    // day old — the attribution-window semantics production as-of joins
    // run with (kdb wj / pandas merge_asof tolerance). The bound tests
    // in exact integer microseconds on both engines.
    QueryDef.sql(
      "q36_asof_tolerance",
      """WITH u AS (SELECT user_id, ts, event_id,
        |  (event_type = 'click') AS is_click FROM events
        |  WHERE event_type IN ('click','view')),
        |w AS (SELECT *,
        |    last_value(CASE WHEN NOT is_click THEN event_id END IGNORE NULLS)
        |      OVER win AS av_id,
        |    last_value(CASE WHEN NOT is_click THEN ts END IGNORE NULLS)
        |      OVER win AS av_ts
        |  FROM u WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts, is_click, event_id ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CASE WHEN av_ts IS NOT NULL
        |         AND epoch_us(ts) - epoch_us(av_ts) <= 86400000000
        |       THEN av_id END AS asof_view_id
        |FROM w WHERE is_click ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      graft.ops.JoinOps.asOfJoinTolerance(clicks, views, "user_id",
          "ts", "ts", "event_id", "view_id", "view_id", tolSeconds = 86400L)
        .orderBy(col("event_id"))
    },

    // --- FORWARD as-of join (q15's mirror): for each click, the NEXT
    // view at-or-after it — the "time to next touch" primitive. Same
    // single-shuffle union+window shape, scanned in descending time.
    QueryDef.sql(
      "q35_asof_forward",
      """WITH u AS (SELECT user_id, ts, event_id,
        |  (event_type = 'click') AS is_click FROM events
        |  WHERE event_type IN ('click','view')),
        |w AS (SELECT *, last_value(CASE WHEN NOT is_click THEN event_id END IGNORE NULLS)
        |        OVER (PARTITION BY user_id ORDER BY ts DESC, is_click, event_id
        |              ROWS UNBOUNDED PRECEDING) AS next_view_id
        |      FROM u)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, next_view_id
        |FROM w WHERE is_click ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      graft.ops.JoinOps.asOfJoinForward(clicks, views, "user_id",
          "ts", "ts", "event_id", "view_id", "view_id")
        .orderBy(col("event_id"))
    },

    // --- full outer join (completes the join flavors: inner/broadcast
    // q2, semi q3, anti q4, range q11, as-of q15): customer-order
    // reconciliation where either side may be missing
    QueryDef.sql(
      "q19_full_outer",
      """SELECT
        |  CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS orphan_orders,
        |  CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS idle_customers,
        |  CAST(COUNT(*) FILTER (c_custkey IS NOT NULL AND o_custkey IS NOT NULL)
        |    AS BIGINT) AS matched
        |FROM (SELECT DISTINCT c_custkey FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_custkey")).distinct()
      val o = Tables(s, dir, "orders").select(col("o_custkey")).distinct()
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .agg(
          count(when(col("c_custkey").isNull, 1)).as("orphan_orders"),
          count(when(col("o_custkey").isNull, 1)).as("idle_customers"),
          count(when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, 1))
            .as("matched"))
    },

    // --- pivot (SURVEY §2.F wide aggregation): explicit value list so
    // the output schema is static (the scalable form — no extra pass to
    // discover values, no driver-side schema surprise at 100 TB)
    QueryDef.sql(
      "q17_pivot",
      """SELECT user_id % 10 AS cohort,
        |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // fill ONLY the pivoted columns: an unscoped fill would also
        // rewrite a null grouping key, diverging from the oracle
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy(col("cohort"))
    },

    // --- unpivot/melt (the reshape inverse of q17): wide per-cohort
    // counts back to long (cohort, event_type, n) form
    QueryDef.sql(
      "q20_unpivot",
      """WITH w AS (SELECT user_id % 10 AS cohort,
        |    CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |    CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |  FROM events GROUP BY 1)
        |SELECT cohort, 'click' AS event_type, click AS n FROM w
        |UNION ALL SELECT cohort, 'view', view FROM w
        |ORDER BY cohort, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", Seq("click", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view"))
        .unpivot(Array(col("cohort")), Array(col("click"), col("view")),
          "event_type", "n")
        .orderBy(col("cohort"), col("event_type"))
    },

    // --- window-function pack (SURVEY §2.F analytics): lag/lead, rank,
    // running DECIMAL sum, ntile — one shuffle on the partition key
    QueryDef.sql(
      "q18_window_analytics",
      """SELECT event_id, user_id,
        |  LAG(event_id) OVER w AS prev_event,
        |  LEAD(event_id) OVER w AS next_event,
        |  CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS value_rank,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |    AS DOUBLE) AS running_value,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM events WHERE user_id % 100 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRank = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      Tables(s, dir, "events")
        .filter(col("user_id") % 100 === 0)
        .select(col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(w).as("prev_event"),
          lead(col("event_id"), 1).over(w).as("next_event"),
          rank().over(wRank).as("value_rank"),
          sum(col("value").cast(DecimalType(18, 2))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // --- RANGE-frame window (the time-based frame flavor q18's ROWS
    // frame doesn't cover): per-user trailing-1-hour event count and
    // DECIMAL value sum at every event
    QueryDef.sql(
      "q21_range_frame",
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM events WHERE user_id % 100 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      // interval RANGE frames aren't expressible through the Scala
      // WindowSpec (rangeBetween takes longs); the SQL-expression form
      // compiles to the same Catalyst window operator
      val frame = "PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
      Tables(s, dir, "events")
        .filter(col("user_id") % 100 === 0)
        .selectExpr("event_id", "user_id",
          s"COUNT(*) OVER ($frame) AS n_last_hour",
          s"CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER ($frame) AS DOUBLE) AS sum_last_hour")
        .orderBy(col("user_id"), col("event_id"))
    },

    // --- JSON field extraction (SURVEY §2.F JSON functions)
    QueryDef.sql(
      "q13_json",
      """SELECT event_type,
        |  CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // --- GROUPING SETS beyond rollup/cube: explicit set list + grouping_id
    // (one shuffle; Expand feeds a single partial-final hash aggregate)
    QueryDef.sql(
      "q22_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // --- correlated scalar subqueries (Catalyst decorrelates both into
    // aggregate+join; the cents-BIGINT compare keeps the predicate exact in
    // any engine — no double or decimal-division semantics in play)
    QueryDef.sql(
      "q23_correlated_scalar",
      """SELECT o.o_custkey, COUNT(*) AS n_above
        |FROM orders o
        |WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) *
        |      (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |    > (SELECT SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT))
        |       FROM orders i WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o.o_custkey
        |ORDER BY o.o_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o.o_custkey, COUNT(*) AS n_above
          |FROM orders o
          |WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) *
          |      (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          |    > (SELECT SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT))
          |       FROM orders i WHERE i.o_custkey = o.o_custkey)
          |GROUP BY o.o_custkey
          |ORDER BY o.o_custkey""".stripMargin)
    },

    // --- lateral join: top-2 orders per customer through a correlated
    // subquery (Catalyst rewrites the correlated LIMIT into a partitioned
    // window — the scale shape is one shuffle on the correlation key)
    QueryDef.sql(
      "q24_lateral_topn",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_custkey"))
        .lateralJoin(
          Tables(s, dir, "orders")
            .where(col("o_custkey") === col("c_custkey").outer())
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))
            .limit(2)
            .select(col("o_orderkey"), col("o_totalprice")))
        .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // --- multiset set ops (INTERSECT ALL / EXCEPT ALL), one lazy plan
    QueryDef.sql(
      "q25_setops_all",
      """SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |     INTERSECT ALL
        |     SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')) AS n_intersect_all,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |    (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |     EXCEPT ALL
        |     SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')) AS n_except_all""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val r = li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
      val a = li.filter(col("l_returnflag") === "A").select(col("l_partkey"))
      r.intersectAll(a).agg(count(lit(1)).as("n_intersect_all"))
        .crossJoin(r.exceptAll(a).agg(count(lit(1)).as("n_except_all")))
    },

    // --- time-series resample + forward fill: hourly grid per user
    // (sequence+explode), left join actuals, last-non-null window fill.
    // Scale shape: grid explode is narrow, fill is one shuffle on user_id.
    QueryDef.sql(
      "q26_gap_fill",
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span)
        |SELECT g.user_id, CAST(epoch(g.hour) AS BIGINT) AS hour_ts,
        |  floor((last_value(h.hour_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000000.0 + 0.5) / 1000000.0 AS filled_value,
        |  h.hour_value IS NULL AS is_gap
        |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
        |ORDER BY g.user_id, hour_ts""".stripMargin) { (s, dir) =>
      val hourly = Tables(s, dir, "events")
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(dsum(col("value")).as("hour_value"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour").cast("long").as("hour_ts"),
          graft.ops.TextOps.round6p(last(col("hour_value"), ignoreNulls = true).over(w)).as("filled_value"),
          col("hour_value").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("hour_ts"))
    },

    // --- event funnel: staged min-timestamp joins, one plan (three 1-row
    // aggregates cross-joined — no driver-side actions)
    QueryDef.sql(
      "q27_funnel",
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase,
        |  floor(((SELECT COUNT(*) FROM s2)::DOUBLE / (SELECT COUNT(*) FROM s1)::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS r_click,
        |  floor(((SELECT COUNT(*) FROM s3)::DOUBLE / (SELECT COUNT(*) FROM s1)::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS r_purchase""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val st1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val st2 = ev.filter(col("event_type") === "click")
        .join(st1, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val st3 = ev.filter(col("event_type") === "purchase")
        .join(st2, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      st1.agg(count(lit(1)).as("n_view"))
        .crossJoin(st2.agg(count(lit(1)).as("n_click")))
        .crossJoin(st3.agg(count(lit(1)).as("n_purchase")))
        .select(col("n_view"), col("n_click"), col("n_purchase"),
          graft.ops.TextOps.round6p(col("n_click").cast("double") / col("n_view").cast("double")).as("r_click"),
          graft.ops.TextOps.round6p(col("n_purchase").cast("double") / col("n_view").cast("double")).as("r_purchase"))
    },

    // --- batch sessionization: gap-threshold boundaries via lag +
    // running sum — the window-function dual of streaming session_window
    // (s3). One shuffle on user_id; both windows share its partitioning.
    QueryDef.sql(
      "q28_sessionize",
      """WITH b AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, value,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |      FROM b)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("new_s",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            <= 30L * 60 * 1000000, 0L).otherwise(1L))
        .withColumn("session_seq", sum(col("new_s")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).cast("long").as("session_start"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // --- cohort retention: users bucketed by first-seen week, activity
    // tracked by week offset. Two aggregates + one join, all keyed small.
    QueryDef.sql(
      "q29_cohorts",
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
        |j AS (SELECT a.user_id, f.cohort_week,
        |        CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INT) AS week_offset
        |      FROM a JOIN f USING (user_id)),
        |r AS (SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
        |      FROM j GROUP BY 1, 2),
        |cs AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM f GROUP BY 1)
        |SELECT r.cohort_week, r.week_offset, cs.n_cohort, r.n_active,
        |  floor((r.n_active::DOUBLE / cs.n_cohort::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS retention
        |FROM r JOIN cs USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val f = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val a = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk")).distinct()
      val j = a.join(f, "user_id")
        .select(col("cohort_week"),
          expr("datediff(wk, cohort_week) div 7").cast("int").as("week_offset"))
      val r = j.groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      val cs = f.groupBy(col("cohort_week")).agg(count(lit(1)).as("n_cohort"))
      r.join(cs, "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("n_cohort"), col("n_active"),
          graft.ops.TextOps.round6p(col("n_active").cast("double") / col("n_cohort").cast("double")).as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // --- market-basket association rules over order baskets: pair
    // counts from the oriented basket self-join, support/confidence/lift
    // from integer counts (one double division each — engine-exact).
    // Item-count and total-order relations are item-/1-sized: broadcast.
    QueryDef.sql(
      "q30_basket_lift",
      """WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM po),
        |ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_i FROM po GROUP BY 1),
        |pc AS (SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS n_uv
        |       FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2)
        |SELECT pc.u, pc.v, pc.n_uv,
        |  floor((pc.n_uv::DOUBLE / n.n_orders::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS support,
        |  floor((pc.n_uv::DOUBLE / ia.n_i::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS confidence,
        |  floor(((pc.n_uv * n.n_orders)::DOUBLE / (ia.n_i * ib.n_i)::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS lift
        |FROM pc CROSS JOIN n
        |JOIN ic ia ON ia.l_partkey = pc.u
        |JOIN ic ib ON ib.l_partkey = pc.v
        |WHERE pc.n_uv >= 3
        |ORDER BY lift DESC, u, v LIMIT 20""".stripMargin) { (s, dir) =>
      val po = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val nOrders = po.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val ic = po.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
      val pc = po.as("a").join(po.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("n_uv"))
      pc.filter(col("n_uv") >= 3)
        .join(broadcast(ic.select(col("l_partkey").as("u"), col("n_i").as("n_u"))), "u")
        .join(broadcast(ic.select(col("l_partkey").as("v"), col("n_i").as("n_v"))), "v")
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("n_uv"),
          graft.ops.TextOps.round6p(col("n_uv").cast("double") / col("n_orders").cast("double")).as("support"),
          graft.ops.TextOps.round6p(col("n_uv").cast("double") / col("n_u").cast("double")).as("confidence"),
          graft.ops.TextOps.round6p((col("n_uv") * col("n_orders")).cast("double") /
            (col("n_u") * col("n_v")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("u"), col("v"))
        .limit(20)
    },

    // --- distribution/value window functions: percent_rank, cume_dist,
    // first/nth value, lead — one window definition, one shuffle
    QueryDef.sql(
      "q31_window_pack2",
      """SELECT user_id, event_id,
        |  floor((PERCENT_RANK() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pr,
        |  floor((CUME_DIST() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cd,
        |  FIRST_VALUE(event_id) OVER w AS first_event,
        |  NTH_VALUE(event_id, 2) OVER w AS second_event,
        |  LEAD(event_id, 1) OVER w AS next_event
        |FROM events WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"),
          graft.ops.TextOps.round6p(percent_rank().over(w)).as("pr"),
          graft.ops.TextOps.round6p(cume_dist().over(w)).as("cd"),
          first(col("event_id")).over(w).as("first_event"),
          nth_value(col("event_id"), 2).over(w).as("second_event"),
          lead(col("event_id"), 1).over(w).as("next_event"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // --- neighborhood similarity (collaborative-filtering flavor):
    // supplier pairs ranked by Jaccard of their part neighborhoods.
    // Co-occurrence counts come from one self-equi-join on part (never
    // all supplier pairs); neighborhood sizes broadcast on top.
    QueryDef.sql(
      "q32_neighbor_similarity",
      """WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
        |sz AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts FROM sp GROUP BY 1),
        |co AS (SELECT a.l_suppkey AS s_x, b.l_suppkey AS s_y,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM sp a JOIN sp b ON a.l_partkey = b.l_partkey
        |        AND a.l_suppkey < b.l_suppkey
        |       GROUP BY 1, 2)
        |SELECT co.s_x, co.s_y, co.n_common,
        |  floor((co.n_common::DOUBLE /
        |    (sa.n_parts + sb.n_parts - co.n_common)::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM co
        |JOIN sz sa ON sa.l_suppkey = co.s_x
        |JOIN sz sb ON sb.l_suppkey = co.s_y
        |ORDER BY jaccard DESC, s_x, s_y LIMIT 20""".stripMargin) { (s, dir) =>
      // the distinct (supplier, part) pair table is the landed sp_pairs
      // index (shared with g2's PageRank edges — warm-line charged), so
      // the timed region starts at the co-occurrence join
      val sp = Pipelines.supplierPartPairs(s, dir)
      val sz = sp.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
      val co = sp.as("a").join(sp.as("b"),
          col("a.l_partkey") === col("b.l_partkey")
            && col("a.l_suppkey") < col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("s_x"), col("b.l_suppkey").as("s_y"))
        .agg(count(lit(1)).as("n_common"))
      co.join(broadcast(sz.select(col("l_suppkey").as("s_x"), col("n_parts").as("n_x"))), "s_x")
        .join(broadcast(sz.select(col("l_suppkey").as("s_y"), col("n_parts").as("n_y"))), "s_y")
        .select(col("s_x"), col("s_y"), col("n_common"),
          graft.ops.TextOps.round6p(col("n_common").cast("double") /
            (col("n_x") + col("n_y") - col("n_common")).cast("double")).as("jaccard"))
        .orderBy(col("jaccard").desc, col("s_x"), col("s_y"))
        .limit(20)
    },

    // --- event path analysis: top 3-step event-type sequences across
    // user timelines. Two leads over one window (one shuffle on
    // user_id), then a count — the product-analytics "path" report.
    QueryDef.sql(
      "q33_event_paths",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    LEAD(event_type, 1) OVER w AS e2,
        |    LEAD(event_type, 2) OVER w AS e3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_type"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat(col("event_type"), lit(">"), col("e2"), lit(">"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(15)
    },

    // --- fixed-width histogram + cumulative share: the aggregate runs
    // fully parallel (integer bucketing, partial+final); the running
    // share window sees only the ~30 bucket rows, never the fact table —
    // the scale-correct alternative to a global NTILE sort.
    QueryDef.sql(
      "q34_price_histogram",
      """WITH h AS (SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |  FROM orders GROUP BY 1)
        |SELECT h.bucket, h.n, h.bucket_value,
        |  floor((SUM(h.n) OVER (ORDER BY h.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
        |    / SUM(h.n) OVER ()::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS cum_share
        |FROM h ORDER BY h.bucket""".stripMargin) { (s, dir) =>
      // ONE fact-table scan: the total is the sum of the bucket counts,
      // recovered by a full-frame window over the ~30 bucket rows
      val h = Tables(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("bucket_value"))
      val run = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      h.select(col("bucket"), col("n"), col("bucket_value"),
          graft.ops.TextOps.round6p(sum(col("n")).over(run).cast("double") /
            sum(col("n")).over(all).cast("double")).as("cum_share"))
        .orderBy(col("bucket"))
    },
  )
}
