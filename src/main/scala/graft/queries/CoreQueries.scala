package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Core relational query surface (SURVEY.md §2.3): scans, projection/filter,
 * the join family (shuffle, broadcast, semi, anti, theta, as-of), hash/sort
 * aggregation, rollup/cube, distinct aggregation, windows, set ops, top-k,
 * and the scalar-function families (string/date/json/math/array).
 *
 * Everything is built with `org.apache.spark.sql.functions` so Catalyst can
 * push filters/projections into the parquet scans and keep the whole pipeline
 * inside whole-stage codegen; `broadcast()` hints mark the genuinely small
 * dimension sides so no shuffle happens for them at any scale factor.
 */
object CoreQueries {

  import Tables.table

  private val Dec2 = "decimal(18,2)"
  private val Dec4 = "decimal(18,4)"

  /** Exact sum of a 2-decimal money column, returned as double. */
  private def msum(c: org.apache.spark.sql.Column) = c.cast(Dec2)
  private def psum(c: org.apache.spark.sql.Column) = c.cast(Dec4)

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q01
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(msum(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(msum(col("l_extendedprice"))).cast("double").as("sum_base"),
            sum(psum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .cast("double").as("sum_disc"),
            count(lit(1)).as("n"))
          .withColumn("avg_qty", col("sum_qty") / col("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      "TPC-H Q1 shape: partial+final hash aggregation with decimal-exact measures."),

    // ---------------------------------------------------------------- q02
    Q(
      "q02_filter_project",
      (s, dir) =>
        table(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= lit(0.06) && col("l_quantity") < lit(10.0))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.06 AND l_quantity < 10.0
        ORDER BY l_orderkey, l_linenumber"""),
      "Selective filter + narrow projection; both must reach the parquet scan as PushedFilters/ReadSchema."),

    // ---------------------------------------------------------------- q03
    Q(
      "q03_revenue_by_nation",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            sum(psum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name"""),
      "Star join: two big-side shuffle joins + broadcast dims (nation/region never shuffle)."),

    // ---------------------------------------------------------------- q04
    Q(
      "q04_brand_volume",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val p = table(s, dir, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            sum(msum(col("l_quantity"))).cast("double").as("total_qty"),
            count(lit(1)).as("n_lines"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand"""),
      "Broadcast hash join against the part dimension (no shuffle of the fact side)."),

    // ---------------------------------------------------------------- q05
    Q(
      "q05_semi_join_segments",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      "Left-semi join (EXISTS): customers holding at least one finished order."),

    // ---------------------------------------------------------------- q06
    Q(
      "q06_anti_join_idle_parts",
      (s, dir) => {
        val p = table(s, dir, "part")
        val li = table(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        p.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_idle"), min("p_partkey").as("first_partkey"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n_idle, MIN(p_partkey) AS first_partkey
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey
                            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY p_brand ORDER BY p_brand"""),
      "Left-anti join (NOT EXISTS): parts with no 1997 shipment."),

    // ---------------------------------------------------------------- q07
    Q(
      "q07_theta_join_late_ship",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        li.join(
            o,
            col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_late"),
            sum(psum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .cast("double").as("late_revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_late,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS late_revenue
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "Equi join with an extra theta (range) condition: lines shipped >60 days after ordering."),

    // ---------------------------------------------------------------- q08
    Q(
      "q08_asof_last_order",
      (s, dir) => {
        // As-of join: for each event, the single most recent order (per
        // derived user key) dated at-or-before the event timestamp.
        //
        // Scalable formulation: instead of joining every event to every
        // earlier order of its user (quadratic blowup per user) and ranking,
        // union both streams on a common (user, time) axis and carry the
        // latest order forward with last(ignoreNulls) — ONE shuffle by user
        // key, one sort, O(rows) total. This is the shape that survives
        // 100 TB; the DuckDB oracle keeps the naive join+rank spelling,
        // which is result-equivalent.
        //
        // o_orderdate is TIMESTAMP_NTZ from parquet; session TZ is UTC so the
        // cast to TIMESTAMP is value-preserving and unix_millis applies.
        val o = table(s, dir, "orders")
        val ev = table(s, dir, "events")
        val users = ev.agg((max(col("user_id")) + lit(1)).as("u"))
        // The union+carry-forward machinery lives in the reusable operator
        // (graft.operators.AsofJoin) — this query is its library use-site.
        // "<=" visibility and greatest-o_orderkey ties match the oracle's
        // ORDER BY ord_ms DESC, o_orderkey DESC rank.
        val orderSide = o.crossJoin(broadcast(users)).select(
          (col("o_custkey") % col("u")).as("ukey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"),
          col("o_orderkey"), col("o_totalprice"))
        val eventSide = ev.select(
          col("user_id").cast("long").as("ukey"),
          unix_millis(col("ts")).as("ev_ms"),
          col("event_id"))
        graft.operators.AsofJoin
          .backward(eventSide, orderSide, Seq("ukey"), "ev_ms", "ord_ms",
            tieBreak = Seq("o_orderkey"), dropUnmatched = true)
          .select(
            col("event_id"),
            col("asof.o_orderkey").as("o_orderkey"),
            col("asof.ord_ms").as("ord_ms"),
            col("asof.o_totalprice").as("o_totalprice"))
          .orderBy("event_id")
      },
      Some("""
        WITH u AS (SELECT MAX(user_id) + 1 AS u FROM events),
        j AS (
          SELECT e.event_id, o.o_orderkey, epoch_ms(o.o_orderdate) AS ord_ms, o.o_totalprice,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY epoch_ms(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
          FROM events e CROSS JOIN u
          JOIN orders o
            ON o.o_custkey % u.u = e.user_id
           AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)
        )
        SELECT event_id, o_orderkey, ord_ms, o_totalprice FROM j WHERE rn = 1
        ORDER BY event_id"""),
      "As-of join: latest order at-or-before each event's timestamp (tick-data style " +
        "nearest-earlier match), one row per event. Millisecond-epoch comparisons keep " +
        "Spark (micros) and DuckDB (nanos) timestamp precision in agreement."),

    // ---------------------------------------------------------------- q09
    Q(
      "q09_window_topn_orders",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      "Per-group top-N via ranking window."),

    // ---------------------------------------------------------------- q10
    Q(
      "q10_window_lag_delta",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy(unix_millis(col("ts")), col("event_id"))
        ev.withColumn("delta", col("value") - lag("value", 1).over(w))
          .select("event_id", "user_id", "value", "delta")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, value,
               value - lag(value, 1) OVER (PARTITION BY user_id
                                           ORDER BY epoch_ms(ts), event_id) AS delta
        FROM events ORDER BY event_id"""),
      "lag() deltas per user; raw double subtraction is bit-identical across engines."),

    // ---------------------------------------------------------------- q11
    Q(
      "q11_window_moving_sum",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val w = Window.partitionBy("user_id")
          .orderBy(unix_millis(col("ts")), col("event_id"))
          .rowsBetween(-2, 0)
        ev.withColumn("mov_sum", sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
          .withColumn("mov_n", count(lit(1)).over(w))
          .select("event_id", "user_id", "mov_sum", "mov_n")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
        FROM events ORDER BY event_id"""),
      "Sliding-frame aggregation (3-row moving sum), decimal-exact inside the frame."),

    // ---------------------------------------------------------------- q12
    Q(
      "q12_rollup_lineitem",
      (s, dir) =>
        table(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            sum(msum(col("l_quantity"))).cast("double").as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
            coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
            col("n"), col("sum_qty"))
          .orderBy("rf", "ls"),
      Some("""
        SELECT COALESCE(l_returnflag, '(all)') AS rf,
               COALESCE(l_linestatus, '(all)') AS ls,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls"""),
      "ROLLUP hierarchy totals; grouping nulls canonicalized to '(all)'."),

    // ---------------------------------------------------------------- q13
    Q(
      "q13_cube_orders",
      (s, dir) =>
        table(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(msum(col("o_totalprice"))).cast("double").as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("sum_price"))
          .orderBy("status", "priority"),
      Some("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status, priority"""),
      "CUBE over two dimensions."),

    // ---------------------------------------------------------------- q14
    Q(
      "q14_distinct_agg",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
            count(lit(1)).as("n_lines"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "Distinct aggregation incl. multi-column distinct (expand + two-phase agg in Spark)."),

    // ---------------------------------------------------------------- q15
    Q(
      "q15_setop_intersect",
      (s, dir) => {
        val o = table(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
          .orderBy("custkey")
      },
      Some("""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey"""),
      "INTERSECT (distinct-based): customers holding both open and finished orders."),

    // ---------------------------------------------------------------- q16
    Q(
      "q16_setop_symdiff",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
        val b = o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey"))
        // except() outputs are distinct and provably disjoint, so the union
        // needs no extra dedup pass
        a.except(b).union(b.except(a)).orderBy("custkey")
      },
      Some("""
        SELECT DISTINCT custkey FROM (
          (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
           EXCEPT
           SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P')
          UNION
          (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
           EXCEPT
           SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'))
        ORDER BY custkey"""),
      "EXCEPT + UNION composed into a symmetric difference."),

    // ---------------------------------------------------------------- q17
    Q(
      "q17_global_topk",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(15)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15"""),
      "Global top-k: Spark plans TakeOrderedAndProject (per-partition top-k, driver merge — no full sort)."),

    // ---------------------------------------------------------------- q18
    Q(
      "q18_string_funcs",
      (s, dir) =>
        table(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            substring(col("p_type"), 1, 5).as("type_prefix"),
            length(col("p_name")).as("name_len"),
            concat(col("p_brand"), lit("::"), col("p_type")).as("brand_type"),
            levenshtein(col("p_brand"), lit("Brand#13")).as("brand_dist"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               LENGTH(p_name) AS name_len,
               p_brand || '::' || p_type AS brand_type,
               LEVENSHTEIN(p_brand, 'Brand#13') AS brand_dist
        FROM part ORDER BY p_partkey"""),
      "String scalar family: case, substring, length, concat, edit distance."),

    // ---------------------------------------------------------------- q19
    Q(
      "q19_date_agg",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"))
          .agg(
            count(lit(1)).as("n"),
            sum(msum(col("o_totalprice"))).cast("double").as("sum_price"))
          .orderBy("y", "m"),
      Some("""
        SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
        ORDER BY y, m"""),
      "Date-part extraction + monthly aggregation."),

    // ---------------------------------------------------------------- q20
    Q(
      "q20_json_extract",
      (s, dir) =>
        table(s, dir, "events")
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "JSON field extraction from the events props column + exact integer aggregation."),

    // ---------------------------------------------------------------- q21
    Q(
      "q21_math_funcs",
      (s, dir) =>
        table(s, dir, "lineitem")
          .filter(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            sqrt(col("l_quantity")).as("sqrt_qty"),
            floor(col("l_extendedprice") / 1000.0).as("price_k"),
            abs(col("l_discount") - col("l_tax")).as("disc_tax_gap"),
            (col("l_quantity") % 7.0).as("qty_mod7"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
               SQRT(l_quantity) AS sqrt_qty,
               CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
               ABS(l_discount - l_tax) AS disc_tax_gap,
               FMOD(l_quantity, 7.0) AS qty_mod7
        FROM lineitem WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, l_linenumber"""),
      "Deterministic math scalars (sqrt/floor/abs/fmod are IEEE-exact; no libm-divergent fns)."),

    // ---------------------------------------------------------------- q22
    Q(
      "q22_array_norms",
      (s, dir) =>
        table(s, dir, "embeddings")
          .select(col("vec_id"), explode(col("embedding")).as("x"))
          .groupBy("vec_id")
          .agg(
            count(lit(1)).as("dim"),
            sum((col("x").cast("double") * col("x").cast("double")).cast("decimal(28,12)"))
              .cast("double").as("norm2"))
          .orderBy("vec_id"),
      Some("""
        SELECT vec_id, COUNT(*) AS dim,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS norm2
        FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings)
        GROUP BY vec_id ORDER BY vec_id"""),
      "Array processing over embeddings: explode + decimal-exact squared-norm aggregation."),

    // ---------------------------------------------------------------- q37
    Q(
      "q37_map_funcs",
      (s, dir) =>
        table(s, dir, "events")
          .filter(col("event_id") % 10 === 0)
          .withColumn(
            "m",
            map_from_arrays(
              array(lit("type"), lit("k")),
              array(col("event_type"), get_json_object(col("props"), "$.k"))))
          .select(
            col("event_id"),
            element_at(col("m"), "type").as("mtype"),
            element_at(col("m"), "k").cast("long").as("mk"),
            size(col("m")).as("m_size"),
            concat_ws(",", map_keys(col("m"))).as("m_keys"))
          .orderBy("event_id"),
      Some("""
        SELECT event_id,
               m['type'][1] AS mtype,
               CAST(m['k'][1] AS BIGINT) AS mk,
               CAST(cardinality(m) AS INTEGER) AS m_size,
               array_to_string(map_keys(m), ',') AS m_keys
        FROM (SELECT event_id,
                     map(['type', 'k'], [event_type, json_extract_string(props, '$.k')]) AS m
              FROM events)
        WHERE event_id % 10 = 0
        ORDER BY event_id"""),
      "Map scalar family: construction from arrays, key extraction, cardinality, key listing."),

    // ---------------------------------------------------------------- q39
    Q(
      "q39_topk_per_group_agg",
      (s, dir) => {
        import s.implicits._
        // Custom typed Aggregator (UDAF): top-3 events by value per type via
        // a k-bounded buffer — shuffle volume O(groups x k), not O(rows) like
        // the ranking-window spelling (the DuckDB oracle uses the window
        // spelling; both must agree exactly).
        val typed = table(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value"))
          .as[(String, Long, Double)]
        typed
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(new graft.operators.TopKByValue(3).toColumn.name("top"))
          .flatMap { case (eventType, top) =>
            top.iterator.zipWithIndex.map { case ((id, v), i) =>
              (eventType, i + 1, id, v)
            }
          }
          .toDF("event_type", "rank", "event_id", "value")
          .orderBy("event_type", "rank")
      },
      Some("""
        SELECT event_type, rank, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id ASC) AS rank
          FROM events)
        WHERE rank <= 3 ORDER BY event_type, rank"""),
      "Per-group exact top-k via a custom typed Aggregator (k-bounded buffer with " +
        "map-side combine) — the scale-friendly alternative to a ranking window."),

    // ---------------------------------------------------------------- q40
    Q(
      "q40_sessionize",
      (s, dir) => {
        // Gap-based sessionization (the conversation-splitting op of a
        // training-data pipeline): a new session starts when a user is idle
        // > 30 minutes. Two stacked windows: lag -> boundary flag, then a
        // running sum of flags numbers the sessions. All integer-ms
        // arithmetic, so cross-engine exact.
        val ev = table(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy(unix_millis(col("ts")), col("event_id"))
        ev.withColumn("ms", unix_millis(col("ts")))
          .withColumn(
            "new_session",
            when(col("ms") - lag("ms", 1).over(w) > 30L * 60 * 1000 ||
              lag("ms", 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("session_no", sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_no")
          .agg(
            count(lit(1)).as("n_events"),
            min("ms").as("start_ms"),
            max("ms").as("end_ms"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
          .orderBy("user_id", "session_no")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts), 1)
                        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 30 * 60 * 1000
                      OR lag(epoch_ms(ts), 1)
                        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        sessions AS (
          SELECT user_id, value, ms,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
          FROM flagged)
        SELECT user_id, session_no, COUNT(1) AS n_events,
               MIN(ms) AS start_ms, MAX(ms) AS end_ms,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        FROM sessions GROUP BY user_id, session_no
        ORDER BY user_id, session_no"""),
      "Gap-based sessionization (30-min idle threshold) via stacked windows + aggregation — " +
        "one shuffle by user, integer-ms exact across engines."),

    // ---------------------------------------------------------------- q41
    Q(
      "q41_percentiles",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            expr("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
            expr("round(percentile(o_totalprice, 0.9), 4)").as("p90"),
            expr("round(percentile(o_totalprice, 0.99), 4)").as("p99"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      "Exact linear-interpolated percentiles per group (Spark percentile = DuckDB " +
        "quantile_cont; both interpolate on the sorted values, rounded to dodge last-bit " +
        "interpolation arithmetic differences)."),

    // ---------------------------------------------------------------- q42
    Q(
      "q42_pivot_status",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(sum(msum(col("o_totalprice"))).cast("double"))
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "Pivot (long->wide conditional aggregation) with explicit value list — with values " +
        "supplied, Spark skips the extra distinct-values job, so it stays one shuffle."),

    // ---------------------------------------------------------------- q43
    Q(
      "q43_rank_distribution",
      (s, dir) => {
        // Distribution functions over a tie-broken total order, WITHOUT
        // Window.partitionBy(c_mktsegment): 5 key values would give one
        // task per segment, sorting each segment's full row set in a single
        // task at scale. The two-phase GlobalRank operator bucket-bounds
        // every sort (percentile-sketch boundaries -> local rank -> offset
        // arithmetic) and percent_rank/cume_dist/ntile then derive from the
        // exact global rank by the same integer/double arithmetic both
        // engines use — so the window-function oracle is unchanged.
        import graft.operators.GlobalRank
        GlobalRank.withGlobalRank(
            table(s, dir, "customer"), "c_mktsegment", "c_acctbal", "c_custkey")
          .select(
            col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            col("rn"),
            expr(GlobalRank.ntileExpr("rn", "n_seg", 4)).as("quartile"),
            when(col("n_seg") === 1, lit(0.0))
              .otherwise((col("rn") - 1) / (col("n_seg") - 1)).as("pr"),
            (col("rn") / col("n_seg")).as("cd"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               row_number() OVER w AS rn,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey"""),
      "Rank-distribution windows (row_number/ntile/percent_rank/cume_dist) — one shuffle " +
        "by segment; per-partition sort is the only cost at scale."),

    // ---------------------------------------------------------------- q44
    Q(
      "q44_corr_stats",
      (s, dir) => {
        // Correlation/covariance/stddev per group WITHOUT the built-in corr():
        // the moments (n, Σx, Σy, Σx², Σy², Σxy) are summed exactly in
        // DECIMAL (inputs have 2 decimals, so squares/products terminate at
        // 4), then the textbook formulas run in double with the identical
        // expression shape on both engines — deterministic to the last bit.
        // Built-in corr() would stream doubles in engine-specific order and
        // drift in the low bits.
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("l_quantity").cast(Dec2)).cast("double").as("sx"),
            sum(col("l_extendedprice").cast(Dec2)).cast("double").as("sy"),
            sum((col("l_quantity") * col("l_quantity")).cast("decimal(28,4)"))
              .cast("double").as("sxx"),
            sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(28,4)"))
              .cast("double").as("syy"),
            sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(28,4)"))
              .cast("double").as("sxy"))
          // round(…, 6): the DECIMAL->DOUBLE conversion of the moments can
          // land 1 ulp apart between engines (Spark converts via BigDecimal,
          // DuckDB via scaled-int128 arithmetic), so the derived doubles are
          // emitted at 6 decimals; the moments themselves stay exact.
          .withColumn("covar_samp", expr("round((sxy - sx * sy / n) / (n - 1), 6)"))
          .withColumn("stddev_x", expr("round(sqrt((sxx - sx * sx / n) / (n - 1)), 6)"))
          .withColumn("stddev_y", expr("round(sqrt((syy - sy * sy / n) / (n - 1)), 6)"))
          .withColumn("corr_xy", expr("round(((sxy - sx * sy / n) / (n - 1)) / (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))), 6)"))
          .select("l_returnflag", "n", "covar_samp", "stddev_x", "stddev_y", "corr_xy")
          .orderBy("l_returnflag")
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
               ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_x,
               ROUND(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS stddev_y,
               ROUND(((sxy - sx * sy / n) / (n - 1)) / (sqrt((sxx - sx * sx / n) / (n - 1)) * sqrt((syy - sy * sy / n) / (n - 1))), 6) AS corr_xy
        FROM m ORDER BY l_returnflag"""),
      "Correlation/covariance/stddev per group from exact decimal moments + identical " +
        "double formulas — map-side-combinable (6 sums), unlike a naive two-pass variance."),

    // ---------------------------------------------------------------- q45
    Q(
      "q45_range_join_events",
      (s, dir) => {
        // Equi + range join: per purchase event, the same user's activity in
        // the following 24 hours. The user-key equality keeps this a plain
        // shuffle join with the time range as a residual predicate — the
        // formulation that scales; a pure interval join (no equality key)
        // would need time-bucket blocking (see SCALE.md).
        val ev = table(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase").select(
          col("event_id").as("anchor_id"),
          col("user_id").as("ukey"),
          unix_millis(col("ts")).as("start_ms"))
        val activity = ev.select(
          col("user_id").as("ukey"),
          col("event_id"),
          unix_millis(col("ts")).as("ev_ms"),
          col("value"))
        purchases.join(
            activity,
            purchases("ukey") === activity("ukey") &&
              col("ev_ms") > col("start_ms") &&
              col("ev_ms") <= col("start_ms") + lit(24L * 3600 * 1000))
          .groupBy("anchor_id", "start_ms")
          .agg(
            count(lit(1)).as("n_follow"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("follow_value"))
          .orderBy("anchor_id")
      },
      Some("""
        SELECT p.event_id AS anchor_id, epoch_ms(p.ts) AS start_ms,
               COUNT(1) AS n_follow,
               CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS follow_value
        FROM events p
        JOIN events e
          ON e.user_id = p.user_id
         AND epoch_ms(e.ts) > epoch_ms(p.ts)
         AND epoch_ms(e.ts) <= epoch_ms(p.ts) + 24 * 3600 * 1000
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, epoch_ms(p.ts)
        ORDER BY p.event_id"""),
      "Equi+range join (purchase -> same user's events in the next 24 h) with decimal-" +
        "exact value sums; the equality key avoids the quadratic interval-join plan."),

    // ---------------------------------------------------------------- q46
    Q(
      "q46_salted_join",
      (s, dir) => {
        // Skew-mitigation pattern, verifiable: the fact side gets a
        // deterministic salt (l_linenumber % 8), the dimension side is
        // replicated across all 8 salt values, and the join key becomes
        // (orderkey, salt) — a hot orderkey now spreads over 8 reducers.
        // The result is provably identical to the unsalted join, which is
        // exactly what the oracle runs.
        val salts = explode(sequence(lit(0), lit(7))).as("salt")
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), salts)
        val li = table(s, dir, "lineitem")
          .withColumn("salt", pmod(col("l_linenumber"), lit(8)))
        li.join(o, li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
          .groupBy("o_orderpriority")
          .agg(
            sum(psum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(1) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""),
      "Salted join: deterministic 8-way key salting (replicate dim x salt, spread fact) — " +
        "the manual hot-key remedy AQE skew-join automates; result provably equals the plain join."),

    // ---------------------------------------------------------------- q47
    Q(
      "q47_unpivot",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            sum(msum(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(msum(col("l_extendedprice"))).cast("double").as("sum_base"))
          .select(
            col("l_returnflag"),
            expr("stack(2, 'sum_qty', sum_qty, 'sum_base', sum_base) as (measure, value)"))
          .orderBy("l_returnflag", "measure"),
      Some("""
        WITH agg AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, m.measure, m.value
        FROM agg, LATERAL (VALUES ('sum_qty', sum_qty), ('sum_base', sum_base)) AS m(measure, value)
        ORDER BY l_returnflag, m.measure"""),
      "Unpivot (wide->long) via stack() — a generator projection, no extra shuffle beyond " +
        "the feeding aggregation."),

    // ---------------------------------------------------------------- q51
    Q(
      "q51_ohlc_resample",
      (s, dir) => {
        // Time-bucket resampling (tick-data OHLC bars): 15-minute buckets per
        // event type; open/close are the first/last values by a UNIQUE
        // (ms, event_id) order, so ties at the same millisecond can never
        // pick different rows across engines. Two stacked passes, one
        // shuffle: ranking window by (type, bucket), then the bar aggregate.
        val ev = table(s, dir, "events")
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("bucket_ms", (col("ms") / lit(900000L)).cast("long") * lit(900000L))
        val w = Window.partitionBy("event_type", "bucket_ms")
        val asc = w.orderBy(col("ms").asc, col("event_id").asc)
        val desc = w.orderBy(col("ms").desc, col("event_id").desc)
        ev.withColumn("rn_open", row_number().over(asc))
          .withColumn("rn_close", row_number().over(desc))
          .groupBy("event_type", "bucket_ms")
          .agg(
            max(when(col("rn_open") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rn_close") === 1, col("value"))).as("close"),
            count(lit(1)).as("n_ticks"))
          .orderBy("event_type", "bucket_ms")
      },
      Some("""
        WITH t AS (
          SELECT event_type, value, event_id, epoch_ms(ts) AS ms,
                 (epoch_ms(ts) // 900000) * 900000 AS bucket_ms
          FROM events),
        ranked AS (
          SELECT *,
            row_number() OVER (PARTITION BY event_type, bucket_ms
                               ORDER BY ms ASC, event_id ASC) AS rn_open,
            row_number() OVER (PARTITION BY event_type, bucket_ms
                               ORDER BY ms DESC, event_id DESC) AS rn_close
          FROM t)
        SELECT event_type, bucket_ms,
               MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
               COUNT(1) AS n_ticks
        FROM ranked GROUP BY event_type, bucket_ms
        ORDER BY event_type, bucket_ms"""),
      "Time-bucket resampling to OHLC bars (the tick-data downsampling op): unique " +
        "(ms, id) first/last election + min/max/count per 15-minute bucket."),

    // ---------------------------------------------------------------- q52
    Q(
      "q52_histogram",
      (s, dir) => {
        // Equal-width histogram of order totals: bounds come from one tiny
        // broadcast aggregate; bin membership is integer arithmetic on the
        // raw doubles (identical in both engines), clamped so max lands in
        // the last bin. Map-only + one #bins-sized aggregation.
        val o = table(s, dir, "orders")
        val bounds = o.agg(
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
        o.crossJoin(broadcast(bounds))
          .withColumn("bin",
            least(
              floor((col("o_totalprice") - col("lo")) / ((col("hi") - col("lo")) / lit(20))),
              lit(19L)).cast("long"))
          .groupBy("bin")
          .agg(
            count(lit(1)).as("n"),
            round(min("o_totalprice"), 2).as("bin_min"),
            round(max("o_totalprice"), 2).as("bin_max"))
          .orderBy("bin")
      },
      Some("""
        WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
        SELECT LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)), 19)::BIGINT AS bin,
               COUNT(1) AS n,
               ROUND(MIN(o_totalprice), 2) AS bin_min,
               ROUND(MAX(o_totalprice), 2) AS bin_max
        FROM orders CROSS JOIN b
        GROUP BY 1 ORDER BY 1"""),
      "Equal-width 20-bin histogram: broadcast bounds + integer bin arithmetic — " +
        "map-only binning, aggregation output is #bins rows at any scale."),

    // ---------------------------------------------------------------- q53
    Q(
      "q53_grouping_sets",
      (s, dir) => {
        // Arbitrary GROUPING SETS (not the rollup/cube lattices of q12/q13):
        // exactly {(status, priority), (status), (priority)} — via the SQL
        // entry path, exercising spark.sql() over a registered view. Same
        // one-shuffle Expand-based plan as rollup/cube.
        table(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT coalesce(o_orderstatus, '(all)') AS status,
                 coalesce(o_orderpriority, '(all)') AS priority,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                 COUNT(1) AS n
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                  (o_orderstatus), (o_orderpriority))
          ORDER BY status, priority""")
      },
      Some("""
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               COUNT(1) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        ORDER BY status, priority"""),
      "Arbitrary GROUPING SETS through the spark.sql entry path — the Expand-based " +
        "multi-grouping plan with exact decimal measures, group-key NULLs coalesced."),

    // ---------------------------------------------------------------- q58
    Q(
      "q58_approx_percentiles",
      (s, dir) => {
        // The scale-safe companion to q41: the headline aggregate holds a
        // FIXED-SIZE quantile sketch (approx_percentile / Greenwald-Khanna,
        // rank error <= 1/1000), not q41's full per-group value buffer —
        // the plan a 100 TB percentile job actually runs. Correctness is
        // oracled the q36 way: exact percentiles anchor the hash, and each
        // sketch estimate must land inside the exact [p-0.01, p+0.01]
        // value bracket (10x the sketch's guaranteed rank error, so the
        // contract is deterministic, not flaky). The exact-bracket
        // aggregate exists only to validate at test SF; the 3-row join is
        // broadcast-trivial.
        val o = table(s, dir, "orders")
        val approx = o.groupBy("o_orderstatus").agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("a50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("a90"),
          expr("approx_percentile(o_totalprice, 0.99, 1000)").as("a99"),
          count(lit(1)).as("n"))
        val brackets = o.groupBy("o_orderstatus").agg(
          expr("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
          expr("round(percentile(o_totalprice, 0.9), 4)").as("p90"),
          expr("round(percentile(o_totalprice, 0.99), 4)").as("p99"),
          expr("percentile(o_totalprice, 0.49)").as("lo50"),
          expr("percentile(o_totalprice, 0.51)").as("hi50"),
          expr("percentile(o_totalprice, 0.89)").as("lo90"),
          expr("percentile(o_totalprice, 0.91)").as("hi90"),
          expr("percentile(o_totalprice, 0.98)").as("lo99"),
          max("o_totalprice").as("hi99"))
        approx.join(broadcast(brackets), Seq("o_orderstatus"))
          .select(
            col("o_orderstatus"), col("p50"), col("p90"), col("p99"), col("n"),
            (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("a50_in_bracket"),
            (col("a90") >= col("lo90") && col("a90") <= col("hi90")).as("a90_in_bracket"),
            (col("a99") >= col("lo99") && col("a99") <= col("hi99")).as("a99_in_bracket"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
               COUNT(*) AS n,
               TRUE AS a50_in_bracket,
               TRUE AS a90_in_bracket,
               TRUE AS a99_in_bracket
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      "Bounded-memory percentiles: approx_percentile sketch aggregate (the 100 TB " +
        "plan) contract-checked against exact quantile brackets — sketch estimates " +
        "must land within the exact [p-0.01, p+0.01] value bracket (10x the sketch's " +
        "rank-error bound), oracled as literal TRUE the q36 way."),

    // ---------------------------------------------------------------- q59
    Q(
      "q59_asof_next_order",
      (s, dir) => {
        // Forward + tolerance as-of: for each event, the user's EARLIEST
        // order at-or-after the event, but only within 7 days — the "next
        // fill within the window, else no match" tick-data ask. Same
        // union+carry operator shape as q08 (one shuffle, no join in the
        // plan); left outer, so events with no order inside the window
        // surface with nulls and the tolerance nulling itself is oracled.
        val o = table(s, dir, "orders")
        val ev = table(s, dir, "events")
        val users = ev.agg((max(col("user_id")) + lit(1)).as("u"))
        val orderSide = o.crossJoin(broadcast(users)).select(
          (col("o_custkey") % col("u")).as("ukey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"),
          col("o_orderkey"))
        val eventSide = ev.select(
          col("user_id").cast("long").as("ukey"),
          unix_millis(col("ts")).as("ev_ms"),
          col("event_id"))
        graft.operators.AsofJoin
          .forward(eventSide, orderSide, Seq("ukey"), "ev_ms", "ord_ms",
            tieBreak = Seq("o_orderkey"), tolerance = Some(7L * 24 * 3600 * 1000))
          .select(
            col("event_id"), col("ev_ms"),
            col("asof.o_orderkey").as("o_orderkey"),
            col("asof.ord_ms").as("ord_ms"))
          .orderBy("event_id")
      },
      Some("""
        WITH u AS (SELECT MAX(user_id) + 1 AS u FROM events),
        j AS (
          SELECT e.event_id, o.o_orderkey, epoch_ms(o.o_orderdate) AS ord_ms,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY epoch_ms(o.o_orderdate) ASC, o.o_orderkey ASC) AS rn
          FROM events e CROSS JOIN u
          JOIN orders o
            ON o.o_custkey % u.u = e.user_id
           AND epoch_ms(o.o_orderdate) >= epoch_ms(e.ts)
           AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts) + 7 * 24 * 3600 * 1000)
        SELECT e.event_id, epoch_ms(e.ts) AS ev_ms, j.o_orderkey, j.ord_ms
        FROM events e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON e.event_id = j.event_id
        ORDER BY e.event_id"""),
      "Forward as-of with tolerance: earliest order at-or-after each event within " +
        "7 days, else null — the bounded-window nearest-later match, one window pass, " +
        "no join in the physical plan."),

    // ---------------------------------------------------------------- q61
    Q(
      "q61_concurrent_sessions",
      (s, dir) => {
        // PURE interval join — no equality key: for every event, how many
        // OTHER users had an active session at that instant. Without
        // blocking this is a BroadcastNestedLoopJoin (points x intervals);
        // the RangeJoin operator turns it into an equi-join on 1-hour time
        // bins (each pair meets exactly once, in the point's bin). Sessions
        // come from the same gap rule as q40, via the Sessionize operator.
        val base = table(s, dir, "events").select(
          col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
        val sess = graft.operators.Sessionize
          .byGap(base, Seq("user_id"), "ms", 30L * 60 * 1000, Seq("event_id"))
          .groupBy(col("user_id").as("s_user"), col("session_no"))
          .agg(min("ms").as("start_ms"), max("ms").as("end_ms"))
          .select("s_user", "start_ms", "end_ms")
        val pairs = graft.operators.RangeJoin
          .pointInInterval(base, sess, "ms", "start_ms", "end_ms",
            binWidth = 3600L * 1000)
          .filter(col("s_user") =!= col("user_id"))
        val counts = pairs.groupBy("event_id")
          .agg(count(lit(1)).as("n_other_active"))
        base.join(counts, Seq("event_id"), "left")
          .withColumn("n_other_active", coalesce(col("n_other_active"), lit(0L)))
          .select("event_id", "ms", "n_other_active")
          .orderBy("event_id")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts), 1)
                        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 30 * 60 * 1000
                      OR lag(epoch_ms(ts), 1)
                        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        numbered AS (
          SELECT user_id, ms,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
          FROM flagged),
        sess AS (
          SELECT user_id AS s_user, MIN(ms) AS start_ms, MAX(ms) AS end_ms
          FROM numbered GROUP BY user_id, session_no),
        pts AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events)
        SELECT p.event_id, p.ms, COUNT(s.s_user) AS n_other_active
        FROM pts p LEFT JOIN sess s
          ON s.start_ms <= p.ms AND p.ms <= s.end_ms AND s.s_user <> p.user_id
        GROUP BY p.event_id, p.ms
        ORDER BY p.event_id"""),
      "Concurrent-session load: a PURE point-in-interval join (no equi key) counting " +
        "other users' active sessions at each event instant — time-bucket blocking via " +
        "the RangeJoin operator instead of Spark's nested-loop fallback."),

    // ---------------------------------------------------------------- q63
    Q(
      "q63_full_outer_nation",
      (s, dir) => {
        // FULL OUTER join — the one join type the library didn't yet surface:
        // per-nation BUILDING-customer counts vs per-nation rich-supplier
        // counts. Thresholds leave BOTH sides with unmatched nations, so the
        // null-fill paths are actually exercised. Two partial aggregates
        // (25-key outputs) meet in a trivially small shuffle at any scale —
        // the full-outer itself is never the bottleneck, the pre-aggregation
        // is, and it is map-side combinable.
        val c = table(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .groupBy(col("c_nationkey").as("ckey")).agg(count(lit(1)).as("n_cust"))
        val su = table(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("skey")).agg(count(lit(1)).as("n_supp"))
        c.join(su, col("ckey") === col("skey"), "full_outer")
          .select(
            coalesce(col("ckey"), col("skey")).cast("long").as("nationkey"),
            col("ckey").isNotNull.as("has_building_cust"),
            col("skey").isNotNull.as("has_rich_supp"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""
        WITH c AS (SELECT c_nationkey AS ckey, COUNT(1) AS n_cust
                   FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
             s AS (SELECT s_nationkey AS skey, COUNT(1) AS n_supp
                   FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
        SELECT CAST(coalesce(ckey, skey) AS BIGINT) AS nationkey,
               ckey IS NOT NULL AS has_building_cust,
               skey IS NOT NULL AS has_rich_supp,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON ckey = skey
        ORDER BY nationkey"""),
      "Full outer join over two pre-aggregated 25-key sides with live unmatched rows " +
        "in both directions — aggregate-before-join keeps the outer join tiny at scale."),

    // ---------------------------------------------------------------- q64
    Q(
      "q64_exists_subqueries",
      (s, dir) => {
        // Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst
        // rewrites them to a left-semi and a left-anti hash join on
        // o_custkey — set-membership at scale without ever materializing
        // the subquery result per outer row.
        table(s, dir, "customer").createOrReplaceTempView("customer_v")
        table(s, dir, "orders").createOrReplaceTempView("orders_sq_v")
        s.sql("""
          SELECT c_custkey, c_mktsegment
          FROM customer_v c
          WHERE EXISTS (SELECT 1 FROM orders_sq_v o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
            AND NOT EXISTS (SELECT 1 FROM orders_sq_v o2
                            WHERE o2.o_custkey = c.c_custkey
                              AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 50000)
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 50000)
        ORDER BY c_custkey"""),
      "Correlated EXISTS and NOT EXISTS subqueries — Catalyst's semi/anti join " +
        "rewrite, the set-membership plan that scales (no per-row subquery execution)."),

    // ---------------------------------------------------------------- q65
    Q(
      "q65_scalar_subqueries",
      (s, dir) => {
        // Scalar subqueries, both flavors: a CORRELATED per-order lineitem
        // total (rewritten to an aggregate + left outer join) and an
        // UNCORRELATED global average (computed once, broadcast as a
        // literal). The exact-decimal sum/count division follows the
        // library-wide parity conventions; the derived delta is rounded
        // because it re-derives arithmetic from a decimal-cast double.
        table(s, dir, "orders").createOrReplaceTempView("orders_ssq_v")
        table(s, dir, "lineitem").createOrReplaceTempView("lineitem_ssq_v")
        s.sql("""
          SELECT o_orderkey, o_totalprice,
                 coalesce((SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                           FROM lineitem_ssq_v l WHERE l.l_orderkey = o.o_orderkey), 0.0) AS items_total,
                 round(o_totalprice -
                       (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
                        FROM orders_ssq_v o2), 4) AS delta_vs_avg
          FROM orders_ssq_v o
          WHERE o_totalprice > 400000
          ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_totalprice,
               coalesce((SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                         FROM lineitem l WHERE l.l_orderkey = o.o_orderkey), 0.0) AS items_total,
               round(o_totalprice -
                     (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
                      FROM orders o2), 4) AS delta_vs_avg
        FROM orders o
        WHERE o_totalprice > 400000
        ORDER BY o_orderkey"""),
      "Correlated + uncorrelated scalar subqueries: per-order lineitem totals via the " +
        "aggregate-join rewrite, global average as a one-shot broadcast literal."),

    // ---------------------------------------------------------------- q66
    Q(
      "q66_lateral_words",
      (s, dir) => {
        // LATERAL VIEW posexplode — the generator surface: one row per
        // (doc, position, word). Generate stays inside the scan stage
        // (map-only, no shuffle); the doc_id filter is pushed below the
        // generator into the parquet scan.
        table(s, dir, "documents").createOrReplaceTempView("documents_lv_v")
        s.sql("""
          SELECT doc_id, pos, word
          FROM documents_lv_v
          LATERAL VIEW posexplode(tokenize_text(text)) t AS pos, word
          WHERE doc_id < 40
          ORDER BY doc_id, pos""")
      },
      Some("""
        SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 40)
        ORDER BY doc_id, pos"""),
      "LATERAL VIEW posexplode over tokenized text — the generator operator, map-only " +
        "with the row filter pushed beneath it into the scan."),

    // ---------------------------------------------------------------- q67
    Q(
      "q67_mode_median",
      (s, dir) => {
        // Deterministic MODE per group: native mode() breaks frequency ties
        // arbitrarily (and differently per engine), so the mode is spelled
        // as count + row_number with a total tie order (cnt DESC, value ASC)
        // — same answer on both engines, every run. Median rides along as
        // exact percentile (the q41 family). The window runs over the
        // (flag, shipmode) AGGREGATE (tens of rows), never the data.
        val li = table(s, dir, "lineitem")
        val counts = li.groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("cnt").desc, col("l_quantity").asc)
        val mode = counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
            col("cnt").as("mode_n"))
        val med = li.groupBy("l_returnflag").agg(
          expr("round(percentile(l_quantity, 0.5), 4)").as("median_qty"),
          count(lit(1)).as("n"))
        mode.join(broadcast(med), Seq("l_returnflag"))
          .select("l_returnflag", "mode_qty", "mode_n", "median_qty", "n")
          .orderBy("l_returnflag")
      },
      Some("""
        WITH counts AS (
          SELECT l_returnflag, l_quantity, COUNT(1) AS cnt
          FROM lineitem GROUP BY 1, 2),
        m AS (
          SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY cnt DESC, l_quantity ASC) AS rn
          FROM counts),
        med AS (
          SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
                 COUNT(1) AS n
          FROM lineitem GROUP BY 1)
        SELECT m.l_returnflag, m.mode_qty, m.mode_n, med.median_qty, med.n
        FROM m JOIN med ON m.l_returnflag = med.l_returnflag
        WHERE m.rn = 1
        ORDER BY m.l_returnflag"""),
      "Deterministic mode (count + total-order tie-break, window over the aggregate " +
        "only) plus exact median per group — engine-stable where native mode() is not."),

    // ---------------------------------------------------------------- q68
    Q(
      "q68_twap",
      (s, dir) => {
        // Time-weighted average (TWAP) per user over the event stream: each
        // value holds until the user's next event, weight = that interval.
        // One shuffle on user_id shared by the lead() window and the
        // aggregate; value*dt goes through the exact-decimal sum and the
        // final division is rounded (decimal->double re-derivation rule).
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"), col("value"))
        val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
        ev.withColumn("dt", lead(col("ms"), 1).over(w) - col("ms"))
          .filter(col("dt").isNotNull)
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_gaps"),
            sum(col("dt")).as("total_ms"),
            sum((col("value") * col("dt")).cast("decimal(28,2)")).as("vdt"))
          .select(col("user_id"), col("n_gaps"), col("total_ms"),
            round(col("vdt").cast("double") / col("total_ms"), 6).as("twap"))
          .orderBy("user_id")
      },
      Some("""
        WITH g AS (
          SELECT user_id, value,
                 lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ms(ts), event_id)
                   - epoch_ms(ts) AS dt
          FROM events)
        SELECT user_id, COUNT(1) AS n_gaps, CAST(SUM(dt) AS BIGINT) AS total_ms,
               round(CAST(SUM(CAST(value * dt AS DECIMAL(28,2))) AS DOUBLE)
                     / CAST(SUM(dt) AS BIGINT), 6) AS twap
        FROM g WHERE dt IS NOT NULL
        GROUP BY user_id ORDER BY user_id"""),
      "Per-user time-weighted average value: lead() interval weights + exact decimal " +
        "weighted sum, one user-keyed shuffle for window and aggregate alike."),

    // ---------------------------------------------------------------- q76
    Q(
      "q76_grid_ffill",
      (s, dir) => {
        // Gap filling through the GridFill operator: each user's irregular
        // events project onto a regular DAILY grid, empty days carry the
        // last observation forward. The grid is generated DISTRIBUTED
        // (sequence+explode per key, never on the driver); in-slot
        // election and the fill window both shuffle once on user_id and
        // each task holds only one key's span/step rows. Timestamps are
        // normalized to millisecond instants first so in-slot ordering is
        // identical cross-engine (events.ts is nanos in DuckDB, micros in
        // Spark — a tie at one precision need not tie at the other).
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            timestamp_millis(unix_millis(col("ts"))).as("ts_ms"), col("value"))
        graft.operators.GridFill
          .forwardFill(ev, "user_id", "ts_ms", "value", "event_id", "day")
          .select(col("user_id"), unix_millis(col("slot")).as("slot_ms"),
            col("value_fill"), col("is_gap"))
          .orderBy("user_id", "slot_ms")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id,
                 make_timestamp(epoch_ms(ts) * 1000) AS ts_ms, value
          FROM events),
        b AS (
          SELECT user_id, date_trunc('day', min(ts_ms)) AS lo,
                 date_trunc('day', max(ts_ms)) AS hi
          FROM e GROUP BY user_id),
        grid AS (
          SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS slot
          FROM b),
        obs AS (
          SELECT user_id, date_trunc('day', ts_ms) AS slot, value,
                 row_number() OVER (PARTITION BY user_id, date_trunc('day', ts_ms)
                                    ORDER BY ts_ms DESC, event_id DESC) AS rn
          FROM e),
        j AS (
          SELECT g.user_id, g.slot, o.value
          FROM grid g
          LEFT JOIN (SELECT user_id, slot, value FROM obs WHERE rn = 1) o
            ON g.user_id = o.user_id AND g.slot = o.slot)
        SELECT user_id, epoch_ms(slot) AS slot_ms,
               LAST_VALUE(value IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY slot
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_fill,
               value IS NULL AS is_gap
        FROM j
        ORDER BY user_id, slot_ms"""),
      "Regular-grid resampling with forward fill via the GridFill operator: " +
        "distributed sequence+explode grid, deterministic in-slot election, " +
        "last(ignoreNulls) carry-forward — one user-keyed shuffle end to end."),

    // ---------------------------------------------------------------- q80
    Q(
      "q80_ewma",
      (s, dir) => {
        // Per-user EWMA through the Ewma operator: a genuinely sequential
        // recurrence (no associative window spelling exists), so the scale
        // shape is gather-once-fold-once — one user-keyed shuffle into a
        // sorted fold, task memory bounded by the longest single history.
        // The fold is fixed-order IEEE doubles: bit-identical in DuckDB,
        // whose list_reduce seeds with the first element exactly like the
        // operator's slice+element_at spelling.
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"), col("value"))
        graft.operators.Ewma
          .perKey(ev, "user_id", Seq("ms", "event_id"), "value", alpha = 0.3)
          .orderBy("user_id")
      },
      Some("""
        WITH h AS (
          SELECT user_id,
                 list(value ORDER BY epoch_ms(ts), event_id) AS vs
          FROM events GROUP BY user_id)
        SELECT user_id,
               CAST(len(vs) AS BIGINT) AS n_events,
               list_reduce(vs, (acc, x) -> CAST(0.3 AS DOUBLE) * x
                                         + CAST(0.7 AS DOUBLE) * acc) AS ewma
        FROM h
        ORDER BY user_id"""),
      "Per-user exponential moving average via the Ewma operator: sequential fold " +
        "over each key's sorted history — one shuffle, codegen'd lambda, " +
        "bit-identical doubles cross-engine (fixed fold order).")
,
    // ---------------------------------------------------------------- q81
    Q(
      "q81_sketch_rollup",
      (s, dir) => {
        // Re-aggregatable distinct counting: build ONE DataSketches HLL
        // per day, then answer every trailing-7-day window by UNIONING the
        // daily sketches — the pattern that lets a 100 TB pipeline keep
        // tiny daily partials and serve any window without rescanning raw
        // events (exact distinct is not re-aggregatable; sketches are).
        // The raw corpus is touched once (daily groupBy); the window join
        // runs over the 30-row sketch frame. Oracle: the q36 contract
        // pattern — exact anchor + a literal-TRUE accuracy boolean (the
        // sketch VALUE is engine-specific; its error bound is not).
        val ev = table(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val daily = ev.groupBy("day")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        val days = daily.select(col("day").as("d"))
        val rolled = days
          .join(daily, expr("day between date_sub(d, 6) and d"))
          .groupBy("d")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))
        val exact = days
          .join(ev, expr("day between date_sub(d, 6) and d"))
          .groupBy("d")
          .agg(countDistinct("user_id").as("exact_users"))
        exact.join(rolled, Seq("d"))
          .select(
            col("d"),
            col("exact_users"),
            (abs(col("est_users") - col("exact_users"))
              <= greatest(lit(5L), (col("exact_users") * 0.05).cast("long")))
              .as("sketch_within_tol"))
          .orderBy("d")
      },
      Some("""
        WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        days AS (SELECT DISTINCT day AS d FROM e)
        SELECT d, COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS sketch_within_tol
        FROM days JOIN e ON e.day BETWEEN d - 6 AND d
        GROUP BY d ORDER BY d"""),
      "Mergeable HLL sketch rollup: one sketch per day, trailing windows answered " +
        "by sketch UNION over the tiny daily frame — the re-aggregation property " +
        "exact distinct lacks; contract-checked against the exact anchor."),

    // ---------------------------------------------------------------- q84
    Q(
      "q84_zscore",
      (s, dir) => {
        // Per-group feature standardization (z-score): the q44 exact-moment
        // discipline applied to a PER-ROW output — group moments (n, Σx,
        // Σx²) sum exactly in DECIMAL, broadcast back to the rows (3-row
        // stats frame), and the standardized value derives in double with
        // the identical expression tree on both engines, rounded at 6 (the
        // decimal->double conversion's 1-ulp cross-engine slack). Shape at
        // scale: one map-side-combinable aggregate + a broadcast join —
        // the corpus never shuffles.
        val o = table(s, dir, "orders")
        val stats = o.groupBy("o_orderstatus").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("o_totalprice").cast(Dec2)).cast("double").as("sx"),
          sum((col("o_totalprice") * col("o_totalprice")).cast("decimal(28,4)"))
            .cast("double").as("sxx"))
        o.join(broadcast(stats), Seq("o_orderstatus"))
          .withColumn("z", expr(
            "round((o_totalprice - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6)"))
          .select("o_orderkey", "o_orderstatus", "z")
          .orderBy("o_orderkey")
      },
      Some("""
        WITH m AS (
          SELECT o_orderstatus,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sxx
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderkey, o.o_orderstatus,
               round((o_totalprice - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS z
        FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus
        ORDER BY o_orderkey"""),
      "Per-row z-score standardization against exact decimal group moments — " +
        "one combinable aggregate + broadcast join back; the feature-normalization " +
        "pass of a training pipeline, corpus never shuffled."),

    // ---------------------------------------------------------------- q86
    Q(
      "q86_funnel",
      (s, dir) => {
        // Funnel analysis (click -> view -> purchase) as a sequential fold
        // state machine over each user's time-ordered events — the Ewma
        // gather-once-fold-once shape with an integer-state automaton in
        // the lambda. No join per stage (the conditional-aggregation
        // spelling needs one pass per step and re-reads the corpus); one
        // user-keyed shuffle computes every user's furthest funnel stage.
        // State rides as strings '0'..'3' so DuckDB's init-less
        // list_reduce (seeded by a prepended '0') folds the identical
        // steps — results are small exact integers.
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"), col("event_type"))
        ev.groupBy("user_id")
          .agg(expr(
            """transform(array_sort(collect_list(named_struct(
                 'o0', ms, 'o1', event_id, 'v', event_type))), s -> s.v)""").as("tl"))
          .selectExpr(
            "user_id",
            "cast(size(tl) as bigint) as n_events",
            """cast(aggregate(tl, '0', (st, t) ->
                 case when st = '0' and t = 'click' then '1'
                      when st = '1' and t = 'view' then '2'
                      when st = '2' and t = 'purchase' then '3'
                      else st end) as int) as funnel_stage""")
          .orderBy("user_id")
      },
      Some("""
        WITH h AS (
          SELECT user_id,
                 list(event_type ORDER BY epoch_ms(ts), event_id) AS tl
          FROM events GROUP BY user_id)
        SELECT user_id,
               CAST(len(tl) AS BIGINT) AS n_events,
               CAST(list_reduce(list_prepend('0', tl), (st, t) ->
                 CASE WHEN st = '0' AND t = 'click' THEN '1'
                      WHEN st = '1' AND t = 'view' THEN '2'
                      WHEN st = '2' AND t = 'purchase' THEN '3'
                      ELSE st END) AS INTEGER) AS funnel_stage
        FROM h
        ORDER BY user_id"""),
      "Ordered funnel depth per user via a fold state machine — one shuffle, " +
        "one pass, no per-stage joins; automaton steps identical cross-engine."),

    // ---------------------------------------------------------------- q87
    Q(
      "q87_upsert",
      (s, dir) => {
        // SCD1 upsert through the Upsert operator: a synthetic change
        // batch (every 7th order re-priced, plus brand-new keys) merges
        // into orders — base pays a broadcast anti-join probe (no shuffle
        // of the history), updates append. The window spelling would
        // shuffle the whole base; this one stays viable when base is
        // 100 TB and the batch is a day's changes.
        val o = table(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val changed = o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        val fresh = o.filter(col("o_orderkey") % 1000 === 3)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
          .withColumn("o_orderstatus", lit("N"))
        graft.operators.Upsert.byKey(o, changed.unionByName(fresh),
            keyCols = Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        changed AS (
          SELECT o_orderkey, 'U' AS o_orderstatus,
                 o_totalprice + 1000.0 AS o_totalprice
          FROM base WHERE o_orderkey % 7 = 0),
        fresh AS (
          SELECT o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus,
                 o_totalprice
          FROM base WHERE o_orderkey % 1000 = 3),
        upd AS (SELECT * FROM changed UNION ALL SELECT * FROM fresh)
        SELECT * FROM (
          SELECT b.* FROM base b ANTI JOIN upd u ON b.o_orderkey = u.o_orderkey
          UNION ALL
          SELECT * FROM upd)
        ORDER BY o_orderkey"""),
      "Latest-wins keyed merge via the Upsert operator: broadcast anti-join of the " +
        "update keys + append — the history never shuffles; duplicate update keys " +
        "fail loudly instead of picking silently."),

    // ---------------------------------------------------------------- q89
    Q(
      "q89_scd2_history",
      (s, dir) => {
        // SCD2 history build: compress each user's event stream into
        // validity intervals of its tracked attribute (event_type) — the
        // gaps-and-islands pattern (change flag -> running island id ->
        // per-island [valid_from, valid_to)), which is how a dimension
        // history table is derived from a change log. One shuffle on
        // user_id serves both windows and the aggregate; the open row's
        // valid_to stays null. Complements q87 (SCD1 latest-wins) with
        // the full-history variant an as-of join (q08/q59) then consumes.
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"), col("event_type"))
          .withColumn("chg",
            when(lag("event_type", 1).over(w).isNull ||
              lag("event_type", 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("island", sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val wIsl = Window.partitionBy("user_id").orderBy("island")
        ev.groupBy("user_id", "island", "event_type")
          .agg(min("ms").as("valid_from_ms"), count(lit(1)).as("n_in_run"))
          .withColumn("valid_to_ms", lead("valid_from_ms", 1).over(wIsl))
          .select("user_id", "island", "event_type",
            "valid_from_ms", "valid_to_ms", "n_in_run")
          .orderBy("user_id", "island")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
                 CASE WHEN lag(event_type) OVER w IS NULL
                        OR lag(event_type) OVER w <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        isl AS (
          SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                      ORDER BY ms, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS island
          FROM e),
        runs AS (
          SELECT user_id, island, event_type,
                 MIN(ms) AS valid_from_ms, COUNT(1) AS n_in_run
          FROM isl GROUP BY user_id, island, event_type)
        SELECT user_id, island, event_type, valid_from_ms,
               lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY island)
                 AS valid_to_ms,
               n_in_run
        FROM runs
        ORDER BY user_id, island"""),
      "SCD2 interval build via gaps-and-islands: change flags -> running island " +
        "ids -> per-run validity windows, one user-keyed shuffle end to end — " +
        "the dimension-history derivation an as-of join consumes."),

    // ---------------------------------------------------------------- q93
    Q(
      "q93_kll_quantile_rollup",
      (s, dir) => {
        // Re-aggregatable quantiles — q81's precompute-partials pattern for
        // percentiles: one KLL sketch per ship-month (Spark 4's native
        // DataSketches kll_sketch_agg_double), global quantiles answered by
        // MERGING the tiny monthly frame instead of rescanning raw rows.
        // Exact percentile buffers every value and cannot re-aggregate;
        // KLL partials are a few KB each and merge losslessly, so any
        // month-range quantile query is O(months), not O(corpus). KLL
        // compaction is randomized, so the estimate VALUE is run-specific;
        // the oracle checks the RANK contract instead: at k=200 the
        // normalized rank error is 1.65% at 99% confidence (sigma ~ 0.6%),
        // so the estimate's exact rank sits within p +/- 0.05 (> 7 sigma).
        val li = table(s, dir, "lineitem")
          .select(date_trunc("month", col("l_shipdate")).as("m"),
            col("l_extendedprice").cast("double").as("x"))
        val partials = li.groupBy("m")
          .agg(expr("kll_sketch_agg_double(x, 200)").as("sk"),
            count(lit(1)).as("n"))
        val merged = partials.agg(
          expr("kll_merge_agg_double(sk)").as("sk"),
          sum("n").as("n"),
          count(lit(1)).as("n_months"))
        val ests = merged.select(
          col("n"), col("n_months"),
          explode(array(Seq(0.5, 0.9, 0.99).map(p =>
            struct(lit(p).as("p"),
              expr(s"kll_sketch_get_quantile_double(sk, ${p}d)").as("est"))): _*)).as("e"))
          .select(col("e.p").as("p"), col("e.est").as("est"),
            col("n"), col("n_months"))
        // the contract pass: one extra corpus scan ranks each estimate
        // exactly (3-row broadcast; at scale this is the audit query you
        // run once, not the serving path — serving reads the sketch frame)
        val ranks = li.crossJoin(broadcast(ests.select("p", "est")))
          .groupBy("p")
          .agg(sum((col("x") <= col("est")).cast("long")).as("r"))
        ests.join(ranks, Seq("p"))
          .select(col("p"), col("n"), col("n_months"),
            (abs(col("r").cast("double") / col("n") - col("p")) <= 0.05)
              .as("rank_ok"))
          .orderBy("p")
      },
      Some("""
        WITH li AS (
          SELECT date_trunc('month', l_shipdate) AS m,
                 CAST(l_extendedprice AS DOUBLE) AS x
          FROM lineitem)
        SELECT CAST(p AS DOUBLE) AS p,
               (SELECT COUNT(1) FROM li) AS n,
               (SELECT COUNT(DISTINCT m) FROM li) AS n_months,
               TRUE AS rank_ok
        FROM (VALUES (0.5), (0.9), (0.99)) v(p)
        ORDER BY p"""),
      "Mergeable KLL quantile rollup: per-month sketch partials merged to global " +
        "percentiles — the re-aggregation property exact percentile lacks; " +
        "rank-contract-checked against an exact counting pass."),

    // ---------------------------------------------------------------- q96
    Q(
      "q96_zorder_code",
      (s, dir) => {
        // The Z-value (Morton code) arithmetic under Sinks.writeZOrdered,
        // oracled end to end: each dimension rank-scales into 16 bits
        // against in-plan min/max bounds (tiny aggregate, broadcast back —
        // no driver collect), then the bits interleave so nearby
        // (user, time) points share code prefixes. This is the sort key
        // that gives every output file a small RECTANGLE of the dim space
        // — multi-dim parquet min/max pruning that single-column sorting
        // cannot provide. Exact cross-engine: double scaling + floor is
        // IEEE, everything after is integer bit ops; the Spark and DuckDB
        // spellings come from the SAME generator loop (dialect-split only
        // at the shift operators).
        val dims = Seq(
          ("user_id", "__lo_user_id", "__hi_user_id"),
          ("ms", "__lo_ms", "__hi_ms"))
        val e = table(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ms"))
        val bounds = e.agg(
          min("user_id").as("__lo_user_id"), max("user_id").as("__hi_user_id"),
          min("ms").as("__lo_ms"), max("ms").as("__hi_ms"))
        e.filter(col("event_id") % 50 === 0)
          .crossJoin(broadcast(bounds))
          .withColumn("z",
            expr(graft.sources.Sinks.zValueSql(dims, 16, "spark")))
          .select("event_id", "user_id", "ms", "z")
          .orderBy("event_id")
      },
      Some(s"""
        WITH e AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
        b AS (
          SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
                 min(ms) AS lo_m, max(ms) AS hi_m
          FROM e)
        SELECT event_id, user_id, ms,
               ${graft.sources.Sinks.zValueSql(
                 Seq(("user_id", "lo_u", "hi_u"), ("ms", "lo_m", "hi_m")),
                 16, "duck")} AS z
        FROM e CROSS JOIN b
        WHERE event_id % 50 = 0
        ORDER BY event_id"""),
      "Morton z-code computation (the writeZOrdered sort key): in-plan bounds, " +
        "16-bit rank scaling, bit interleave — the multi-dim clustering layout " +
        "for box-predicate file pruning; both spellings from one generator."),

    // ---------------------------------------------------------------- q98
    Q(
      "q98_equidepth_hist",
      (s, dir) => {
        // Equi-DEPTH histogram (q52 is equi-width): 20 buckets of equal
        // row count over lineitem prices. The naive spelling is
        // ntile(20) OVER (ORDER BY price) — a GLOBAL window, one task
        // sorting the entire corpus. This routes through GlobalRank's
        // two-phase shape instead: sketch boundaries, bounded per-bucket
        // local sorts, offset arithmetic — no task ever sorts more than
        // ~rows/32, yet the ranks (and so the tile edges) are EXACT, and
        // the oracle pins them against DuckDB's native ntile.
        val li = table(s, dir, "lineitem")
          .select(col("l_extendedprice").cast("double").as("price"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("tie"))
          .withColumn("seg", lit("all"))
        val ranked = graft.operators.GlobalRank
          .withGlobalRank(li, "seg", "price", "tie")
        ranked
          .withColumn("bucket",
            expr(graft.operators.GlobalRank.ntileExpr("rn", "n_seg", 20)))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_rows"),
            min("price").as("lo"),
            max("price").as("hi"))
          .orderBy("bucket")
      },
      Some("""
        WITH t AS (
          SELECT CAST(l_extendedprice AS DOUBLE) AS price,
                 l_orderkey * 10 + l_linenumber AS tie
          FROM lineitem),
        n AS (
          SELECT price, ntile(20) OVER (ORDER BY price, tie) AS bucket FROM t)
        SELECT bucket, COUNT(1) AS n_rows, MIN(price) AS lo, MAX(price) AS hi
        FROM n GROUP BY bucket ORDER BY bucket"""),
      "Equi-depth histogram via the two-phase GlobalRank shape: exact ntile " +
        "edges with bounded per-bucket sorts — the global-window spelling that " +
        "would serialize the corpus into one task never appears."),

    // ---------------------------------------------------------------- q100
    Q(
      "q100_robust_outliers",
      (s, dir) => {
        // Robust per-group outlier stats: EXACT lower median and MAD
        // (median absolute deviation) — the outlier detector that, unlike
        // the q84 z-score, a few extreme values cannot drag. Exactness at
        // scale: each median is a rank extraction through GlobalRank's
        // two-phase shape (twice: values, then deviations) — never a
        // single-task percentile buffer, never an approximation. The
        // median/MAD are SELECTED input values (order statistics), not
        // computed aggregates; deviations and the 5*MAD compare are IEEE
        // doubles on the IDENTICAL expression tree in both engines, so
        // every reported number is bit-identical cross-engine.
        import graft.operators.GlobalRank
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus").as("seg"),
            col("o_totalprice").as("price"))
          .withColumn("pd", col("price").cast("double"))
        // r12: pin the SEGMENT-SIZED rank extractions (one row per
        // o_orderstatus — model-class data, the q170 tiny-front
        // discipline). Unpinned, every downstream broadcast build and the
        // second GlobalRank's eager sketch job re-ran the ENTIRE first
        // rank pass (bucketed window over all orders) to rebuild these
        // 3 rows — measured 4.77 -> 3.37 s isolated.
        val med = GlobalRank.withGlobalRank(o, "seg", "pd", "o_orderkey")
          .filter(expr("rn = (n_seg + 1) div 2"))
          .select(col("seg"), col("price").as("med"))
          .localCheckpoint(true)
        val dev = o.join(broadcast(med), Seq("seg"))
          .withColumn("d", abs(col("price") - col("med")))
          .withColumn("dd", col("d").cast("double"))
        val mad = GlobalRank
          .withGlobalRank(dev.select("seg", "o_orderkey", "d", "dd"),
            "seg", "dd", "o_orderkey")
          .filter(expr("rn = (n_seg + 1) div 2"))
          .select(col("seg"), col("d").as("mad"))
          .localCheckpoint(true)
        dev.join(broadcast(mad), Seq("seg"))
          .groupBy("seg")
          .agg(
            count(lit(1)).as("n_orders"),
            first("med").as("med"),
            first("mad").as("mad"),
            sum((col("d") > col("mad") * 5).cast("long")).as("n_outliers"))
          .orderBy("seg")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_orderstatus AS seg, o_totalprice AS price
          FROM orders),
        r1 AS (
          SELECT seg, price,
                 row_number() OVER (PARTITION BY seg
                   ORDER BY CAST(price AS DOUBLE), o_orderkey) AS rn,
                 COUNT(1) OVER (PARTITION BY seg) AS n_seg
          FROM o),
        med AS (SELECT seg, price AS med FROM r1 WHERE rn = (n_seg + 1) // 2),
        dev AS (
          SELECT o.seg, o.o_orderkey, abs(o.price - med.med) AS d, med.med
          FROM o JOIN med USING (seg)),
        r2 AS (
          SELECT seg, d,
                 row_number() OVER (PARTITION BY seg
                   ORDER BY CAST(d AS DOUBLE), o_orderkey) AS rn,
                 COUNT(1) OVER (PARTITION BY seg) AS n_seg
          FROM dev),
        mad AS (SELECT seg, d AS mad FROM r2 WHERE rn = (n_seg + 1) // 2)
        SELECT dev.seg, COUNT(1) AS n_orders,
               MIN(dev.med) AS med, MIN(mad.mad) AS mad,
               CAST(SUM(CASE WHEN dev.d > mad.mad * 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers
        FROM dev JOIN mad USING (seg)
        GROUP BY dev.seg
        ORDER BY dev.seg"""),
      "Robust outlier stats: exact median and MAD per group via two GlobalRank " +
        "rank extractions (bounded sorts, no percentile buffer, no single-task " +
        "window) — 5*MAD flags in exact decimal; the detector extreme values " +
        "cannot drag."),

    // ---------------------------------------------------------------- q118
    Q(
      "q118_winsorized",
      (s, dir) => {
        // EXACT 5%-winsorized per-group stats — the robust-moments
        // companion to q100's median/MAD: the k = n div 20 smallest values
        // are replaced by the (k+1)-th smallest, the k largest by the
        // (n-k)-th, then mean/sd run over the clamped values, so a few
        // extreme rows cannot drag the moments. The trim boundaries are
        // ORDER STATISTICS (selected input values), extracted through
        // GlobalRank's two-phase rank — never a single-task percentile
        // buffer, never an approximation; k is integer arithmetic, sums
        // are DECIMAL-cast (exact cross-engine), and the derived
        // mean/sd round-6 doubles on identical expression trees.
        import graft.operators.GlobalRank
        val ev = table(s, dir, "events")
          .select(col("event_type").as("seg"), col("event_id"), col("value"))
        // r12: lazy bounds (see q99) — the eager sketch job re-ran the
        // events scan; lazily the sketch dedups into the main job's
        // broadcast builds (measured 3.11 -> 2.03 s isolated)
        val ranked = GlobalRank.withGlobalRank(ev, "seg", "value", "event_id",
            precomputedBounds = Some(GlobalRank.boundsOf(ev, "seg", "value")))
          .withColumn("k_trim", expr("n_seg div 20"))
        // tiny (segments)-row frame: the two boundary order statistics
        val bounds = ranked
          .filter(expr("rn = k_trim + 1 or rn = n_seg - k_trim"))
          .groupBy("seg")
          .agg(
            min(when(expr("rn = k_trim + 1"), col("value"))).as("lo"),
            max(when(expr("rn = n_seg - k_trim"), col("value"))).as("hi"))
        ranked.join(broadcast(bounds), Seq("seg"))
          .withColumn("wv", expr(
            """case when rn <= k_trim then lo
                    when rn > n_seg - k_trim then hi
                    else value end"""))
          .groupBy("seg")
          .agg(
            count(lit(1)).as("n0"),
            max("k_trim").as("kt"),
            min("lo").as("lo0"),
            min("hi").as("hi0"),
            sum(expr("cast(value as decimal(28,6))")).as("sv"),
            sum(expr("cast(wv as decimal(28,6))")).as("sw"),
            sum(expr("cast(wv * wv as decimal(28,6))")).as("sww"))
          .selectExpr(
            "seg as event_type",
            "cast(n0 as bigint) as n",
            "cast(kt as bigint) as k_trim",
            "round(lo0, 6) as lo",
            "round(hi0, 6) as hi",
            "round(cast(sv as double) / n0, 6) as raw_mean",
            "round(cast(sw as double) / n0, 6) as win_mean",
            """round(sqrt((cast(sww as double)
                 - cast(sw as double) * cast(sw as double) / n0)
                / (n0 - 1)), 6) as win_sd""")
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (SELECT event_type AS seg, event_id, value FROM events),
        r AS (
          SELECT seg, event_id, value,
                 row_number() OVER (PARTITION BY seg
                   ORDER BY CAST(value AS DOUBLE), event_id) AS rn,
                 COUNT(1) OVER (PARTITION BY seg) AS n_seg
          FROM e),
        rk AS (SELECT *, n_seg // 20 AS k_trim FROM r),
        b AS (
          SELECT seg,
                 MIN(CASE WHEN rn = k_trim + 1 THEN value END) AS lo,
                 MAX(CASE WHEN rn = n_seg - k_trim THEN value END) AS hi
          FROM rk WHERE rn = k_trim + 1 OR rn = n_seg - k_trim
          GROUP BY seg),
        w AS (
          SELECT rk.seg, rk.value, rk.k_trim,
                 CASE WHEN rn <= k_trim THEN lo
                      WHEN rn > n_seg - k_trim THEN hi
                      ELSE value END AS wv,
                 b.lo, b.hi
          FROM rk JOIN b USING (seg))
        SELECT seg AS event_type,
               CAST(COUNT(1) AS BIGINT) AS n,
               CAST(MAX(k_trim) AS BIGINT) AS k_trim,
               round(MIN(lo), 6) AS lo,
               round(MIN(hi), 6) AS hi,
               round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(1), 6) AS raw_mean,
               round(CAST(SUM(CAST(wv AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(1), 6) AS win_mean,
               round(sqrt((CAST(SUM(CAST(wv * wv AS DECIMAL(28,6))) AS DOUBLE)
                      - CAST(SUM(CAST(wv AS DECIMAL(28,6))) AS DOUBLE)
                        * CAST(SUM(CAST(wv AS DECIMAL(28,6))) AS DOUBLE)
                        / COUNT(1))
                     / (COUNT(1) - 1)), 6) AS win_sd
        FROM w
        GROUP BY seg
        ORDER BY event_type"""),
      "Exact 5%-winsorized per-group moments: trim boundaries are order " +
        "statistics through GlobalRank's two-phase rank (bounded sorts, no " +
        "single-task window), clamped values aggregate via decimal-cast sums " +
        "— robust mean/sd a few extremes cannot drag.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q178
    Q(
      "q178_waiting_suppliers",
      (s, dir) => {
        // TPC-H Q21's shape (suppliers who kept orders waiting) on the
        // driver tables: count, per supplier, the late lines (shipped >
        // 365 days after order date) in multi-supplier orders where NO
        // other supplier of the same order was late — the classic
        // EXISTS + NOT-EXISTS-on-the-same-fact correlation, the hardest
        // decorrelation pattern in the TPC-H suite. Spark-first spelling:
        // the two correlated predicates become a left_semi and a
        // left_anti self-join of lineitem on l_orderkey with a suppkey
        // inequality — Catalyst plans both as shuffled hash/SMJ on the
        // order key (the fact co-partitions once), and the supplier dim
        // broadcasts. Scale: three equi-shuffles on l_orderkey, no
        // correlated per-row subquery execution, dim joins broadcast.
        val li = table(s, dir, "lineitem")
        val ord = table(s, dir, "orders")
        val sup = table(s, dir, "supplier")
        val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(expr("cast(l_shipdate as date) > date_add(cast(o_orderdate as date), 365)"))
          .select("l_orderkey", "l_suppkey")
        val l1 = late.alias("l1")
        // EXISTS: another supplier has ANY line of the same order
        val anyOther = li.select("l_orderkey", "l_suppkey").alias("l2")
        val withOther = l1.join(anyOther,
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l2.l_suppkey"),
          "left_semi")
        // NOT EXISTS: no OTHER supplier of the order was late
        val lateOther = late.alias("l3")
        val sole = withOther.join(lateOther,
          col("l1.l_orderkey") === col("l3.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l3.l_suppkey"),
          "left_anti")
        sole.join(broadcast(sup), col("l1.l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""
        SELECT s_name, CAST(COUNT(1) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE CAST(l1.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 365
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND CAST(l3.l_shipdate AS DATE) > CAST(o3.o_orderdate AS DATE) + 365)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20"""),
      "TPC-H Q21 shape: late lines in multi-supplier orders where no other " +
        "supplier was late — EXISTS + NOT EXISTS on the same fact spelled as " +
        "left_semi + left_anti self-joins on the order key (no per-row " +
        "correlated execution), supplier dim broadcast, top-20 waiters."),

    // ---------------------------------------------------------------- q179
    Q(
      "q179_min_cost_supplier",
      (s, dir) => {
        // TPC-H Q2's shape (minimum-cost supplier per part) with lineitem
        // standing in for partsupp: a (part, supplier) unit cost is the
        // minimum observed discounted price per unit, suppliers are
        // restricted to one region, and each part keeps only the
        // suppliers achieving the REGIONAL MINIMUM cost — the correlated
        // scalar-subquery pattern. Spark-first spelling: decorrelate by
        // hand into a per-part min aggregate joined back on (partkey,
        // cost) — two shuffles on l_partkey, dims broadcast; the DuckDB
        // oracle keeps the literal correlated subquery, so the oracle
        // match PROVES the decorrelation is semantics-preserving. Cost
        // equality joins on raw IEEE doubles: both engines derive them
        // from identical parquet doubles with the same expression, so
        // the bits agree (the library's elementwise-double convention).
        val li = table(s, dir, "lineitem")
        val sup = table(s, dir, "supplier")
        val nat = table(s, dir, "nation")
        val reg = table(s, dir, "region")
        val part = table(s, dir, "part")
        val regionSup = sup
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val ps = li
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(expr("l_extendedprice * (1.0d - l_discount) / l_quantity"))
            .as("unit_cost"))
          .join(broadcast(regionSup), col("l_suppkey") === col("s_suppkey"))
        val minCost = ps.groupBy(col("l_partkey").as("mc_partkey"))
          .agg(min("unit_cost").as("min_cost"))
        ps.join(minCost,
            col("l_partkey") === col("mc_partkey") &&
              col("unit_cost") === col("min_cost"))
          .join(broadcast(part.filter(col("p_size") <= 25)),
            col("l_partkey") === col("p_partkey"))
          .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(20)
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice * (1.0 - l_discount) / l_quantity) AS unit_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        rs AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'),
        pr AS (
          SELECT ps.*, rs.s_name, rs.s_acctbal, rs.n_name
          FROM ps JOIN rs ON ps.l_suppkey = rs.s_suppkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM pr
        JOIN part ON pr.l_partkey = p_partkey
        WHERE p_size <= 25
          AND unit_cost = (
            SELECT MIN(pr2.unit_cost) FROM pr pr2
            WHERE pr2.l_partkey = pr.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 20"""),
      "TPC-H Q2 shape: regional minimum-cost supplier per part — the " +
        "correlated scalar subquery decorrelated into a per-part min " +
        "aggregate joined back on (partkey, cost); the oracle keeps the " +
        "literal correlated spelling so the match proves equivalence; " +
        "dims broadcast, two l_partkey shuffles."),

    Q(
      "q185_tree_closure",
      (s, dir) => {
        // The WITH RECURSIVE capability: resolve every node of a
        // hierarchy to its root with exact depth and inclusive
        // path-weight sum. The hierarchy is derived deterministically
        // from the corpus (parent(d) = d div 2 - 1 for d >= 2; docs 0
        // and 1 are roots — a two-tree binary forest, depth ~log2(n),
        // weight = n_chars), so the DuckDB oracle can walk the SAME
        // forest with a literal recursive CTE. Spark-first spelling:
        // Hierarchy.closure's POINTER DOUBLING — 6 id-keyed self-joins
        // resolve depth <= 64 (any balanced tree to 2^64 nodes), where
        // a recursive-CTE translation would need max_depth sequential
        // shuffles and a driver-side level loop. The oracle match
        // proves the log-round composition equals the level-by-level
        // recursion.
        import graft.operators.Hierarchy
        val nodes = table(s, dir, "documents").select(
          col("doc_id"),
          when(col("doc_id") >= 2, expr("doc_id div 2 - 1")).as("parent"),
          col("n_chars"))
        Hierarchy.closure(nodes, "doc_id", "parent", "n_chars", rounds = 6)
          .orderBy("doc_id")
      },
      Some("""
        WITH RECURSIVE walk AS (
          SELECT doc_id AS id, doc_id AS cur, CAST(0 AS BIGINT) AS depth,
                 n_chars AS psum
          FROM documents
          UNION ALL
          SELECT w.id, p.doc_id, w.depth + 1, w.psum + p.n_chars
          FROM walk w JOIN documents p ON p.doc_id = w.cur // 2 - 1
          WHERE w.cur >= 2)
        SELECT id AS doc_id, cur AS root_id, depth, psum AS path_weight
        FROM walk WHERE cur <= 1
        ORDER BY doc_id"""),
      "Recursive-hierarchy closure (the WITH RECURSIVE capability) via " +
        "pointer doubling: 6 log-round self-joins resolve root/depth/" +
        "path-sum for depth <= 64 where naive recursion needs max_depth " +
        "shuffles; the oracle's literal recursive CTE proves equivalence.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q188
    Q(
      "q188_cohort_retention",
      (s, dir) => {
        // Cohort retention matrix — the canonical product-analytics
        // rollup: cohort users by the ISO week of their FIRST event,
        // then for each later week count how many of that cohort were
        // active (retention = n_active / cohort size). Scale shape: one
        // (user, week) distinct (user-keyed shuffle), one user-keyed min
        // for the cohort week, then everything collapses to the tiny
        // cohort x offset frame; cohort sizes broadcast back. Nothing
        // downstream of the two user-keyed shuffles is corpus-sized.
        val uw = table(s, dir, "events")
          .selectExpr("user_id", "unix_millis(ts) div 604800000 as wk")
          .distinct()
        val cohorts = uw.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        val sizes = cohorts.groupBy("cohort_wk")
          .agg(count(lit(1)).as("cohort_users"))
        uw.join(cohorts, Seq("user_id"))
          .withColumn("off", col("wk") - col("cohort_wk"))
          .groupBy("cohort_wk", "off")
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), Seq("cohort_wk"))
          .selectExpr("cohort_wk", "off", "cohort_users", "n_active",
            "round(cast(n_active as double) / cast(cohort_users as double), 6) as retention")
          .orderBy("cohort_wk", "off")
      },
      Some("""
        WITH uw AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
        cohorts AS (
          SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id),
        sizes AS (
          SELECT cohort_wk, COUNT(1) AS cohort_users FROM cohorts GROUP BY cohort_wk),
        act AS (
          SELECT c.cohort_wk, u.wk - c.cohort_wk AS off, COUNT(1) AS n_active
          FROM uw u JOIN cohorts c USING (user_id)
          GROUP BY 1, 2)
        SELECT a.cohort_wk, a.off, s.cohort_users, a.n_active,
               round(CAST(a.n_active AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6) AS retention
        FROM act a JOIN sizes s USING (cohort_wk)
        ORDER BY a.cohort_wk, a.off"""),
      "Cohort retention matrix: users cohorted by first-event week, " +
        "per-week-offset active fraction — two user-keyed shuffles, then " +
        "tiny cohort x offset arithmetic with cohort sizes broadcast back; " +
        "the canonical product-analytics rollup."),

    // ---------------------------------------------------------------- q189
    Q(
      "q189_event_transitions",
      (s, dir) => {
        // First-order Markov transition matrix over each user's event
        // stream: lag(event_type) within the per-user time order gives
        // (from, to) bigrams; counts row-normalize into transition
        // probabilities. The window partitions by user_id — thousands of
        // small frames, never a global sort — and the output collapses
        // to the |types|^2 frame, so the only corpus-sized work is one
        // user-keyed shuffle. The row-normalizer joins back from the
        // tiny per-from totals (broadcast), not a second window.
        val w = Window.partitionBy("user_id")
          .orderBy(unix_millis(col("ts")), col("event_id"))
        val bigrams = table(s, dir, "events")
          .withColumn("from_type", lag("event_type", 1).over(w))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = bigrams.groupBy("from_type")
          .agg(sum("n").as("n_from"))
        bigrams.join(broadcast(totals), Seq("from_type"))
          .selectExpr("from_type", "to_type", "n",
            "cast(n_from as bigint) as n_from",
            "round(cast(n as double) / cast(n_from as double), 6) as p")
          .orderBy("from_type", "to_type")
      },
      Some("""
        WITH lagged AS (
          SELECT user_id, event_type AS to_type,
                 lag(event_type, 1) OVER (PARTITION BY user_id
                                          ORDER BY epoch_ms(ts), event_id) AS from_type
          FROM events),
        bigrams AS (
          SELECT from_type, to_type, COUNT(1) AS n
          FROM lagged WHERE from_type IS NOT NULL
          GROUP BY 1, 2),
        totals AS (
          SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
          FROM bigrams GROUP BY from_type)
        SELECT b.from_type, b.to_type, b.n, t.n_from,
               round(CAST(b.n AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6) AS p
        FROM bigrams b JOIN totals t USING (from_type)
        ORDER BY b.from_type, b.to_type"""),
      "First-order Markov transition matrix over per-user event streams: " +
        "lag within user-partitioned time order, counts row-normalized " +
        "via broadcast per-from totals — one user-keyed shuffle, " +
        "|types|^2 output; the user-journey flow map.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q195
    Q(
      "q195_seasonal_anomaly",
      (s, dir) => {
        // Seasonal-baseline anomaly screen over the event stream: daily
        // event counts vs the per-WEEKDAY mean/sd baseline (weekly
        // seasonality is the dominant cycle in product telemetry), with
        // z > 2 flagging anomalous days. All moments derive from exact
        // integer sums (n, sum(c), sum(c^2)) so mean/variance are exact
        // rationals evaluated by one shared IEEE expression tree — no
        // cross-engine variance drift. Scale: one day-keyed aggregate
        // (map-side combine) collapses the corpus to the days frame;
        // the 7-row weekday baseline broadcasts back onto it.
        val daily = table(s, dir, "events")
          .selectExpr("unix_millis(ts) div 86400000 as day")
          .groupBy("day").agg(count(lit(1)).as("cnt"))
        val base = daily
          .withColumn("wd", expr("day % 7"))
          .groupBy("wd")
          .agg(count(lit(1)).as("n"), sum("cnt").as("s1"),
            sum(expr("cnt * cnt")).as("s2"))
        daily.withColumn("wd", expr("day % 7"))
          .join(broadcast(base), Seq("wd"))
          .withColumn("sd", expr(
            "sqrt(cast(n * s2 - s1 * s1 as double) / cast(n * n as double))"))
          .selectExpr("day", "cast(wd as bigint) as wd", "cnt",
            "round(cast(s1 as double) / cast(n as double), 6) as wd_mean",
            "round(sd, 6) as wd_sd",
            """round(case when sd = 0.0d then 0.0d
                     else cast(cnt * n - s1 as double) / (cast(n as double) * sd)
                     end, 6) as z""",
            """(case when sd = 0.0d then 0.0d
                else abs(cast(cnt * n - s1 as double) / (cast(n as double) * sd))
                end) > 2.0d as is_anom""")
          .orderBy("day")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS day, COUNT(1) AS cnt
          FROM events GROUP BY 1),
        base AS (
          SELECT day % 7 AS wd, COUNT(1) AS n,
                 CAST(SUM(cnt) AS BIGINT) AS s1,
                 CAST(SUM(cnt * cnt) AS BIGINT) AS s2
          FROM daily GROUP BY 1),
        j AS (
          SELECT d.day, b.wd, d.cnt, b.n, b.s1, b.s2,
                 sqrt(CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE)
                      / CAST(b.n * b.n AS DOUBLE)) AS sd
          FROM daily d JOIN base b ON d.day % 7 = b.wd)
        SELECT day, CAST(wd AS BIGINT) AS wd, cnt,
               round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS wd_mean,
               round(sd, 6) AS wd_sd,
               round(CASE WHEN sd = 0.0 THEN 0.0
                     ELSE CAST(cnt * n - s1 AS DOUBLE) / (CAST(n AS DOUBLE) * sd)
                     END, 6) AS z,
               (CASE WHEN sd = 0.0 THEN 0.0
                ELSE abs(CAST(cnt * n - s1 AS DOUBLE) / (CAST(n AS DOUBLE) * sd))
                END) > 2.0 AS is_anom
        FROM j ORDER BY day"""),
      "Seasonal anomaly screen: daily event counts vs per-weekday " +
        "mean/sd baselines from exact integer moment sums — one day-" +
        "keyed aggregate, 7-row baseline broadcast back, z > 2 flags; " +
        "no cross-engine variance drift."),

    // ---------------------------------------------------------------- q196
    Q(
      "q196_rfm_segments",
      (s, dir) => {
        // RFM customer segmentation: per-user Recency (days since last
        // event, vs the corpus max day), Frequency (event count), and
        // Monetary (exact decimal value sum), each cut into quintiles
        // by GlobalRank's two-phase exact ranks — the no-single-task
        // spelling of ntile(5) over a users-sized frame (billions of
        // users at 100 TB; a bare Window.orderBy would funnel them
        // through one task). Quintile code r*100+f*10+m (r=5 most
        // recent, f=5 most frequent, m=5 highest spend), reported as
        // segment sizes + per-segment metric means. Three rank passes
        // over the users frame — each a bucketed shuffle, nothing
        // corpus-sized after the first user-keyed aggregate.
        import graft.operators.GlobalRank
        val maxDay = table(s, dir, "events")
          .agg(max(expr("unix_millis(ts) div 86400000")).as("max_day"))
        val users = table(s, dir, "events")
          .selectExpr("user_id", "unix_millis(ts) div 86400000 as day",
            "cast(value as decimal(18,2)) as v")
          .groupBy("user_id")
          .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
            sum("v").as("mon"))
          .crossJoin(broadcast(maxDay))
          .withColumn("rec", col("max_day") - col("last_day"))
          .withColumn("seg", lit(0))
        // r12: ONE sketch pass for all three quintile cuts (guide §2.4 /
        // the r11 verdict's GlobalRank item). Each withGlobalRank call
        // runs its bounds sketch EAGERLY over its input — and the input
        // of cut k is the chained output of cuts 1..k-1, so the three
        // sketch jobs re-executed the growing chain 1+2+3 times
        // (profiled: quint1 1.5 s, +quint2 2.9 s, +quint3 5.5 s).
        // rec/freq/mon are untouched by the cuts, so all three boundary
        // sets come from ONE aggregate over `users`; sketch values only
        // steer bucket balance — the exact ranks (and so the quintiles)
        // are unchanged for any boundaries.
        val qsList = (1 until 32).map(i => i.toDouble / 32).mkString(", ")
        val sk = graft.operators.Pinned.pin(
          users.groupBy("seg").agg(
            expr(s"approx_percentile(rec * -1, array($qsList), 1000)").as("b_r"),
            expr(s"approx_percentile(freq, array($qsList), 1000)").as("b_f"),
            expr(s"approx_percentile(mon, array($qsList), 1000)").as("b_m")),
          recoverable = false)
        def quint(df: org.apache.spark.sql.DataFrame, v: String, q: String,
            asc: Boolean, bCol: String) = {
          val in = if (asc) df else df.withColumn("__neg", col(v) * -1)
          val ranked = GlobalRank.withGlobalRank(
            in, "seg", if (asc) v else "__neg", "user_id",
            precomputedBounds = Some(sk.select(col("seg"), col(bCol).as("bnds"))))
          ranked.withColumn(q, expr("(rn - 1) * 5 div n_seg + 1"))
            .drop("rn", "n_seg", "__neg")
        }
        // r: LOW recency days = best -> rank descending puts recent last;
        // we rank rec ASC negated so quintile 5 = most recent
        val scored = quint(quint(quint(users, "rec", "r_q", asc = false, "b_r"),
          "freq", "f_q", asc = true, "b_f"), "mon", "m_q", asc = true, "b_m")
        scored
          .withColumn("rfm", expr("r_q * 100 + f_q * 10 + m_q"))
          .groupBy("rfm")
          .agg(count(lit(1)).as("n_users"),
            expr("round(cast(sum(rec) as double) / count(1), 6)").as("avg_rec"),
            expr("round(cast(sum(freq) as double) / count(1), 6)").as("avg_freq"),
            expr("round(cast(sum(mon) as double) / count(1), 6)").as("avg_mon"))
          .selectExpr("cast(rfm as bigint) as rfm", "n_users",
            "avg_rec", "avg_freq", "avg_mon")
          .orderBy("rfm")
      },
      Some("""
        WITH md AS (
          SELECT MAX(epoch_ms(ts) // 86400000) AS max_day FROM events),
        u AS (
          SELECT user_id,
                 MAX(epoch_ms(ts) // 86400000) AS last_day,
                 COUNT(1) AS freq,
                 SUM(CAST(value AS DECIMAL(18,2))) AS mon
          FROM events GROUP BY user_id),
        m AS (
          SELECT u.user_id, md.max_day - u.last_day AS rec, u.freq, u.mon
          FROM u, md),
        ranked AS (
          SELECT user_id, rec, freq, mon,
                 (ROW_NUMBER() OVER (ORDER BY -rec, user_id) - 1) * 5
                   // COUNT(1) OVER () + 1 AS r_q,
                 (ROW_NUMBER() OVER (ORDER BY freq, user_id) - 1) * 5
                   // COUNT(1) OVER () + 1 AS f_q,
                 (ROW_NUMBER() OVER (ORDER BY mon, user_id) - 1) * 5
                   // COUNT(1) OVER () + 1 AS m_q
          FROM m)
        SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm,
               COUNT(1) AS n_users,
               round(CAST(SUM(rec) AS DOUBLE) / COUNT(1), 6) AS avg_rec,
               round(CAST(SUM(freq) AS DOUBLE) / COUNT(1), 6) AS avg_freq,
               round(CAST(SUM(mon) AS DOUBLE) / COUNT(1), 6) AS avg_mon
        FROM ranked
        GROUP BY 1 ORDER BY 1"""),
      "RFM segmentation: per-user recency/frequency/monetary from one " +
        "user-keyed aggregate, three quintile cuts via GlobalRank's " +
        "two-phase exact ranks (the distributed ntile(5) — no single-" +
        "task window over a users-sized frame), segment sizes + means."),

    // ---------------------------------------------------------------- q197
    Q(
      "q197_benford",
      (s, dir) => {
        // Benford first-digit audit of lineitem prices — the classic
        // fabricated-data screen: observed leading-digit distribution
        // vs Benford's log10(1 + 1/d) expectation, per-digit chi-square
        // contributions and the total statistic broadcast onto every
        // row. First digit via string head of the floored integer part
        // (no log10-of-value boundary risk); expectations are literal-
        // arithmetic IEEE, observed counts exact integers. Scale: one
        // map pass + 9-group aggregate; everything after is 9-row math.
        val digits = table(s, dir, "lineitem")
          .selectExpr(
            "cast(substring(cast(cast(floor(l_extendedprice) as bigint) as string), 1, 1) as int) as d")
          .filter(col("d").between(1, 9))
          .groupBy("d").agg(count(lit(1)).as("n_obs"))
        val tot = digits.agg(sum("n_obs").as("n_tot"))
        val scored = digits.crossJoin(broadcast(tot))
          .withColumn("p_ben", expr("log10(1.0d + 1.0d / cast(d as double))"))
          .withColumn("chi_term", expr(
            """(cast(n_obs as double) - cast(n_tot as double) * p_ben)
               * (cast(n_obs as double) - cast(n_tot as double) * p_ben)
               / (cast(n_tot as double) * p_ben)"""))
        val chi2 = scored.agg(
          expr("round(sum(cast(round(chi_term, 9) as decimal(28,12))), 6)").as("chi2"))
        scored.crossJoin(broadcast(chi2))
          .selectExpr("d", "n_obs", "cast(n_tot as bigint) as n_tot",
            "round(p_ben, 6) as p_benford",
            "round(cast(n_obs as double) / cast(n_tot as double), 6) as p_obs",
            "round(chi_term, 6) as chi_term",
            "cast(chi2 as double) as chi2")
          .orderBy("d")
      },
      Some("""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d,
                 COUNT(1) AS n_obs
          FROM lineitem
          WHERE CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) BETWEEN 1 AND 9
          GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_tot FROM digits),
        scored AS (
          SELECT d, n_obs, n_tot,
                 log10(1.0 + 1.0 / CAST(d AS DOUBLE)) AS p_ben,
                 (CAST(n_obs AS DOUBLE) - CAST(n_tot AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
                 * (CAST(n_obs AS DOUBLE) - CAST(n_tot AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
                 / (CAST(n_tot AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE))) AS chi_term
          FROM digits, tot),
        c AS (
          SELECT round(SUM(CAST(round(chi_term, 9) AS DECIMAL(28,12))), 6) AS chi2
          FROM scored)
        SELECT d, n_obs, n_tot, round(p_ben, 6) AS p_benford,
               round(CAST(n_obs AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS p_obs,
               round(chi_term, 6) AS chi_term,
               CAST(chi2 AS DOUBLE) AS chi2
        FROM scored, c
        ORDER BY d"""),
      "Benford first-digit audit of prices: observed vs log10(1+1/d) " +
        "expectation with per-digit and total chi-square — string-head " +
        "digit extraction (no log boundary risk), exact counts, one map " +
        "pass + 9-row arithmetic; the fabricated-data screen."),

    // ---------------------------------------------------------------- q198
    Q(
      "q198_dq_audit",
      (s, dir) => {
        // Declarative data-quality rule panel over the star schema —
        // the five integrity classes a warehouse gate checks before
        // publishing a snapshot: (1) fact->dim referential orphans,
        // (2) dims with no facts, (3) duplicate primary keys, (4)
        // mandatory-field blanks, (5) domain violations (non-positive
        // measures). Each rule is an independent aggregate/anti-join
        // shape over its own table; results union into the verdict
        // frame. Scale: every rule is one keyed shuffle or map-side
        // count; the panel parallelizes trivially (union of independent
        // subtrees — Spark schedules them concurrently).
        val li = table(s, dir, "lineitem")
        val ord = table(s, dir, "orders")
        val cust = table(s, dir, "customer")
        def row(name: String, bad: org.apache.spark.sql.DataFrame,
            total: org.apache.spark.sql.DataFrame) =
          bad.crossJoin(total).selectExpr(s"'$name' as check_name",
            "cast(n_bad as bigint) as n_bad",
            "cast(n_total as bigint) as n_total", "n_bad = 0 as ok")
        val orphans = row("lineitem_orphan_orderkey",
          li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("n_bad")),
          li.agg(count(lit(1)).as("n_total")))
        val childless = row("orders_without_lineitems",
          ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_anti")
            .agg(count(lit(1)).as("n_bad")),
          ord.agg(count(lit(1)).as("n_total")))
        val dupkeys = row("lineitem_dup_pk",
          li.groupBy("l_orderkey", "l_linenumber")
            .agg(count(lit(1)).as("c")).filter(col("c") > 1)
            .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_bad")),
          li.agg(count(lit(1)).as("n_total")))
        val blanks = row("customer_blank_name",
          cust.filter(col("c_name").isNull || trim(col("c_name")) === "")
            .agg(count(lit(1)).as("n_bad")),
          cust.agg(count(lit(1)).as("n_total")))
        val domain = row("lineitem_nonpositive_measures",
          li.filter(col("l_quantity") <= 0 || col("l_extendedprice") <= 0)
            .agg(count(lit(1)).as("n_bad")),
          li.agg(count(lit(1)).as("n_total")))
        orphans.unionByName(childless).unionByName(dupkeys)
          .unionByName(blanks).unionByName(domain)
          .orderBy("check_name")
      },
      Some("""
        WITH checks AS (
          SELECT 'lineitem_orphan_orderkey' AS check_name,
                 (SELECT COUNT(1) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)) AS n_bad,
                 (SELECT COUNT(1) FROM lineitem) AS n_total
          UNION ALL
          SELECT 'orders_without_lineitems',
                 (SELECT COUNT(1) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                    WHERE l.l_orderkey = o.o_orderkey)),
                 (SELECT COUNT(1) FROM orders)
          UNION ALL
          SELECT 'lineitem_dup_pk',
                 (SELECT COALESCE(SUM(c - 1), 0) FROM (
                    SELECT COUNT(1) AS c FROM lineitem
                    GROUP BY l_orderkey, l_linenumber HAVING COUNT(1) > 1)),
                 (SELECT COUNT(1) FROM lineitem)
          UNION ALL
          SELECT 'customer_blank_name',
                 (SELECT COUNT(1) FROM customer
                  WHERE c_name IS NULL OR trim(c_name) = ''),
                 (SELECT COUNT(1) FROM customer)
          UNION ALL
          SELECT 'lineitem_nonpositive_measures',
                 (SELECT COUNT(1) FROM lineitem
                  WHERE l_quantity <= 0 OR l_extendedprice <= 0),
                 (SELECT COUNT(1) FROM lineitem))
        SELECT check_name, CAST(n_bad AS BIGINT) AS n_bad,
               CAST(n_total AS BIGINT) AS n_total, n_bad = 0 AS ok
        FROM checks ORDER BY check_name"""),
      "Data-quality rule panel: referential orphans both directions, " +
        "duplicate PKs, blank mandatory fields, measure-domain checks — " +
        "five independent anti-join/aggregate subtrees unioned into one " +
        "verdict frame; the pre-publish warehouse gate."),

    // ---------------------------------------------------------------- q199
    Q(
      "q199_column_profile",
      (s, dir) => {
        // Column profiling — the stats panel a catalog publishes per
        // column: row/null/distinct counts plus min/max, emitted as one
        // uniform (column, metrics) frame. Numeric min/max surface as
        // doubles, temporal as epoch millis, strings by lexical order —
        // all cross-engine exact. Scale: each column profiles in its
        // own aggregate subtree (count distinct = one shuffle each) and
        // the subtrees union — at 100 TB you profile the columns you
        // need, each a single pass with map-side partials.
        val li = table(s, dir, "lineitem")
        def num(c: String) = li.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1).otherwise(0)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("double").as("min_v"),
          max(col(c)).cast("double").as("max_v"))
          .selectExpr(s"'$c' as col_name", "n_rows",
            "cast(n_null as bigint) as n_null", "n_distinct",
            "round(min_v, 6) as min_v", "round(max_v, 6) as max_v",
            "cast(null as string) as min_s", "cast(null as string) as max_s")
        def str(c: String) = li.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1).otherwise(0)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).as("min_s"), max(col(c)).as("max_s"))
          .selectExpr(s"'$c' as col_name", "n_rows",
            "cast(n_null as bigint) as n_null", "n_distinct",
            "cast(null as double) as min_v", "cast(null as double) as max_v",
            "min_s", "max_s")
        def ts(c: String) = li.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1).otherwise(0)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          // NTZ parquet timestamp -> TimestampType is exact under the
          // pinned-UTC session (the o_orderdate convention above)
          unix_millis(min(col(c)).cast("timestamp")).as("min_ms"),
          unix_millis(max(col(c)).cast("timestamp")).as("max_ms"))
          .selectExpr(s"'$c' as col_name", "n_rows",
            "cast(n_null as bigint) as n_null", "n_distinct",
            "cast(min_ms as double) as min_v", "cast(max_ms as double) as max_v",
            "cast(null as string) as min_s", "cast(null as string) as max_s")
        num("l_quantity").unionByName(num("l_extendedprice"))
          .unionByName(num("l_discount"))
          .unionByName(str("l_returnflag")).unionByName(str("l_linestatus"))
          .unionByName(ts("l_shipdate"))
          .orderBy("col_name")
      },
      Some("""
        WITH p AS (
          SELECT 'l_quantity' AS col_name, COUNT(1) AS n_rows,
                 CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                 COUNT(DISTINCT l_quantity) AS n_distinct,
                 round(CAST(MIN(l_quantity) AS DOUBLE), 6) AS min_v,
                 round(CAST(MAX(l_quantity) AS DOUBLE), 6) AS max_v,
                 CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
          FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', COUNT(1),
                 CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 COUNT(DISTINCT l_extendedprice),
                 round(CAST(MIN(l_extendedprice) AS DOUBLE), 6),
                 round(CAST(MAX(l_extendedprice) AS DOUBLE), 6),
                 NULL, NULL
          FROM lineitem
          UNION ALL
          SELECT 'l_discount', COUNT(1),
                 CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 COUNT(DISTINCT l_discount),
                 round(CAST(MIN(l_discount) AS DOUBLE), 6),
                 round(CAST(MAX(l_discount) AS DOUBLE), 6),
                 NULL, NULL
          FROM lineitem
          UNION ALL
          SELECT 'l_returnflag', COUNT(1),
                 CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 COUNT(DISTINCT l_returnflag),
                 NULL, NULL, MIN(l_returnflag), MAX(l_returnflag)
          FROM lineitem
          UNION ALL
          SELECT 'l_linestatus', COUNT(1),
                 CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 COUNT(DISTINCT l_linestatus),
                 NULL, NULL, MIN(l_linestatus), MAX(l_linestatus)
          FROM lineitem
          UNION ALL
          SELECT 'l_shipdate', COUNT(1),
                 CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 COUNT(DISTINCT l_shipdate),
                 CAST(epoch_ms(MIN(l_shipdate)) AS DOUBLE),
                 CAST(epoch_ms(MAX(l_shipdate)) AS DOUBLE),
                 NULL, NULL
          FROM lineitem)
        SELECT * FROM p ORDER BY col_name"""),
      "Column profiling panel: per-column row/null/exact-distinct " +
        "counts + typed min/max (numeric as double, temporal as epoch " +
        "ms, strings lexical) — independent single-pass aggregate " +
        "subtrees unioned; the catalog stats publisher.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q201
    Q(
      "q201_market_basket",
      (s, dir) => {
        // Market-basket association rules over order baskets: pairwise
        // part co-occurrence with support / confidence / lift, top-20
        // by lift. The pair generator is the order-keyed self-join —
        // fanout is C(basket,2) per ORDER (baskets are small), never
        // corpus^2 — then everything is (part, part)-keyed aggregation
        // with the part-support frame joined back (parts-sized, equi;
        // the 1-row order total broadcasts). Exact integer counts into
        // one shared double tree for the ratios.
        val items = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val nOrders = items.select("ok").distinct().agg(count(lit(1)).as("n_ord"))
        val psup = items.groupBy("pk").agg(count(lit(1)).as("sup"))
        val pairs = items.as("a")
          .join(items.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
          .agg(count(lit(1)).as("sup_ab"))
          .filter(col("sup_ab") >= 3)
        pairs
          .join(psup.select(col("pk").as("pa"), col("sup").as("sup_a")), Seq("pa"))
          .join(psup.select(col("pk").as("pb"), col("sup").as("sup_b")), Seq("pb"))
          .crossJoin(broadcast(nOrders))
          .selectExpr("pa", "pb", "sup_ab", "sup_a", "sup_b",
            "round(cast(sup_ab as double) / cast(n_ord as double), 6) as support",
            "round(cast(sup_ab as double) / cast(sup_a as double), 6) as conf_a_b",
            """round(cast(sup_ab as double) * cast(n_ord as double)
               / (cast(sup_a as double) * cast(sup_b as double)), 6) as lift""")
          .orderBy(col("lift").desc, col("pa"), col("pb"))
          .limit(20)
      },
      Some("""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        n AS (SELECT COUNT(DISTINCT ok) AS n_ord FROM items),
        psup AS (SELECT pk, COUNT(1) AS sup FROM items GROUP BY pk),
        pairs AS (
          SELECT a.pk AS pa, b.pk AS pb, COUNT(1) AS sup_ab
          FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2 HAVING COUNT(1) >= 3)
        SELECT p.pa, p.pb, p.sup_ab, sa.sup AS sup_a, sb.sup AS sup_b,
               round(CAST(p.sup_ab AS DOUBLE) / CAST(n.n_ord AS DOUBLE), 6) AS support,
               round(CAST(p.sup_ab AS DOUBLE) / CAST(sa.sup AS DOUBLE), 6) AS conf_a_b,
               round(CAST(p.sup_ab AS DOUBLE) * CAST(n.n_ord AS DOUBLE)
                     / (CAST(sa.sup AS DOUBLE) * CAST(sb.sup AS DOUBLE)), 6) AS lift
        FROM pairs p
        JOIN psup sa ON p.pa = sa.pk
        JOIN psup sb ON p.pb = sb.pk, n
        ORDER BY lift DESC, p.pa, p.pb
        LIMIT 20"""),
      "Market-basket association rules: order-keyed pair self-join " +
        "(fanout bounded by basket size), pair-keyed aggregation, " +
        "support joins equi-keyed, order total broadcast — top-20 " +
        "co-purchase rules by lift from exact counts."),

    // ---------------------------------------------------------------- q202
    Q(
      "q202_spatial_pairs",
      (s, dir) => {
        // Grid-bucketed spatial self-join — the distance-join capability:
        // customers get deterministic planar coordinates (salted-hash
        // integers / 100, so both engines hold the identical doubles) on
        // a 100 x 100 plane; find all pairs within Euclidean distance 1.
        // Candidate generation maps each LEFT point onto its 3x3 cell
        // neighborhood (map-side x9 explode) and equi-joins the RIGHT
        // side on the exact cell — the same bucket-join discipline as
        // LSH banding, applied to space; a distance predicate alone
        // would be a cartesian. Exact integer cell ids (hash div 100 —
        // no float floors), exact verify on the shared double tree.
        val hx = graft.functions.HashConventions
          .md5long48("concat('gx|', cast(c_custkey as string))")
        val hy = graft.functions.HashConventions
          .md5long48("concat('gy|', cast(c_custkey as string))")
        val pts = table(s, dir, "customer")
          .selectExpr("c_custkey as id", s"$hx % 10000 as xi", s"$hy % 10000 as yi")
          .selectExpr("id", "xi div 100 as cx", "yi div 100 as cy",
            "cast(xi as double) / 100.0d as x", "cast(yi as double) / 100.0d as y")
        val lhs = pts
          .withColumn("dx", explode(expr("array(-1, 0, 1)")))
          .withColumn("dy", explode(expr("array(-1, 0, 1)")))
          .selectExpr("id as id_a", "x as xa", "y as ya",
            "cx + dx as jcx", "cy + dy as jcy")
        lhs.join(pts.selectExpr("id as id_b", "x as xb", "y as yb",
            "cx as jcx", "cy as jcy"), Seq("jcx", "jcy"))
          .filter(col("id_a") < col("id_b"))
          .filter(expr("(xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 1.0d"))
          .selectExpr("id_a", "id_b",
            "round(sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)), 6) as dist")
          .transform(d => SortOut.sortedOut(d, "id_a", "id_b"))
      },
      Some(s"""
        WITH pts AS (
          SELECT c_custkey AS id,
                 ${graft.functions.HashConventions.duckMd5long48("'gx|' || cast(c_custkey as varchar)")} % 10000 AS xi,
                 ${graft.functions.HashConventions.duckMd5long48("'gy|' || cast(c_custkey as varchar)")} % 10000 AS yi
          FROM customer),
        p AS (
          SELECT id, xi // 100 AS cx, yi // 100 AS cy,
                 CAST(xi AS DOUBLE) / 100.0 AS x,
                 CAST(yi AS DOUBLE) / 100.0 AS y
          FROM pts),
        lhs AS (
          SELECT id AS id_a, x AS xa, y AS ya,
                 cx + dx.v AS jcx, cy + dy.v AS jcy
          FROM p,
               (SELECT unnest([-1, 0, 1]) AS v) dx,
               (SELECT unnest([-1, 0, 1]) AS v) dy)
        SELECT l.id_a, r.id AS id_b,
               round(sqrt((l.xa - r.x) * (l.xa - r.x)
                          + (l.ya - r.y) * (l.ya - r.y)), 6) AS dist
        FROM lhs l JOIN p r ON l.jcx = r.cx AND l.jcy = r.cy
        WHERE l.id_a < r.id
          AND (l.xa - r.x) * (l.xa - r.x) + (l.ya - r.y) * (l.ya - r.y) <= 1.0
        ORDER BY l.id_a, id_b"""),
      "Grid-bucketed spatial distance join: deterministic planar coords, " +
        "3x3 cell-neighborhood explode equi-joined on exact integer cell " +
        "ids (LSH bucket-join discipline applied to space — no cartesian), " +
        "exact Euclidean verify; all pairs within distance 1."),

    // ---------------------------------------------------------------- q203
    Q(
      "q203_ab_test",
      (s, dir) => {
        // A/B test readout with a two-proportion z-test: users split by
        // salted hash into variants, conversion = the user's FIRST event
        // (by time) is a purchase (any-purchase-ever saturates to 100%
        // on this corpus — a degenerate readout), pooled-variance z from
        // exact integer counts through one shared IEEE tree,
        // significance at |z| > 1.96. Scale: one per-user window pass
        // (user-partitioned, never a global sort) collapses the corpus;
        // everything after is 2-row arithmetic with the 1-row test
        // statistic broadcast back. The deterministic split is the same
        // salted-hash machinery as the train/test splits (q182) —
        // assignment reproducible at any cluster size.
        val vHash = graft.functions.HashConventions
          .md5long48("concat('ab|', cast(user_id as string))")
        val w = Window.partitionBy("user_id")
          .orderBy(unix_millis(col("ts")), col("event_id"))
        val users = table(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .selectExpr("user_id", s"$vHash % 2 as variant",
            "case when event_type = 'purchase' then 1 else 0 end as conv")
        val arms = users.groupBy("variant")
          .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
        val z = arms.agg(
          sum(when(col("variant") === 0, col("n_users"))).as("n0"),
          sum(when(col("variant") === 0, col("n_conv"))).as("c0"),
          sum(when(col("variant") === 1, col("n_users"))).as("n1"),
          sum(when(col("variant") === 1, col("n_conv"))).as("c1"))
          // degenerate arms (0% or 100% pooled conversion) have zero
          // pooled variance: define z = 0 instead of dividing by it
          .withColumn("z", expr(
            """case when c0 + c1 = 0 or c0 + c1 = n0 + n1 then 0.0d
               else (cast(c1 as double) / cast(n1 as double)
                - cast(c0 as double) / cast(n0 as double))
               / sqrt((cast(c0 + c1 as double) / cast(n0 + n1 as double))
                      * (1.0d - cast(c0 + c1 as double) / cast(n0 + n1 as double))
                      * (1.0d / cast(n0 as double) + 1.0d / cast(n1 as double))) end"""))
          .selectExpr("round(z, 6) as z", "abs(z) > 1.96d as significant")
        arms.crossJoin(broadcast(z))
          .selectExpr("cast(variant as bigint) as variant", "n_users",
            "cast(n_conv as bigint) as n_conv",
            "round(cast(n_conv as double) / cast(n_users as double), 6) as conv_rate",
            "z", "significant")
          .orderBy("variant")
      },
      Some(s"""
        WITH f AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY epoch_ms(ts), event_id) AS rn
          FROM events),
        u AS (
          SELECT user_id,
                 ${graft.functions.HashConventions.duckMd5long48("'ab|' || cast(user_id as varchar)")} % 2 AS variant,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
          FROM f WHERE rn = 1),
        arms AS (
          SELECT variant, COUNT(1) AS n_users,
                 CAST(SUM(conv) AS BIGINT) AS n_conv
          FROM u GROUP BY variant),
        w AS (
          SELECT CAST(SUM(CASE WHEN variant = 0 THEN n_users END) AS BIGINT) AS n0,
                 CAST(SUM(CASE WHEN variant = 0 THEN n_conv END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN variant = 1 THEN n_users END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN variant = 1 THEN n_conv END) AS BIGINT) AS c1
          FROM arms),
        zr AS (
          SELECT CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0.0
                 ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) END AS zv
          FROM w),
        zt AS (
          SELECT round(zv, 6) AS z, abs(zv) > 1.96 AS significant FROM zr)
        SELECT CAST(a.variant AS BIGINT) AS variant, a.n_users, a.n_conv,
               round(CAST(a.n_conv AS DOUBLE) / CAST(a.n_users AS DOUBLE), 6) AS conv_rate,
               zt.z, zt.significant
        FROM arms a, zt
        ORDER BY a.variant"""),
      "A/B readout with two-proportion z-test: salted-hash variant split, " +
        "conversion per user in one keyed aggregate, pooled-variance z " +
        "from exact counts through one shared IEEE tree, |z| > 1.96 " +
        "significance broadcast onto the 2-row arm table."),

    // ---------------------------------------------------------------- q204
    Q(
      "q204_ols_fit",
      (s, dir) => {
        // Distributed OLS via normal equations — exact linear-model
        // training in ONE aggregation pass: regress l_extendedprice on
        // (1, l_quantity, l_discount) by accumulating the 9 moment sums
        // (X'X and X'y entries, each a round-then-DECIMAL sum, exact and
        // order-independent) and solving the 3x3 system by Cramer's rule
        // on the 1-row frame. This is the closed-form complement of the
        // iterative trainers (k-means q90, power iteration q157, NB
        // q182): no broadcast loop, one map-side-combinable aggregate at
        // any scale, coefficients bit-identical across partitionings.
        def m(e: String) = s"sum(cast(round($e, 9) as decimal(28,12)))"
        // spread the single-split scan: 9 decimal moment sums per row are
        // map-side CPU that otherwise runs on one core (r11, measured)
        Tables.spreadSmall(s, dir, "lineitem", table(s, dir, "lineitem"))
          .selectExpr("l_quantity as q", "l_discount as d", "l_extendedprice as y")
          .agg(
            count(lit(1)).as("n"),
            expr(s"${m("q")} as sq"), expr(s"${m("d")} as sd"),
            expr(s"${m("q * q")} as sqq"), expr(s"${m("q * d")} as sqd"),
            expr(s"${m("d * d")} as sdd"),
            expr(s"${m("y")} as sy"), expr(s"${m("q * y")} as sqy"),
            expr(s"${m("d * y")} as sdy"))
          .selectExpr("cast(n as double) as n",
            "cast(sq as double) as sq", "cast(sd as double) as sd",
            "cast(sqq as double) as sqq", "cast(sqd as double) as sqd",
            "cast(sdd as double) as sdd", "cast(sy as double) as sy",
            "cast(sqy as double) as sqy", "cast(sdy as double) as sdy")
          .withColumn("det", expr(
            """n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd)
               + sd * (sq * sqd - sqq * sd)"""))
          .selectExpr("cast(n as bigint) as n_rows",
            """round((sy * (sqq * sdd - sqd * sqd) - sq * (sqy * sdd - sqd * sdy)
               + sd * (sqy * sqd - sqq * sdy)) / det, 6) as beta0""",
            """round((n * (sqy * sdd - sqd * sdy) - sy * (sq * sdd - sqd * sd)
               + sd * (sq * sdy - sqy * sd)) / det, 6) as beta1""",
            """round((n * (sqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
               + sy * (sq * sqd - sqq * sd)) / det, 6) as beta2""")
      },
      Some("""
        WITH mm AS (
          SELECT CAST(COUNT(1) AS DOUBLE) AS n,
                 CAST(SUM(CAST(round(l_quantity, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sq,
                 CAST(SUM(CAST(round(l_discount, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sd,
                 CAST(SUM(CAST(round(l_quantity * l_quantity, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sqq,
                 CAST(SUM(CAST(round(l_quantity * l_discount, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sqd,
                 CAST(SUM(CAST(round(l_discount * l_discount, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sdd,
                 CAST(SUM(CAST(round(l_extendedprice, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(round(l_quantity * l_extendedprice, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sqy,
                 CAST(SUM(CAST(round(l_discount * l_extendedprice, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sdy
          FROM lineitem),
        d AS (
          SELECT *, n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd)
                    + sd * (sq * sqd - sqq * sd) AS det
          FROM mm)
        SELECT CAST(n AS BIGINT) AS n_rows,
               round((sy * (sqq * sdd - sqd * sqd) - sq * (sqy * sdd - sqd * sdy)
                      + sd * (sqy * sqd - sqq * sdy)) / det, 6) AS beta0,
               round((n * (sqy * sdd - sqd * sdy) - sy * (sq * sdd - sqd * sd)
                      + sd * (sq * sdy - sqy * sd)) / det, 6) AS beta1,
               round((n * (sqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
                      + sy * (sq * sqd - sqq * sd)) / det, 6) AS beta2
        FROM d"""),
      "Distributed OLS by normal equations: 9 exact decimal moment sums " +
        "in ONE map-side-combinable pass, 3x3 Cramer solve on the 1-row " +
        "frame — closed-form model training, coefficients bit-identical " +
        "across partitionings; complements the iterative trainers.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q205
    Q(
      "q205_survival_curve",
      (s, dir) => {
        // Kaplan-Meier survival curve of user LIFETIME (days between
        // first and last observed event — every user uncensored in this
        // fixed window): at each distinct lifetime L, d = users ending
        // at L, n_risk = users with lifetime >= L, and the survivor
        // S(L) = prod_{l <= L} (1 - d_l/n_l). Scale: one user-keyed
        // aggregate collapses the corpus to a users frame, one lifetime
        // aggregate collapses THAT to <= observation-window rows (a
        // constant), and the running product runs on the tiny frame via
        // a prefix self-join + per-row sorted fold — the q155 no-
        // global-window discipline; factors are exact-count divisions
        // folded in lifetime order (IEEE-identical both engines).
        val life = table(s, dir, "events")
          .selectExpr("user_id", "unix_millis(ts) div 86400000 as day")
          .groupBy("user_id")
          .agg((max("day") - min("day")).as("lt"))
        val byLt = life.groupBy("lt").agg(count(lit(1)).as("d"))
        val nTot = byLt.agg(sum("d").as("n_all"))
        // n_risk(L) = n_all - sum of d at lifetimes < L (tiny self-join)
        val risk = byLt.as("a")
          .join(broadcast(byLt.as("b")), col("b.lt") < col("a.lt"), "left")
          .groupBy(col("a.lt").as("lt"), col("a.d").as("d"))
          .agg(coalesce(sum("b.d"), lit(0L)).as("ended_before"))
          .crossJoin(broadcast(nTot))
          .withColumn("n_risk", col("n_all") - col("ended_before"))
          .withColumn("factor", expr(
            "1.0d - cast(d as double) / cast(n_risk as double)"))
        // S(L): per-row fold over the (l' <= L) prefix in lifetime order
        risk.as("x")
          .join(broadcast(risk.selectExpr("lt as lt2", "factor as f2")),
            col("lt2") <= col("x.lt"))
          .groupBy(col("x.lt").as("lt"), col("x.d").as("d"),
            col("x.n_risk").as("n_risk"))
          .agg(expr(
            """round(aggregate(
                 transform(array_sort(collect_list(struct(lt2, f2))), p -> p.f2),
                 cast(1.0 as double), (acc, v) -> acc * v), 6)""").as("survival"))
          .selectExpr("lt", "cast(d as bigint) as d",
            "cast(n_risk as bigint) as n_risk", "survival")
          .orderBy("lt")
      },
      Some("""
        WITH life AS (
          SELECT user_id,
                 MAX(epoch_ms(ts) // 86400000) - MIN(epoch_ms(ts) // 86400000) AS lt
          FROM events GROUP BY user_id),
        bylt AS (SELECT lt, COUNT(1) AS d FROM life GROUP BY lt),
        n AS (SELECT CAST(SUM(d) AS BIGINT) AS n_all FROM bylt),
        risk AS (
          SELECT a.lt, a.d,
                 n.n_all - COALESCE(SUM(b.d), 0) AS n_risk
          FROM bylt a LEFT JOIN bylt b ON b.lt < a.lt, n
          GROUP BY a.lt, a.d, n.n_all),
        f AS (
          SELECT lt, d, n_risk,
                 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
          FROM risk),
        surv AS (
          SELECT x.lt, x.d, x.n_risk,
                 round(list_reduce(
                   list_prepend(CAST(1.0 AS DOUBLE),
                     list(y.factor ORDER BY y.lt)),
                   (acc, v) -> acc * v), 6) AS survival
          FROM f x JOIN f y ON y.lt <= x.lt
          GROUP BY x.lt, x.d, x.n_risk)
        SELECT lt, CAST(d AS BIGINT) AS d, CAST(n_risk AS BIGINT) AS n_risk,
               survival
        FROM surv ORDER BY lt"""),
      "Kaplan-Meier lifetime curve: user-keyed aggregate to a users " +
        "frame, lifetime aggregate to a bounded-constant frame, running " +
        "survivor product via prefix self-join + sorted fold (no global " +
        "window) — exact-count factors, IEEE-identical folds."),

    // ---------------------------------------------------------------- q206
    Q(
      "q206_word_dropout",
      (s, dir) => {
        // Deterministic text augmentation: 10% word dropout keyed by
        // salted hash of (doc, position) — the reproducible-augmentation
        // primitive (same example always drops the same words, any
        // cluster size, any partitioning). Map-only: one compiled
        // filter-transform per row, no shuffle at all; the fingerprint
        // of the augmented text proves byte-identical reconstruction
        // cross-engine. Positions are 0-based in the hash key.
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("kept", expr(
            """filter(transform(toks, (t, i) -> named_struct('t', t, 'i', i)),
                 p -> cast(conv(substr(md5(concat('wd|', cast(doc_id as string),
                        '|', cast(p.i as string))), 1, 12), 16, 10) as bigint) % 10 != 0)"""))
          .selectExpr("doc_id", "size(toks) as n_orig", "size(kept) as n_kept",
            "size(toks) - size(kept) as n_dropped",
            "substr(md5(array_join(transform(kept, p -> p.t), ' ')), 1, 12) as aug_fp")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        k AS (
          SELECT doc_id, toks,
                 list_transform(
                   list_filter(range(1, len(toks) + 1),
                     i -> CAST(concat('0x', substr(md5(concat('wd|',
                            cast(doc_id as varchar), '|',
                            cast(i - 1 as varchar))), 1, 12)) AS BIGINT) % 10 != 0),
                   i -> toks[i]) AS kept
          FROM d)
        SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_orig,
               CAST(len(kept) AS INTEGER) AS n_kept,
               CAST(len(toks) - len(kept) AS INTEGER) AS n_dropped,
               substr(md5(array_to_string(kept, ' ')), 1, 12) AS aug_fp
        FROM k ORDER BY doc_id"""),
      "Deterministic 10% word dropout keyed by salted (doc, position) " +
        "hash — reproducible augmentation at any partitioning, map-only " +
        "compiled filter-transform; augmented-text fingerprints prove " +
        "byte-identical reconstruction cross-engine."),

    // ---------------------------------------------------------------- q207
    Q(
      "q207_phrase_search",
      (s, dir) => {
        // Exact phrase search through a POSITIONAL inverted index — the
        // scalable path for quoted-phrase queries: posting lists keyed
        // (token, doc, position), the corpus' most frequent trigram
        // elected as the query phrase (1 row, broadcast), and the three
        // term postings chained by (doc, pos+k) equi-joins — at 100 TB
        // this touches only the three terms' postings, never the corpus.
        // The oracle computes the SAME counts by naive per-doc trigram
        // scanning: equality proves the index path returns exactly the
        // brute-force answer.
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), posexplode(expr("tokenize_text(text)")).as(Seq("pos", "tok")))
        val phrase = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("explode(word_ngrams(toks, 3)) as tg")
          .groupBy("tg").agg(count(lit(1)).as("f"))
          .orderBy(col("f").desc, col("tg")).limit(1)
          .selectExpr("tg", "split(tg, ' ')[0] as w0", "split(tg, ' ')[1] as w1",
            "split(tg, ' ')[2] as w2")
        // one posting sub-list per term (each toks join is broadcast-
        // filtered to that term only), chained on (doc, pos+k) — pos is
        // unique per doc, so the chain joins are 1:1 lookups
        val t0 = toks.join(broadcast(phrase.select("tg", "w0")),
          col("tok") === col("w0")).select(col("doc_id"), col("pos"), col("tg"))
        val t1 = toks.join(broadcast(phrase.select("w1")),
          col("tok") === col("w1"))
          .select(col("doc_id"), (col("pos") - 1).as("pos"))
        val t2 = toks.join(broadcast(phrase.select("w2")),
          col("tok") === col("w2"))
          .select(col("doc_id"), (col("pos") - 2).as("pos"))
        t0.join(t1, Seq("doc_id", "pos"))
          .join(t2, Seq("doc_id", "pos"))
          .groupBy("doc_id", "tg")
          .agg(count(lit(1)).as("n_occ"))
          .selectExpr("doc_id", "tg as phrase", "n_occ")
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        tg AS (
          SELECT unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS tg
          FROM t WHERE len(toks) >= 3),
        phrase AS (
          SELECT tg, string_split(tg, ' ') AS w
          FROM (SELECT tg, COUNT(1) AS f FROM tg GROUP BY tg
                ORDER BY f DESC, tg LIMIT 1)),
        hits AS (
          SELECT t.doc_id, p.tg,
                 len(list_filter(range(1, len(t.toks) - 1),
                   i -> t.toks[i] = p.w[1] AND t.toks[i + 1] = p.w[2]
                        AND t.toks[i + 2] = p.w[3])) AS n_occ
          FROM t, phrase p)
        SELECT doc_id, tg AS phrase, CAST(n_occ AS BIGINT) AS n_occ
        FROM hits WHERE n_occ > 0
        ORDER BY doc_id"""),
      "Exact phrase search via positional postings: (token, doc, pos) " +
        "index, elected phrase broadcast, terms chained by (doc, pos+k) " +
        "equi-joins — touches only the query terms' postings at scale; " +
        "oracle's brute-force trigram scan proves exact equality.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q213
    Q(
      "q213_holt_forecast",
      (s, dir) => {
        // Holt double-exponential smoothing (level + trend) over each
        // event type's daily count series — the forecasting class:
        // one-step-ahead forecast plus in-sample MAE. alpha = 0.5 and
        // beta = 0.25 are dyadic, and the recurrence
        //   l' = a*x + (1-a)(l+b);  b' = B(l'-l) + (1-B)b
        // folds in fixed day order with the error sum carried IN the
        // fold state, so every double is one shared IEEE tree — the
        // q80 EWMA discipline extended to vector state. Scale: the
        // corpus collapses to the (type, day) frame in one aggregate;
        // the fold runs per type over a bounded day list (gather-once-
        // fold-once; task memory = one series).
        val daily = table(s, dir, "events")
          .selectExpr("event_type", "unix_millis(ts) div 86400000 as day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        daily.groupBy("event_type")
          .agg(expr(
            """aggregate(
                 transform(array_sort(collect_list(struct(day, cnt))), p -> cast(p.cnt as double)),
                 cast(null as struct<l: double, b: double, e: double, n: int>),
                 (acc, x) -> case when acc is null
                   then named_struct('l', x, 'b', cast(0 as double),
                                     'e', cast(0 as double), 'n', 1)
                   else named_struct(
                     'l', 0.5d * x + 0.5d * (acc.l + acc.b),
                     'b', 0.25d * ((0.5d * x + 0.5d * (acc.l + acc.b)) - acc.l)
                          + 0.75d * acc.b,
                     'e', acc.e + abs(x - (acc.l + acc.b)),
                     'n', acc.n + 1) end)""").as("st"))
          .selectExpr("event_type", "cast(st.n as bigint) as n_days",
            "round(st.l, 6) as level", "round(st.b, 6) as trend",
            "round(st.l + st.b, 6) as forecast_next",
            """case when st.n > 1
               then round(st.e / cast(st.n - 1 as double), 6)
               else cast(0 as double) end as mae""")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 COUNT(1) AS cnt
          FROM events GROUP BY 1, 2),
        ser AS (
          SELECT event_type,
                 list(CAST(cnt AS DOUBLE) ORDER BY day) AS vs
          FROM daily GROUP BY event_type),
        folded AS (
          SELECT event_type, len(vs) AS n,
                 list_reduce(
                   list_transform(vs, v -> [v, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]),
                   (acc, x) -> [
                     CAST(0.5 AS DOUBLE) * x[1] + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
                     CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * x[1]
                        + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
                        + CAST(0.75 AS DOUBLE) * acc[2],
                     acc[3] + abs(x[1] - (acc[1] + acc[2]))]) AS st
          FROM ser)
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               round(st[1], 6) AS level, round(st[2], 6) AS trend,
               round(st[1] + st[2], 6) AS forecast_next,
               CASE WHEN n > 1 THEN round(st[3] / CAST(n - 1 AS DOUBLE), 6)
                    ELSE CAST(0 AS DOUBLE) END AS mae
        FROM folded
        ORDER BY event_type"""),
      "Holt level+trend forecasting per event type: corpus collapses to " +
        "the (type, day) frame, then a fixed-order fold with (level, " +
        "trend, error-sum) vector state — one-step forecast + in-sample " +
        "MAE, bit-identical IEEE cross-engine; the q80 EWMA discipline " +
        "extended to the forecasting class.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q214
    Q(
      "q214_session_paths",
      (s, dir) => {
        // Sequence-pattern mining one level past q189's bigrams: the
        // top-10 FULL session paths (the ordered event-type string of
        // each 30-minute-gap session) by frequency — the "what do whole
        // journeys look like" readout. Scale: q40's sessionization
        // (per-user windows — thousands of small frames), one
        // (user, session) aggregate building each path with a sorted
        // fold (task memory = one session), then a path-keyed count and
        // TakeOrdered — no global sort, nothing corpus-sized after the
        // session aggregate.
        val w = Window.partitionBy("user_id")
          .orderBy(unix_millis(col("ts")), col("event_id"))
        val paths = table(s, dir, "events")
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("prev", lag("ms", 1).over(w))
          .withColumn("new_s", expr(
            "case when prev is null or ms - prev > 1800000 then 1 else 0 end"))
          .withColumn("sid", sum("new_s").over(w))
          .groupBy("user_id", "sid")
          .agg(expr(
            """array_join(transform(
                 array_sort(collect_list(struct(ms, event_id, event_type))),
                 p -> p.event_type), '>')""").as("path"))
        paths.groupBy("path")
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(10)
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                 lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev
          FROM events),
        s AS (
          SELECT user_id, event_id, event_type, ms,
                 SUM(CASE WHEN prev IS NULL OR ms - prev > 1800000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY ms, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
        p AS (
          SELECT user_id, sid,
                 array_to_string(list(event_type ORDER BY ms, event_id), '>') AS path
          FROM s GROUP BY user_id, sid)
        SELECT path, COUNT(1) AS n_sessions
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 10"""),
      "Top-10 full session paths (30-min-gap sessions, ordered event-" +
        "type strings): per-user windows, per-session sorted fold, " +
        "path-keyed count + TakeOrdered — whole-journey sequence mining " +
        "past q189's bigram matrix."),

    // ---------------------------------------------------------------- q215
    Q(
      "q215_windowed_conversion",
      (s, dir) => {
        // Windowed conversion: for each 'view', did the SAME user
        // 'purchase' within the next hour? — q86's funnel with the
        // time-window constraint real conversion metrics carry. The
        // match is AsofJoin.forward with tolerance (union + carry-
        // forward shape: ONE user-keyed shuffle, no join in the plan,
        // the same operator the tick-data q59 uses), then a per-day
        // aggregate of view/conversion counts. Nulling past-tolerance
        // matches is exact by the as-of argument: if the nearest
        // purchase is outside the hour, every later one is too.
        val ev = table(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), unix_millis(col("ts")).as("v_ms"),
            col("event_id"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("p_ms"),
            col("event_id").as("p_id"))
        graft.operators.AsofJoin
          .forward(views, buys, Seq("user_id"), "v_ms", "p_ms",
            tieBreak = Seq("p_id"), tolerance = Some(3600000L))
          .selectExpr("v_ms div 86400000 as day",
            "case when asof.p_id is not null then 1 else 0 end as conv")
          .groupBy("day")
          .agg(count(lit(1)).as("n_views"), sum("conv").as("n_conv"))
          .selectExpr("day", "n_views", "cast(n_conv as bigint) as n_conv",
            "round(cast(n_conv as double) / cast(n_views as double), 6) as conv_rate")
          .orderBy("day")
      },
      Some("""
        WITH v AS (
          SELECT user_id, event_id, epoch_ms(ts) AS v_ms
          FROM events WHERE event_type = 'view'),
        b AS (
          SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms
          FROM events WHERE event_type = 'purchase'),
        j AS (
          SELECT v.event_id, v.v_ms, b.p_id,
                 row_number() OVER (PARTITION BY v.event_id
                   ORDER BY b.p_ms ASC, b.p_id ASC) AS rn
          FROM v JOIN b
            ON b.user_id = v.user_id
           AND b.p_ms >= v.v_ms
           AND b.p_ms <= v.v_ms + 3600000),
        c AS (
          SELECT v.v_ms // 86400000 AS day,
                 CASE WHEN j.p_id IS NOT NULL THEN 1 ELSE 0 END AS conv
          FROM v LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
            ON v.event_id = j.event_id)
        SELECT day, COUNT(1) AS n_views,
               CAST(SUM(conv) AS BIGINT) AS n_conv,
               round(CAST(SUM(conv) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS conv_rate
        FROM c GROUP BY day
        ORDER BY day"""),
      "Windowed conversion (purchase within 1h of view) via forward " +
        "as-of with tolerance — one user-keyed shuffle, no join in the " +
        "plan, exact window nulling; per-day view/conversion rates, the " +
        "time-constrained funnel metric.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q216
    Q(
      "q216_attribution",
      (s, dir) => {
        // Last-touch attribution: every purchase credits the user's most
        // recent NON-purchase event within the trailing 7 days (the
        // marketing "which channel gets the sale" allocation; purchases
        // with no touch in the window land in '(none)'). The match is
        // AsofJoin.backward with tolerance — the same union+carry shape
        // as q08/q59/q215 (ONE user-keyed shuffle, no join in the plan);
        // the readout is a channel-sized aggregate with the 1-row total
        // broadcast back for shares.
        val ev = table(s, dir, "events")
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("p_ms"),
            col("event_id").as("p_id"))
        val touches = ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("t_ms"),
            col("event_id").as("t_id"), col("event_type"))
        val credited = graft.operators.AsofJoin
          .backward(buys, touches, Seq("user_id"), "p_ms", "t_ms",
            tieBreak = Seq("t_id"), tolerance = Some(7L * 24 * 3600 * 1000))
          .selectExpr("coalesce(asof.event_type, '(none)') as channel")
        val tot = credited.agg(count(lit(1)).as("n_tot"))
        credited.groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"))
          .crossJoin(broadcast(tot))
          .selectExpr("channel", "n_purchases",
            "round(cast(n_purchases as double) / cast(n_tot as double), 6) as share")
          .orderBy("channel")
      },
      Some("""
        WITH b AS (
          SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms
          FROM events WHERE event_type = 'purchase'),
        t AS (
          SELECT user_id, event_id AS t_id, epoch_ms(ts) AS t_ms, event_type
          FROM events WHERE event_type <> 'purchase'),
        j AS (
          SELECT b.p_id, t.event_type,
                 row_number() OVER (PARTITION BY b.p_id
                   ORDER BY t.t_ms DESC, t.t_id DESC) AS rn
          FROM b JOIN t
            ON t.user_id = b.user_id
           AND t.t_ms <= b.p_ms
           AND t.t_ms >= b.p_ms - 7 * 24 * 3600 * 1000),
        c AS (
          SELECT COALESCE(j.event_type, '(none)') AS channel
          FROM b LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
            ON b.p_id = j.p_id),
        tot AS (SELECT COUNT(1) AS n_tot FROM c)
        SELECT channel, COUNT(1) AS n_purchases,
               round(CAST(COUNT(1) AS DOUBLE) / CAST(tot.n_tot AS DOUBLE), 6) AS share
        FROM c, tot
        GROUP BY channel, tot.n_tot
        ORDER BY channel"""),
      "Last-touch attribution: each purchase credits the latest non-" +
        "purchase event within 7 days via backward as-of WITH tolerance " +
        "(union+carry, one user-keyed shuffle, no join in the plan) — " +
        "channel-sized aggregate, shares from the broadcast total.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q217
    Q(
      "q217_ridge_fit",
      (s, dir) => {
        // Ridge regression beside q204's OLS from the SAME sufficient
        // statistics — the regularization concept with ZERO extra
        // passes: once the 9 moment sums exist, any lambda is pure
        // 1-row arithmetic (lambda * n added to the two non-intercept
        // diagonal entries of X'X; the intercept stays unpenalized).
        // Output: both fits side by side plus the coefficient
        // shrinkage ratios — the readout that says what the penalty
        // actually did. At 100 TB this is THE argument for sufficient-
        // statistics training: the corpus pass is shared across every
        // hyperparameter.
        def m(e: String) = s"sum(cast(round($e, 9) as decimal(28,12)))"
        val lam = "100.0d"
        // spread the single-split scan (the q204 evidence)
        Tables.spreadSmall(s, dir, "lineitem", table(s, dir, "lineitem"))
          .selectExpr("l_quantity as q", "l_discount as d", "l_extendedprice as y")
          .agg(
            count(lit(1)).as("n"),
            expr(s"${m("q")} as sq"), expr(s"${m("d")} as sd"),
            expr(s"${m("q * q")} as sqq"), expr(s"${m("q * d")} as sqd"),
            expr(s"${m("d * d")} as sdd"),
            expr(s"${m("y")} as sy"), expr(s"${m("q * y")} as sqy"),
            expr(s"${m("d * y")} as sdy"))
          .selectExpr("cast(n as double) as n",
            "cast(sq as double) as sq", "cast(sd as double) as sd",
            "cast(sqq as double) as sqq", "cast(sqd as double) as sqd",
            "cast(sdd as double) as sdd", "cast(sy as double) as sy",
            "cast(sqy as double) as sqy", "cast(sdy as double) as sdy")
          .selectExpr("n", "sq", "sd", "sqd", "sy", "sqy", "sdy",
            "sqq as oqq", "sdd as odd",
            s"sqq + $lam as rqq", s"sdd + $lam as rdd")
          .withColumn("odet", expr(
            """n * (oqq * odd - sqd * sqd) - sq * (sq * odd - sqd * sd)
               + sd * (sq * sqd - oqq * sd)"""))
          .withColumn("rdet", expr(
            """n * (rqq * rdd - sqd * sqd) - sq * (sq * rdd - sqd * sd)
               + sd * (sq * sqd - rqq * sd)"""))
          .selectExpr("cast(n as bigint) as n_rows",
            """round((n * (sqy * odd - sqd * sdy) - sy * (sq * odd - sqd * sd)
               + sd * (sq * sdy - sqy * sd)) / odet, 6) as ols_b1""",
            """round((n * (oqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
               + sy * (sq * sqd - oqq * sd)) / odet, 6) as ols_b2""",
            """round((n * (sqy * rdd - sqd * sdy) - sy * (sq * rdd - sqd * sd)
               + sd * (sq * sdy - sqy * sd)) / rdet, 6) as ridge_b1""",
            """round((n * (rqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
               + sy * (sq * sqd - rqq * sd)) / rdet, 6) as ridge_b2""",
            """round(((n * (sqy * rdd - sqd * sdy) - sy * (sq * rdd - sqd * sd)
               + sd * (sq * sdy - sqy * sd)) / rdet)
               / ((n * (sqy * odd - sqd * sdy) - sy * (sq * odd - sqd * sd)
               + sd * (sq * sdy - sqy * sd)) / odet), 6) as shrink_b1""")
      },
      Some("""
        WITH mm AS (
          SELECT CAST(COUNT(1) AS DOUBLE) AS n,
                 CAST(SUM(CAST(round(l_quantity, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sq,
                 CAST(SUM(CAST(round(l_discount, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sd,
                 CAST(SUM(CAST(round(l_quantity * l_quantity, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sqq,
                 CAST(SUM(CAST(round(l_quantity * l_discount, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sqd,
                 CAST(SUM(CAST(round(l_discount * l_discount, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sdd,
                 CAST(SUM(CAST(round(l_extendedprice, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(round(l_quantity * l_extendedprice, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sqy,
                 CAST(SUM(CAST(round(l_discount * l_extendedprice, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sdy
          FROM lineitem),
        e AS (
          SELECT n, sq, sd, sqd, sy, sqy, sdy,
                 sqq AS oqq, sdd AS odd,
                 sqq + 100.0 AS rqq, sdd + 100.0 AS rdd
          FROM mm),
        d AS (
          SELECT *,
                 n * (oqq * odd - sqd * sqd) - sq * (sq * odd - sqd * sd)
                   + sd * (sq * sqd - oqq * sd) AS odet,
                 n * (rqq * rdd - sqd * sqd) - sq * (sq * rdd - sqd * sd)
                   + sd * (sq * sqd - rqq * sd) AS rdet
          FROM e)
        SELECT CAST(n AS BIGINT) AS n_rows,
               round((n * (sqy * odd - sqd * sdy) - sy * (sq * odd - sqd * sd)
                      + sd * (sq * sdy - sqy * sd)) / odet, 6) AS ols_b1,
               round((n * (oqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
                      + sy * (sq * sqd - oqq * sd)) / odet, 6) AS ols_b2,
               round((n * (sqy * rdd - sqd * sdy) - sy * (sq * rdd - sqd * sd)
                      + sd * (sq * sdy - sqy * sd)) / rdet, 6) AS ridge_b1,
               round((n * (rqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
                      + sy * (sq * sqd - rqq * sd)) / rdet, 6) AS ridge_b2,
               round(((n * (sqy * rdd - sqd * sdy) - sy * (sq * rdd - sqd * sd)
                      + sd * (sq * sdy - sqy * sd)) / rdet)
                     / ((n * (sqy * odd - sqd * sdy) - sy * (sq * odd - sqd * sd)
                      + sd * (sq * sdy - sqy * sd)) / odet), 6) AS shrink_b1
        FROM d"""),
      "Ridge beside OLS from the SAME 9 moment sums (lambda on the non-" +
        "intercept diagonal, intercept unpenalized) — regularized " +
        "training as 1-row arithmetic over shared sufficient statistics; " +
        "one corpus pass serves every hyperparameter.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q219
    Q(
      "q219_psi_drift",
      (s, dir) => {
        // Population Stability Index — THE production feature-drift
        // monitor (the time-axis complement of q136's per-source token
        // KL): reference deciles of event `value` from the first 15
        // days (EXACT order statistics via GlobalRank's two-phase
        // shape), current-window counts bucketed against those
        // boundaries, PSI = sum (p-q) ln(p/q) with 0.5-count smoothing
        // so empty buckets stay finite. Scale: one rank pass over the
        // reference half, boundaries collapse to a 9-element broadcast
        // array, both halves bucket map-only, 10-row arithmetic after.
        val ev = table(s, dir, "events")
          .selectExpr("event_id", "value",
            "unix_millis(ts) div 86400000 as day")
        val d0 = ev.agg(min("day").as("d0"))
        val tagged = ev.crossJoin(broadcast(d0))
          .withColumn("is_ref", expr("day < d0 + 15"))
        val ref = tagged.filter(col("is_ref")).withColumn("seg", lit(0))
        // r12: lazy bounds (the q99 pattern) — measured 3.45 -> 2.74 s
        val refIn = ref.select("seg", "event_id", "value")
        val bounds = graft.operators.GlobalRank
          .withGlobalRank(refIn, "seg", "value", "event_id",
            precomputedBounds = Some(
              graft.operators.GlobalRank.boundsOf(refIn, "seg", "value")))
          .withColumn("k", explode(expr("sequence(1, 9)")))
          .filter(expr("rn = (n_seg * k + 9) div 10"))
          .groupBy("seg")
          .agg(expr("array_sort(collect_list(struct(k, value)))").as("bs"))
          .selectExpr("transform(bs, p -> p.value) as barr")
        val bucketed = tagged.crossJoin(broadcast(bounds))
          .withColumn("bucket", expr("size(filter(barr, b -> value > b))"))
          .groupBy("bucket")
          .agg(sum(expr("case when is_ref then 1 else 0 end")).as("n_ref"),
            sum(expr("case when is_ref then 0 else 1 end")).as("n_cur"))
        val tot = bucketed.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
        val terms = bucketed.crossJoin(broadcast(tot))
          .withColumn("p", expr(
            "(cast(n_ref as double) + 0.5d) / (cast(tr as double) + 5.0d)"))
          .withColumn("q", expr(
            "(cast(n_cur as double) + 0.5d) / (cast(tc as double) + 5.0d)"))
          .withColumn("term", expr("(p - q) * ln(p / q)"))
        val psi = terms.agg(expr(
          "round(sum(cast(round(term, 12) as decimal(28,12))), 6)").as("psi"))
        terms.crossJoin(broadcast(psi))
          .selectExpr("cast(bucket as int) as bucket",
            "cast(n_ref as bigint) as n_ref", "cast(n_cur as bigint) as n_cur",
            "round(p, 6) as p_ref", "round(q, 6) as p_cur",
            "round(term, 6) as psi_term", "cast(psi as double) as psi")
          .orderBy("bucket")
      },
      Some("""
        WITH ev AS (
          SELECT event_id, value, epoch_ms(ts) // 86400000 AS day
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        tagged AS (
          SELECT e.event_id, e.value, e.day < d0.d0 + 15 AS is_ref
          FROM ev e, d0),
        ranked AS (
          SELECT value,
                 ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
                 COUNT(1) OVER () AS n_seg
          FROM tagged WHERE is_ref),
        bs AS (
          SELECT list(value ORDER BY k) AS barr FROM (
            SELECT k.k, r.value
            FROM ranked r CROSS JOIN (SELECT unnest(range(1, 10)) AS k) k
            WHERE r.rn = (r.n_seg * k.k + 9) // 10)),
        bucketed AS (
          SELECT len(list_filter(bs.barr, b -> t.value > b)) AS bucket,
                 CAST(SUM(CASE WHEN t.is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                 CAST(SUM(CASE WHEN t.is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
          FROM tagged t, bs
          GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
                 CAST(SUM(n_cur) AS BIGINT) AS tc
          FROM bucketed),
        terms AS (
          SELECT b.bucket, b.n_ref, b.n_cur,
                 (CAST(b.n_ref AS DOUBLE) + 0.5) / (CAST(tot.tr AS DOUBLE) + 5.0) AS p,
                 (CAST(b.n_cur AS DOUBLE) + 0.5) / (CAST(tot.tc AS DOUBLE) + 5.0) AS q
          FROM bucketed b, tot),
        t2 AS (
          SELECT *, (p - q) * ln(p / q) AS term FROM terms),
        psi AS (
          SELECT round(SUM(CAST(round(term, 12) AS DECIMAL(28,12))), 6) AS psi
          FROM t2)
        SELECT CAST(t2.bucket AS INTEGER) AS bucket, t2.n_ref, t2.n_cur,
               round(t2.p, 6) AS p_ref, round(t2.q, 6) AS p_cur,
               round(t2.term, 6) AS psi_term, CAST(psi.psi AS DOUBLE) AS psi
        FROM t2, psi
        ORDER BY t2.bucket"""),
      "Population Stability Index: reference deciles from the first 15 " +
        "days via GlobalRank's exact two-phase order statistics, both " +
        "windows bucketed map-only against the 9-element broadcast " +
        "boundary array, smoothed (p-q)ln(p/q) terms — the production " +
        "numeric-drift monitor beside q136's token KL."),

    // ---------------------------------------------------------------- q220
    Q(
      "q220_temporal_join",
      (s, dir) => {
        // Temporal-table (AS OF VALIDITY) join: probe rows enrich
        // against the SCD2 history q89 builds — key equality + the
        // validity-interval predicate `valid_from <= t < valid_to`
        // (open tail NULL = current row). Probe times are placed
        // deterministically inside the history window (orders' own
        // dates don't overlap the event fixture — documented synthetic
        // placement; the semantics under test are the interval match,
        // left-preservation of pre-history probes, and the q45
        // equi+range shape: ONE shuffle on the user key, range as
        // residual, fanout bounded by intervals-per-user).
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"), col("event_type"))
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val hist = ev
          .withColumn("chg",
            when(lag("event_type", 1).over(w).isNull ||
              lag("event_type", 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("island", sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "island", "event_type")
          .agg(min("ms").as("vf"))
          .withColumn("vt", lead("vf", 1).over(
            Window.partitionBy("user_id").orderBy("island")))
          .select(col("user_id").as("ukey"), col("event_type").as("state"),
            col("vf"), col("vt"))
        val span = ev.agg(min("ms").as("lo"), max("ms").as("hi"),
          (max("user_id") + 1).as("u"))
        val probes = table(s, dir, "orders")
          .crossJoin(broadcast(span))
          .selectExpr("o_orderkey", "o_custkey % u as ukey",
            "lo + (o_orderkey * 9973) % (hi - lo + 1) as t",
            "cast(o_totalprice as decimal(18,2)) as price")
        probes
          .join(hist,
            probes("ukey") === hist("ukey") && col("t") >= col("vf") &&
              (col("vt").isNull || col("t") < col("vt")), "left")
          .selectExpr("coalesce(state, '(pre)') as state", "price")
          .groupBy("state")
          .agg(count(lit(1)).as("n_orders"),
            expr("cast(sum(price) as double)").as("revenue"))
          .orderBy("state")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
                 CASE WHEN lag(event_type) OVER w IS NULL
                        OR lag(event_type) OVER w <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        isl AS (
          SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                      ORDER BY ms, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS island
          FROM e),
        hist AS (
          SELECT user_id AS ukey, event_type AS state, MIN(ms) AS vf,
                 lead(MIN(ms)) OVER (PARTITION BY user_id ORDER BY island) AS vt
          FROM isl GROUP BY user_id, island, event_type),
        span AS (
          SELECT MIN(epoch_ms(ts)) AS lo, MAX(epoch_ms(ts)) AS hi,
                 MAX(user_id) + 1 AS u
          FROM events),
        probes AS (
          SELECT o.o_orderkey, o.o_custkey % s.u AS ukey,
                 s.lo + (o.o_orderkey * 9973) % (s.hi - s.lo + 1) AS t,
                 CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
          FROM orders o, span s),
        j AS (
          SELECT COALESCE(h.state, '(pre)') AS state, p.price
          FROM probes p LEFT JOIN hist h
            ON h.ukey = p.ukey AND p.t >= h.vf
           AND (h.vt IS NULL OR p.t < h.vt))
        SELECT state, COUNT(1) AS n_orders,
               CAST(SUM(price) AS DOUBLE) AS revenue
        FROM j GROUP BY state
        ORDER BY state"""),
      "Temporal-table join against the q89 SCD2 history: key equality + " +
        "validity-interval residual (open tail = current), pre-history " +
        "probes preserved as '(pre)' — the q45 equi+range shape, one " +
        "user-keyed shuffle, fanout bounded by intervals-per-user.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q221
    Q(
      "q221_funnel_timing",
      (s, dir) => {
        // Funnel TIMING — q86 says who converts, this says how fast:
        // per user, the first click, the first view at-or-after it, the
        // first purchase at-or-after that (the sequential-first chain),
        // then the EXACT median of both stage gaps across converting
        // users via GlobalRank's two-phase rank (users-frame medians —
        // no single-task percentile buffer). Three conditional
        // user-keyed aggregates + two rank passes; everything after is
        // 1-row arithmetic.
        import graft.operators.GlobalRank
        val ev = table(s, dir, "events")
          .select(col("user_id"), unix_millis(col("ts")).as("ms"),
            col("event_type"))
        val c = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ms").as("c_ms"))
        val v = ev.filter(col("event_type") === "view").join(c, "user_id")
          .filter(col("ms") >= col("c_ms"))
          .groupBy("user_id", "c_ms").agg(min("ms").as("v_ms"))
        val p = ev.filter(col("event_type") === "purchase").join(v, "user_id")
          .filter(col("ms") >= col("v_ms"))
          .groupBy("user_id", "c_ms", "v_ms").agg(min("ms").as("p_ms"))
        val gaps = p.selectExpr("user_id", "v_ms - c_ms as g1", "p_ms - v_ms as g2")
          .withColumn("seg", lit(0))
        val m1 = GlobalRank.withGlobalRank(
          gaps.select("seg", "user_id", "g1"), "seg", "g1", "user_id")
          .filter(expr("rn = (n_seg + 1) div 2"))
          .select(col("g1").as("med_g1_ms"), col("n_seg").as("n_conv"))
        val m2 = GlobalRank.withGlobalRank(
          gaps.select("seg", "user_id", "g2"), "seg", "g2", "user_id")
          .filter(expr("rn = (n_seg + 1) div 2"))
          .select(col("g2").as("med_g2_ms"))
        m1.crossJoin(broadcast(m2))
          .selectExpr("cast(n_conv as bigint) as n_conv",
            "med_g1_ms", "med_g2_ms")
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
        c AS (
          SELECT user_id, MIN(ms) AS c_ms FROM e
          WHERE event_type = 'click' GROUP BY user_id),
        v AS (
          SELECT e.user_id, c.c_ms, MIN(e.ms) AS v_ms
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'view' AND e.ms >= c.c_ms
          GROUP BY e.user_id, c.c_ms),
        p AS (
          SELECT e.user_id, v.c_ms, v.v_ms, MIN(e.ms) AS p_ms
          FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ms >= v.v_ms
          GROUP BY e.user_id, v.c_ms, v.v_ms),
        gaps AS (
          SELECT user_id, v_ms - c_ms AS g1, p_ms - v_ms AS g2 FROM p),
        r1 AS (
          SELECT g1, ROW_NUMBER() OVER (ORDER BY g1, user_id) AS rn,
                 COUNT(1) OVER () AS n FROM gaps),
        r2 AS (
          SELECT g2, ROW_NUMBER() OVER (ORDER BY g2, user_id) AS rn,
                 COUNT(1) OVER () AS n FROM gaps)
        SELECT CAST(r1.n AS BIGINT) AS n_conv,
               r1.g1 AS med_g1_ms, r2.g2 AS med_g2_ms
        FROM r1, r2
        WHERE r1.rn = (r1.n + 1) // 2 AND r2.rn = (r2.n + 1) // 2"""),
      "Funnel stage timing: sequential-first chain (first click -> first " +
        "view after -> first purchase after) via conditional user-keyed " +
        "aggregates, exact stage-gap medians via GlobalRank two-phase " +
        "ranks — how fast conversion happens, not just whether.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q241
    Q(
      "q241_mann_kendall",
      (s, dir) => {
        // Mann-Kendall monotone-trend test per nation over monthly revenue
        // — the nonparametric drift monitor (is this series trending,
        // without assuming a model?). The corpus collapses FIRST to a
        // (nation x month) frame via one map-combining exact-DECIMAL
        // aggregate; the pairwise sign stage is a nation-keyed self-join
        // over that BOUNDED frame (80 months -> <=3160 pairs per nation,
        // independent of corpus size — the pre-aggregate is what makes
        // the O(n^2) statistic scale-safe). S and the tie-free normal
        // approximation z derive exactly: decimal sums compare exactly,
        // integer pair counts, doubles only in tau/z.
        val monthly = table(s, dir, "orders")
          .join(broadcast(table(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), date_trunc("month", col("o_orderdate")).as("m"))
          .agg(sum(expr("cast(round(o_totalprice, 9) as decimal(28,12))")).as("x"))
        val a = monthly.select(col("nation"), col("m").as("m1"), col("x").as("x1"))
        val b = monthly.select(col("nation"), col("m").as("m2"), col("x").as("x2"))
        a.join(b, Seq("nation"))
          .filter(col("m1") < col("m2"))
          .groupBy("nation")
          .agg(
            sum(when(col("x2") > col("x1"), 1L)
              .when(col("x2") < col("x1"), -1L).otherwise(0L)).as("s"),
            (countDistinct(col("m1")) + lit(1)).as("n_months"))
          .selectExpr(
            "nation", "cast(n_months as bigint) as n_months", "s",
            "round(cast(s as double) / (n_months * (n_months - 1) / 2), 6) as tau",
            """round(case when s > 0 then (cast(s as double) - 1.0d)
                            / sqrt(n_months * (n_months - 1) * (2 * n_months + 5) / 18.0d)
                          when s < 0 then (cast(s as double) + 1.0d)
                            / sqrt(n_months * (n_months - 1) * (2 * n_months + 5) / 18.0d)
                          else 0.0d end, 6) as z""",
            """case when s > 0 then 'increasing'
                    when s < 0 then 'decreasing' else 'none' end as trend""")
          .orderBy("nation")
      },
      Some("""
        WITH monthly AS (
          SELECT n.n_name AS nation, date_trunc('month', o.o_orderdate) AS m,
                 SUM(CAST(round(o.o_totalprice, 9) AS DECIMAL(28,12))) AS x
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY nation, m),
        pairs AS (
          SELECT a.nation,
                 CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
                 a.m AS m1
          FROM monthly a JOIN monthly b
            ON a.nation = b.nation AND a.m < b.m),
        st AS (
          SELECT nation, CAST(SUM(sgn) AS BIGINT) AS s,
                 CAST(COUNT(DISTINCT m1) + 1 AS BIGINT) AS n_months
          FROM pairs GROUP BY nation)
        SELECT nation, n_months, s,
               round(CAST(s AS DOUBLE) / (n_months * (n_months - 1) / 2), 6) AS tau,
               round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                            / sqrt(n_months * (n_months - 1) * (2 * n_months + 5) / 18.0)
                          WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                            / sqrt(n_months * (n_months - 1) * (2 * n_months + 5) / 18.0)
                          ELSE 0.0 END, 6) AS z,
               CASE WHEN s > 0 THEN 'increasing'
                    WHEN s < 0 THEN 'decreasing' ELSE 'none' END AS trend
        FROM st ORDER BY nation"""),
      "Mann-Kendall trend test per nation: monthly exact-DECIMAL revenue " +
        "series (corpus collapses first, so the O(months^2) sign stage is " +
        "bounded at <=3160 pairs/nation forever), S/tau/z with the " +
        "continuity-corrected normal approximation — nonparametric drift " +
        "monitoring beside q219's PSI.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q253
    Q(
      "q253_theil_sen",
      (s, dir) => {
        // Theil-Sen robust trend slope per nation — the ESTIMATOR paired
        // with q241's Mann-Kendall TEST (same monthly collapse, same
        // bounded pair stage): the median of all pairwise slopes
        // (x_j - x_i)/(j - i) over month indices, immune to outlier
        // months where OLS (q204) is not. Slopes are exact-decimal
        // differences divided by integer month gaps (IEEE-identical
        // cross-engine); the median is the midpoint average over a
        // per-nation window of <= 3160 pair rows — bounded forever, the
        // same reason the O(n^2) stage is scale-safe.
        val monthly = table(s, dir, "orders")
          .join(broadcast(table(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            expr("year(o_orderdate) * 12 + month(o_orderdate)").as("mi"))
          .agg(sum(expr("cast(round(o_totalprice, 9) as decimal(28,12))")).as("x"))
        val a = monthly.select(col("nation"), col("mi").as("i1"), col("x").as("x1"))
        val b = monthly.select(col("nation"), col("mi").as("i2"), col("x").as("x2"))
        val slopes = a.join(b, Seq("nation"))
          .filter(col("i1") < col("i2"))
          .select(col("nation"),
            expr("(cast(x2 as double) - cast(x1 as double)) / (i2 - i1)").as("slope"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("nation").orderBy("slope")
        slopes
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("nation")))
          .filter(col("rn") === expr("cast(floor((n + 1) / 2) as int)") ||
            col("rn") === expr("cast(ceil(cast((n + 1) as double) / 2) as int)"))
          .groupBy("nation")
          .agg(max(col("n")).cast("long").as("n_pairs"),
            round(avg(col("slope")), 6).as("sen_slope"))
          .orderBy("nation")
      },
      Some("""
        WITH monthly AS (
          SELECT n.n_name AS nation,
                 year(o.o_orderdate) * 12 + month(o.o_orderdate) AS mi,
                 SUM(CAST(round(o.o_totalprice, 9) AS DECIMAL(28,12))) AS x
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY nation, mi),
        slopes AS (
          SELECT a.nation,
                 (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) / (b.mi - a.mi) AS slope
          FROM monthly a JOIN monthly b
            ON a.nation = b.nation AND a.mi < b.mi),
        ranked AS (
          SELECT nation, slope,
                 row_number() OVER (PARTITION BY nation ORDER BY slope) AS rn,
                 COUNT(1) OVER (PARTITION BY nation) AS n
          FROM slopes)
        SELECT nation, CAST(MAX(n) AS BIGINT) AS n_pairs,
               round(AVG(slope), 6) AS sen_slope
        FROM ranked
        WHERE rn = CAST(floor((n + 1) / 2) AS INTEGER)
           OR rn = CAST(ceil(CAST(n + 1 AS DOUBLE) / 2) AS INTEGER)
        GROUP BY nation ORDER BY nation"""),
      "Theil-Sen robust slope per nation: median of pairwise monthly " +
        "slopes (exact-decimal diffs over integer month gaps), midpoint " +
        "median over the bounded <=3160-pair frame — the outlier-immune " +
        "estimator beside q241's Mann-Kendall test and q204's OLS."),

    // ---------------------------------------------------------------- q254
    Q(
      "q254_benford_audit",
      (s, dir) => {
        // Benford first-digit audit over order totals — the classic
        // fabricated-data screen a data-quality pipeline runs on any
        // money-like column. First digits derive from the CENTS integer
        // (multiplying by 100 never changes the leading digit, and a
        // bigint's string form is engine-stable — no log10 on doubles,
        // whose last-ulp is libm-dependent). Expected probabilities are
        // 12-digit LITERALS (identical text both engines, bit-identical
        // doubles); the chi-square contribution is IEEE arithmetic on
        // exact counts. One map-side digit extraction + one 9-row
        // aggregate; the digit table broadcasts.
        val digits = table(s, dir, "orders")
          .selectExpr(
            "substring(cast(cast(round(o_totalprice * 100) as bigint) as string), 1, 1) as d")
          .groupBy("d").agg(count(lit(1)).as("n"))
        val expected = s.createDataFrame(Seq(
          ("1", 0.301029995664), ("2", 0.176091259056), ("3", 0.124938736608),
          ("4", 0.096910013008), ("5", 0.079181246048), ("6", 0.066946789631),
          ("7", 0.057991946978), ("8", 0.051152522447), ("9", 0.045757490561)))
          .toDF("d", "p_benford")
        digits.crossJoin(broadcast(digits.agg(sum("n").as("n_total"))))
          .join(broadcast(expected), Seq("d"))
          .selectExpr("d", "n",
            "round(cast(n as double) / cast(n_total as double), 6) as frac",
            "p_benford",
            """round(pow(cast(n as double) - cast(n_total as double) * p_benford, 2)
                     / (cast(n_total as double) * p_benford), 6) as chi2_term""")
          .orderBy("d")
      },
      Some("""
        WITH digits AS (
          SELECT substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS d,
                 CAST(COUNT(1) AS BIGINT) AS n
          FROM orders GROUP BY d),
        expected AS (
          SELECT d, CAST(p_raw AS DOUBLE) AS p_benford FROM (VALUES
            ('1', 0.301029995664), ('2', 0.176091259056), ('3', 0.124938736608),
            ('4', 0.096910013008), ('5', 0.079181246048), ('6', 0.066946789631),
            ('7', 0.057991946978), ('8', 0.051152522447), ('9', 0.045757490561))
            t(d, p_raw)),
        tot AS (SELECT SUM(n) AS n_total FROM digits)
        SELECT d, n,
               round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS frac,
               p_benford,
               round(pow(CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) * p_benford, 2)
                     / (CAST(n_total AS DOUBLE) * p_benford), 6) AS chi2_term
        FROM digits JOIN expected USING (d) CROSS JOIN tot
        ORDER BY d"""),
      "Benford first-digit audit: leading digits from the exact cents " +
        "integer (no libm log10), literal 12-digit Benford expectations, " +
        "per-digit chi-square contributions — the fabricated-data screen " +
        "for money columns; map-side extraction + one 9-row aggregate."),

    // ---------------------------------------------------------------- q255
    Q(
      "q255_kendall_tau_b",
      (s, dir) => {
        // Tie-corrected Kendall's tau-b between two POOLED monthly series
        // (revenue vs order count) — the concordance complement of q244's
        // Spearman and q44's Pearson: tau_b = (C - D) /
        // sqrt((n0 - t_x)(n0 - t_y)) where t_x/t_y are tied-pair counts.
        // The corpus collapses to ~80 month rows first; the pair stage is
        // bounded at months^2/2 forever. Concordance compares exact
        // DECIMAL revenue and integer counts — no float enters until the
        // final tau arithmetic.
        val monthly = table(s, dir, "orders")
          .groupBy(expr("year(o_orderdate) * 12 + month(o_orderdate)").as("mi"))
          .agg(sum(expr("cast(round(o_totalprice, 9) as decimal(28,12))")).as("x"),
            count(lit(1)).as("y"))
        val a = monthly.select(col("mi").as("i1"), col("x").as("x1"), col("y").as("y1"))
        val b = monthly.select(col("mi").as("i2"), col("x").as("x2"), col("y").as("y2"))
        a.join(b).filter(col("i1") < col("i2"))
          .agg(
            count(lit(1)).as("n0"),
            sum(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
              (col("x1") > col("x2") && col("y1") > col("y2")), 1L).otherwise(0L)).as("c"),
            sum(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
              (col("x1") > col("x2") && col("y1") < col("y2")), 1L).otherwise(0L)).as("d"),
            sum(when(col("x1") === col("x2"), 1L).otherwise(0L)).as("tx"),
            sum(when(col("y1") === col("y2"), 1L).otherwise(0L)).as("ty"))
          .selectExpr("n0", "c", "d", "tx", "ty",
            """round((cast(c as double) - cast(d as double))
                 / sqrt(cast(n0 - tx as double) * cast(n0 - ty as double)), 6)
               as tau_b""")
      },
      Some("""
        WITH monthly AS (
          SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
                 SUM(CAST(round(o_totalprice, 9) AS DECIMAL(28,12))) AS x,
                 CAST(COUNT(1) AS BIGINT) AS y
          FROM orders GROUP BY mi),
        pairs AS (
          SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
          FROM monthly a JOIN monthly b ON a.mi < b.mi)
        SELECT CAST(COUNT(1) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN (x1 < x2 AND y1 < y2) OR (x1 > x2 AND y1 > y2)
                             THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN (x1 < x2 AND y1 > y2) OR (x1 > x2 AND y1 < y2)
                             THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(SUM(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
               CAST(SUM(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
               round((CAST(SUM(CASE WHEN (x1 < x2 AND y1 < y2) OR (x1 > x2 AND y1 > y2)
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                      - CAST(SUM(CASE WHEN (x1 < x2 AND y1 > y2) OR (x1 > x2 AND y1 < y2)
                                      THEN 1 ELSE 0 END) AS DOUBLE))
                 / sqrt(CAST(COUNT(1) - SUM(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS DOUBLE)
                        * CAST(COUNT(1) - SUM(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS DOUBLE)), 6)
               AS tau_b
        FROM pairs"""),
      "Tie-corrected Kendall tau-b between pooled monthly revenue and " +
        "order count: concordant/discordant census over the bounded " +
        "months^2 pair frame, ties counted per variable, exact-DECIMAL/" +
        "integer comparisons — float only in the final tau arithmetic.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q257
    Q(
      "q257_cusum_changepoint",
      (s, dir) => {
        // CUSUM changepoint location over the pooled monthly revenue
        // series — the "WHEN did the level shift" complement to q241/
        // q253's "is there a trend": CUSUM_t = prefix_sum_t - t * mean,
        // the classic cumulative deviation curve; the changepoint
        // estimate is the month maximizing |CUSUM| (earliest month on
        // exact ties). Prefix sums are exact DECIMAL over a window of
        // the BOUNDED monthly frame (~80 rows — never corpus-sized);
        // mean and the deviation curve are IEEE-identical doubles.
        val monthly = table(s, dir, "orders")
          .groupBy(expr("year(o_orderdate) * 12 + month(o_orderdate)").as("mi"))
          .agg(sum(expr("cast(round(o_totalprice, 9) as decimal(28,12))")).as("x"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("mi").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = monthly.agg(
          sum("x").as("sx"), count(lit(1)).as("n"))
        // cusum_t/cusum_ps are RESERVED aliases in PlanShapesSpec's global-
        // window allowlist: these two global frames run over the monthly
        // AGGREGATE (~80 rows forever), never corpus rows
        monthly
          .withColumn("cusum_t", expr("cast(row_number() over (order by mi) as int)"))
          .withColumn("cusum_ps", sum("x").over(w))
          .crossJoin(broadcast(tot))
          .selectExpr("mi", "cusum_t", "n",
            """cast(cusum_ps as double) - cast(cusum_t as double)
               * (cast(sx as double) / cast(n as double)) as cusum""")
          .orderBy(expr("abs(cusum)").desc, col("mi"))
          .limit(1)
          .selectExpr("cast(n as bigint) as n_months",
            "mi as cp_month_index", "cusum_t as cp_position",
            "round(cusum, 6) as cusum_at_cp")
      },
      Some("""
        WITH monthly AS (
          SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
                 SUM(CAST(round(o_totalprice, 9) AS DECIMAL(28,12))) AS x
          FROM orders GROUP BY mi),
        tot AS (SELECT SUM(x) AS sx, CAST(COUNT(1) AS BIGINT) AS n FROM monthly),
        curve AS (
          SELECT mi,
                 CAST(row_number() OVER (ORDER BY mi) AS INTEGER) AS t,
                 SUM(x) OVER (ORDER BY mi
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps
          FROM monthly)
        SELECT n AS n_months, mi AS cp_month_index, t AS cp_position,
               round(CAST(ps AS DOUBLE)
                     - CAST(t AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                 AS cusum_at_cp
        FROM curve CROSS JOIN tot
        ORDER BY abs(CAST(ps AS DOUBLE)
                     - CAST(t AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) DESC,
                 mi
        LIMIT 1"""),
      "CUSUM changepoint: cumulative deviation curve over the bounded " +
        "monthly frame (exact-DECIMAL prefix sums, IEEE deviation), " +
        "argmax |CUSUM| with earliest-month tie-break — the level-shift " +
        "locator beside the q241/q253 trend pair.")
  )
}
