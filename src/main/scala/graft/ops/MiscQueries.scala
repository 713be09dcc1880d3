package graft.ops

import graft.Tables
import graft.ext.MinHashAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage completion for SURVEY §2.2: GROUPING SETS through the SQL
  * surface, exact percentiles, sketch aggregates, struct/map scalar ops,
  * and a custom mergeable UDAF (typed Aggregator).
  */
object MiscQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // MODERN SQL SURFACE in one statement — the analyst-ergonomics
    // features Spark 4 and DuckDB both ship: an inline VALUES dim
    // table, GROUP BY ALL (group by every non-aggregate select item),
    // SELECT * EXCEPT (drop a column without re-listing the rest), and
    // ORDER BY ALL. Semantics are plain agg+join — the point is that
    // the sugar resolves identically in both engines. Money in integer
    // cents (floor of the double product is IEEE-identical).
    "q182_sql_modern" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("ord_modern")
      s.sql(
        """WITH status_dim AS (
             SELECT * FROM VALUES ('O', 'open'), ('F', 'filled'), ('P', 'partial')
               AS s(o_orderstatus, status_name)),
           agg AS (
             SELECT o.o_orderstatus, d.status_name,
                    CAST(year(o.o_orderdate) AS INT) AS yr,
                    count(*) AS n_orders,
                    sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS cents
             FROM ord_modern o JOIN status_dim d USING (o_orderstatus)
             GROUP BY ALL)
           SELECT * EXCEPT (o_orderstatus) FROM agg ORDER BY ALL""")
    }),

    // SKYLINE (Pareto frontier) — the preference-query operator: parts
    // that are non-dominated under (minimize price, maximize size). The
    // naive formulation is an O(n²) dominance anti-join; the 2-D
    // skyline collapses to two window maxima: p is dominated iff some
    // part is strictly cheaper with ≥ size (prefix max over the price
    // order, RANGE-bounded to exclude price peers) or equally priced
    // with > size (max within the price peer group). Both windows ride
    // ONE sort of (price, size) — no pair ever materializes. The
    // global-ordered window serializes per price domain at the extreme;
    // q151's two-level prefix-sum trick applies verbatim if the domain
    // were 100 TB-wide (per-range partial maxima, then carry-in).
    "q158_skyline" -> ((s, d) => {
      val wBefore = Window.orderBy(col("cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wPeers = Window.partitionBy(col("cents"))
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"),
          floor(col("p_retailprice") * 100).as("cents"),
          col("p_size").cast("long").as("sz"))
        .withColumn("best_cheaper", coalesce(max(col("sz")).over(wBefore), lit(-1L)))
        .withColumn("best_peer", max(col("sz")).over(wPeers))
        .filter(col("sz") > col("best_cheaper") && col("sz") === col("best_peer"))
        .select("p_partkey", "p_name", "cents", "sz")
        .orderBy("cents", "p_partkey")
    }),

    // Arbitrary GROUPING SETS via the SQL surface (spark.sql + temp view).
    "q35_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_gs")
      s.sql(
        s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                   COALESCE(l_linestatus, 'ALL') AS ls,
                   count(1) AS n,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM li_gs
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
            ORDER BY rf, ls""")
    }),

    // Struct construction/field access + map construction/lookup.
    "q38_struct_map" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("info", struct(col("p_brand").as("brand"), col("p_size").as("sz")))
        .withColumn("m", map_from_arrays(
          array(lit("type"), lit("brand")),
          array(col("p_type"), col("p_brand"))))
        .select(
          col("p_partkey"),
          col("info.brand").as("info_brand"),
          col("info.sz").as("info_sz"),
          element_at(col("m"), "type").as("m_type"),
          try_element_at(col("m"), lit("absent")).as("m_absent"))
        .orderBy("p_partkey")
    }),

    // collect_list/collect_set made deterministic: sort, then serialize.
    "q55_collect" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          array_join(sort_array(collect_set(col("l_linenumber"))), ",").as("linenumbers"),
          array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"))
        .orderBy("l_returnflag")
    }),

    // Pearson correlation from exact decimal moment sums: built-in corr()
    // is accumulation-order-dependent; the five moments are exact decimals
    // (2-decimal inputs), so the final double formula is deterministic at
    // any parallelism.
    "q56_corr_moments" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum((x * y).cast("decimal(28,4)")).cast("double").as("sxy"),
          sum((x * x).cast("decimal(28,4)")).cast("double").as("sxx"),
          sum((y * y).cast("decimal(28,4)")).cast("double").as("syy"))
        .select(
          col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 8).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // listagg (Spark 4 WITHIN GROUP ordered string aggregation) — the
    // SQL-standard within-group concat, deterministic via the WITHIN
    // GROUP order over a pre-deduped subquery. NOTE: the natural
    // `listagg(DISTINCT x, ',') WITHIN GROUP (ORDER BY x)` throws a
    // ClassCastException (AttributeReference -> SortOrder) in Spark
    // 4.1's analyzer; dedup-then-aggregate sidesteps it and shuffles
    // only the two small distinct columns anyway.
    "q148_listagg" -> ((s, d) => {
      Tables.part(s, d)
        .createOrReplaceTempView("part_lagg")
      s.sql(
        """SELECT p_brand,
                  listagg(p_type, ',') WITHIN GROUP (ORDER BY p_type) AS types,
                  count(1) AS n_types
           FROM (SELECT DISTINCT p_brand, p_type FROM part_lagg)
           GROUP BY p_brand
           ORDER BY p_brand""")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): complete daily spine over the
    // event range, zero-filled counts — the gaps a plain groupBy can't emit.
    "q57_recursive_cte" -> ((s, d) => {
      // prefetch the loop bounds driver-side: a recursive member that
      // references a full-scan aggregate CTE re-executes the scan EVERY
      // iteration in Spark (CTEs inline); two scalar literals instead
      val b = Tables.events(s, d)
        .agg(min(date_trunc("day", col("ts"))).as("mn"),
          max(date_trunc("day", col("ts"))).as("mx")).head()
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val (mn, mx) = (fmt.format(b.getTimestamp(0)), fmt.format(b.getTimestamp(1)))
      Tables.events(s, d).createOrReplaceTempView("ev_rc")
      s.sql(
        s"""WITH RECURSIVE spine(day) AS (
             SELECT TIMESTAMP '$mn'
             UNION ALL
             SELECT day + INTERVAL '1' DAY FROM spine
             WHERE day < TIMESTAMP '$mx'),
           counts AS (
             SELECT date_trunc('day', ts) AS day, count(1) AS n
             FROM ev_rc GROUP BY 1)
           SELECT s.day, COALESCE(c.n, 0) AS n
           FROM spine s LEFT JOIN counts c USING (day)
           ORDER BY s.day""")
    }),

    // Multiset (bag) semantics: EXCEPT ALL / INTERSECT ALL.
    "q46_multiset_ops" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def bag(y: Int) = li.filter(year(col("l_shipdate")) === y)
        .select("l_returnflag", "l_linenumber")
      val a = bag(1997); val b = bag(1998)
      a.exceptAll(b).withColumn("tag", lit("except_all"))
        .unionByName(a.intersectAll(b).withColumn("tag", lit("intersect_all")))
        .groupBy("tag", "l_returnflag", "l_linenumber")
        .agg(count(lit(1)).as("n"))
        .orderBy("tag", "l_returnflag", "l_linenumber")
    }),

    // JSON parsing into typed structs (from_json), vs q29's path extraction.
    "q47_from_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).as("p"))
        .select(col("event_id"), col("p.k").as("k_val"))
        .orderBy("event_id")
    }),

    // Generator with ordinality (posexplode).
    "q48_posexplode" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .orderBy("doc_id", "pos")
    }),

    // Regex capture groups + match predicate.
    "q65_regex_groups" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract(col("text"), "^([a-z0-9]+) ([a-z0-9]+)", 2).as("second_word"),
          col("text").rlike("spark").as("mentions_spark"))
        .orderBy("doc_id")
    }),

    // Array higher-order functions: transform / filter / aggregate / sort.
    "q39_array_hofs" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(filter(col("words"), w => length(w) > 4)).as("n_long"),
          aggregate(transform(col("words"), w => length(w)), lit(0),
            (acc, v) => acc + v).as("total_chars"),
          array_join(slice(array_sort(array_distinct(col("words"))), 1, 5), ",").as("first5_sorted"))
        .orderBy("doc_id")
    }),

    // Unpivot / melt: wide measure columns → (measure, value) rows via the
    // stack generator, then re-aggregate. The long shape is what feature
    // stores and metric pipelines shuffle, so the melt must not
    // materialize the wide row first.
    "q58_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .selectExpr(
          """stack(3, 'quantity', l_quantity,
                      'extendedprice', l_extendedprice,
                      'discount', l_discount) AS (measure, val)""")
        .groupBy("measure")
        .agg(dsum(col("val"), 4).as("total"), count(lit(1)).as("n"))
        .orderBy("measure")
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist.
    // Ordering inside the frame is tiebroken by the unique key so the
    // quartile assignment is total (deterministic cross-engine).
    "q59_window_distribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
        .orderBy("o_orderkey")
    }),

    // VARIANT semi-structured type (Spark 4): parse_json into a variant
    // column, typed extraction via variant_get — the modern schema-
    // on-read path (binary-encoded, no per-access string re-parse like
    // get_json_object).
    "q05_variant_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_val"))
        .orderBy("event_id")
    }),

    // SQL pipe syntax (Spark 4): the same relational program as chained
    // |> stages — parser-level coverage that the SQL surface is current.
    "q06_sql_pipe" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("ord_pipe")
      s.sql(
        """FROM ord_pipe
           |> WHERE o_totalprice > 100000
           |> AGGREGATE count(*) AS n,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              GROUP BY o_orderpriority
           |> ORDER BY o_orderpriority""")
    }),

    // LATERAL correlated subquery: per-customer top order (the per-row
    // dependent-join shape; Catalyst decorrelates to a ranked join).
    "q07_lateral_topk" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("cust_lat")
      Tables.orders(s, d).createOrReplaceTempView("ord_lat")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           FROM cust_lat c,
           LATERAL (SELECT o_orderkey, o_totalprice FROM ord_lat
                    WHERE o_custkey = c.c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
           ORDER BY c.c_custkey""")
    }),

    // Modern SQL session surface (Spark 4): a session VARIABLE feeding a
    // named-PARAMETER query, with a lateral column alias reusing a
    // just-computed projection. The oracle inlines the same constants —
    // variables/parameters are session mechanics, not semantics.
    "q115_sql_session" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("ord_sess")
      s.sql("DECLARE OR REPLACE VARIABLE graft_min_price DOUBLE DEFAULT 0.0")
      s.sql("SET VARIABLE graft_min_price = 150000.0")
      s.sql(
        """SELECT o_orderpriority,
                  count(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                  total / n AS avg_price -- lateral column alias
           FROM ord_sess
           WHERE o_totalprice > graft_min_price
             AND year(o_orderdate) >= :min_year
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority""",
        Map("min_year" -> 1994))
    }),

    // Error-safe scalar functions (try_divide / try_cast /
    // try_element_at): malformed input yields NULL instead of a task
    // failure — at 100 TB one dirty row must never kill the job.
    "q08_try_functions" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_quantity, l_linenumber - l_linenumber)").as("div0"),
        expr("try_cast(l_returnflag AS INT)").as("bad_int"),
        expr("try_cast(cast(l_linenumber AS STRING) AS INT)").as("good_int"),
        expr("try_element_at(split(l_returnflag, ','), 99)").as("oob"))
        .orderBy("l_orderkey", "l_linenumber", "good_int")
    }),

    // Correlated scalar subquery (Catalyst decorrelates it into an
    // aggregate + join): orders priced 1.5x above their own customer's
    // decimal-exact average.
    "q77_correlated_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("ord_corr")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM ord_corr o
           WHERE o_totalprice > (
             SELECT 1.5 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                        / count(o2.o_totalprice)
             FROM ord_corr o2 WHERE o2.o_custkey = o.o_custkey)
           ORDER BY o_orderkey""")
    }),

    // Value window functions over an unbounded frame:
    // first_value / last_value / nth_value.
    "q78_value_windows" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
        .orderBy("o_orderkey")
    }),

    // Map higher-order functions (transform_values / map_filter), the
    // map-typed sibling of q39's array HOFs; result exploded to rows and
    // totally ordered so the oracle compares first-principles SQL.
    "q99_map_hofs" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("m", map_from_arrays(
          array(lit("size"), lit("price")),
          array(col("p_size").cast("double"), col("p_retailprice"))))
        .withColumn("m2", expr("transform_values(m, (k, v) -> v * 2)"))
        .withColumn("mf", expr("map_filter(m2, (k, v) -> v > 50)"))
        .select(col("p_partkey"), explode(col("mf")).as(Seq("k", "v")))
        .orderBy("p_partkey", "k")
    }),

    // Salted two-phase aggregation over a heavy-hitter key (3 distinct
    // values of l_returnflag — every row funnels into 3 reducers without
    // the salt). Identical result to the plain groupBy; the value rides
    // as exact decimal so partial sums are order-independent.
    "q75_salted_skew" -> ((s, d) => {
      Salting.saltedCountSum(Tables.lineitem(s, d),
          col("l_returnflag"),
          col("l_quantity").cast("decimal(18,2)"), buckets = 32)
        .select(col("k").as("l_returnflag"), col("n"),
          col("total").cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    })
  )

  def oracles: Map[String, String] = Map(
    "q182_sql_modern" ->
      """WITH status_dim AS (
            SELECT * FROM (VALUES ('O', 'open'), ('F', 'filled'),
                                  ('P', 'partial'))
              s(o_orderstatus, status_name)),
          agg AS (
            SELECT o.o_orderstatus, d.status_name,
                   CAST(year(o.o_orderdate) AS INTEGER) AS yr,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders o JOIN status_dim d USING (o_orderstatus)
            GROUP BY ALL)
          SELECT * EXCLUDE (o_orderstatus) FROM agg ORDER BY ALL""",

    "q158_skyline" ->
      """WITH p AS (SELECT p_partkey, p_name,
                           CAST(floor(p_retailprice * 100) AS BIGINT) AS cents,
                           CAST(p_size AS BIGINT) AS sz
                    FROM part),
          m AS (SELECT p_partkey, p_name, cents, sz,
                       COALESCE(max(sz) OVER (ORDER BY cents
                         RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), -1) AS best_cheaper,
                       max(sz) OVER (PARTITION BY cents) AS best_peer
                FROM p)
          SELECT p_partkey, p_name, cents, sz
          FROM m WHERE sz > best_cheaper AND sz = best_peer
          ORDER BY cents, p_partkey""",

    "q148_listagg" ->
      """SELECT p_brand,
                string_agg(p_type, ',' ORDER BY p_type) AS types,
                count(*) AS n_types
          FROM (SELECT DISTINCT p_brand, p_type FROM part)
          GROUP BY p_brand ORDER BY p_brand""",

    "q115_sql_session" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
          FROM orders
          WHERE o_totalprice > 150000.0 AND year(o_orderdate) >= 1994
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q08_try_functions" ->
      """SELECT l_orderkey, l_linenumber,
                l_quantity / NULLIF(l_linenumber - l_linenumber, 0) AS div0,
                TRY_CAST(l_returnflag AS INTEGER) AS bad_int,
                TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS good_int,
                str_split(l_returnflag, ',')[99] AS oob
          FROM lineitem
          ORDER BY l_orderkey, l_linenumber, good_int""",

    "q05_variant_json" ->
      """SELECT event_id,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
          FROM events ORDER BY event_id""",

    "q06_sql_pipe" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM orders WHERE o_totalprice > 100000
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q07_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          FROM customer c,
          LATERAL (SELECT o_orderkey, o_totalprice FROM orders o2
                   WHERE o2.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
          ORDER BY c.c_custkey""",

    "q99_map_hofs" ->
      """WITH kv AS (
            SELECT p_partkey, 'size' AS k, CAST(p_size AS DOUBLE) * 2 AS v FROM part
            UNION ALL
            SELECT p_partkey, 'price' AS k, p_retailprice * 2 AS v FROM part)
          SELECT p_partkey, k, v FROM kv WHERE v > 50
          ORDER BY p_partkey, k""",

    "q77_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
          WHERE o_totalprice > (
            SELECT 1.5 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       / count(o2.o_totalprice)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""",

    "q78_value_windows" ->
      """SELECT o_orderkey, o_orderpriority,
                first_value(o_orderkey) OVER w AS first_key,
                last_value(o_orderkey) OVER w AS last_key,
                nth_value(o_orderkey, 3) OVER w AS third_key
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
          ORDER BY o_orderkey""",

    "q75_salted_skew" ->
      s"""SELECT l_returnflag, count(*) AS n, ${oSum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q58_unpivot" ->
      s"""WITH m AS (
            SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT 'extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'discount', l_discount FROM lineitem)
          SELECT measure, ${oSum("val", 4)} AS total, count(*) AS n
          FROM m GROUP BY measure ORDER BY measure""",

    "q59_window_distribution" ->
      """SELECT o_orderkey, o_orderpriority,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cdist
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey)
          ORDER BY o_orderkey""",

    "q35_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls,
                count(1) AS n,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY rf, ls""",

    "q57_recursive_cte" ->
      """WITH RECURSIVE bounds AS (
             SELECT min(date_trunc('day', ts)) AS mn, max(date_trunc('day', ts)) AS mx
             FROM events),
           spine(day) AS (
             SELECT mn FROM bounds
             UNION ALL
             SELECT day + INTERVAL '1' DAY FROM spine, bounds WHERE day < mx),
           counts AS (
             SELECT date_trunc('day', ts) AS day, count(1) AS n
             FROM events GROUP BY 1)
           SELECT s.day, COALESCE(c.n, 0) AS n
           FROM spine s LEFT JOIN counts c USING (day)
           ORDER BY s.day""",

    "q55_collect" ->
      """SELECT l_returnflag,
            array_to_string(list_sort(list(DISTINCT l_linenumber)), ',') AS linenumbers,
            array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q56_corr_moments" ->
      """WITH m AS (
            SELECT l_returnflag, count(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
              CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
              CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS syy
            FROM lineitem GROUP BY l_returnflag)
          SELECT l_returnflag,
                 round((n * sxy - sx * sy) /
                   (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 8) AS corr_qty_price
          FROM m ORDER BY l_returnflag""",

    "q46_multiset_ops" ->
      """WITH a AS (SELECT l_returnflag, l_linenumber FROM lineitem WHERE year(l_shipdate) = 1997),
              b AS (SELECT l_returnflag, l_linenumber FROM lineitem WHERE year(l_shipdate) = 1998),
          tagged AS (
            SELECT 'except_all' AS tag, * FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
            UNION ALL
            SELECT 'intersect_all' AS tag, * FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
          SELECT tag, l_returnflag, l_linenumber, count(*) AS n
          FROM tagged GROUP BY 1, 2, 3 ORDER BY tag, l_returnflag, l_linenumber""",

    "q47_from_json" ->
      """SELECT event_id,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
          FROM events ORDER BY event_id""",

    "q48_posexplode" ->
      """WITH tok AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents
                      WHERE doc_id < 100),
          posn AS (SELECT doc_id, words,
                          unnest(generate_series(1, len(words))) AS p FROM tok)
          SELECT doc_id, CAST(p - 1 AS INTEGER) AS pos, words[p] AS word
          FROM posn ORDER BY doc_id, pos""",

    "q65_regex_groups" ->
      """SELECT doc_id,
            regexp_extract(text, '^([a-z0-9]+) ([a-z0-9]+)', 2) AS second_word,
            regexp_matches(text, 'spark') AS mentions_spark
          FROM documents ORDER BY doc_id""",

    "q39_array_hofs" ->
      """SELECT doc_id,
            CAST(len(list_filter(str_split(text, ' '), w -> length(w) > 4)) AS INTEGER) AS n_long,
            CAST(list_reduce(list_transform(str_split(text, ' '), w -> CAST(length(w) AS INTEGER)),
                 (acc, v) -> acc + v) AS INTEGER) AS total_chars,
            array_to_string(list_sort(list_distinct(str_split(text, ' ')))[1:5], ',') AS first5_sorted
          FROM documents ORDER BY doc_id""",

    "q38_struct_map" ->
      """SELECT p_partkey,
                struct_pack(brand := p_brand, sz := p_size).brand AS info_brand,
                struct_pack(brand := p_brand, sz := p_size).sz AS info_sz,
                p_type AS m_type,
                CAST(NULL AS VARCHAR) AS m_absent
          FROM part ORDER BY p_partkey"""
  )
}
