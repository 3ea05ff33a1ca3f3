package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2) exercised on the
  * driver's TPC-H-ish testdata. Each query has a DuckDB oracle with
  * identical column names and deterministic values.
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame plan —
  * Catalyst pushes filters/projections into the parquet scan, aggregations
  * are partial (map-side) before the shuffle, and dimension joins broadcast
  * (region/nation/supplier/customer are small relative to fact tables).
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** §2.6 GROUP BY aggregate (TPC-H Q1 shape): sum/avg/count over lineitem.
    * Partial aggregation happens map-side; the shuffle carries only
    * (flag,status) groups — cardinality 6 — so this scales linearly. */
  val q01Agg: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(col("l_extendedprice")).as("sum_base_price"),
        lavg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** §2.4 filter + projection pushdown: predicate reaches the parquet scan
    * (verify via explain: PushedFilters), only 3 columns are read. */
  val q02Filter: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .agg(lsumProd(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** §2.5 multi-way equi-join: fact ⋈ dims with broadcast of the small side.
    * At 100 TB, orders is the big side; customer/nation/region broadcast —
    * zero shuffle for the dim joins, one shuffle for the final group-by. */
  val q03JoinDims: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val n = load(s, dir, "nation")
    val r = load(s, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(lsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** §2.6 A1/A2 whole-row DISTINCT (the reference's dim dedup semantics:
    * distinct over the full selected row, not per-key). */
  val q04Distinct: Q = (s, dir) => {
    load(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** §2.7 L1/O1 top-k: global orderBy+limit compiles to TakeOrderedAndProject
    * (per-partition heap + driver merge — no full sort at scale).
    * o_orderkey tiebreak keeps the result set deterministic. */
  val q05TopK: Q = (s, dir) => {
    load(s, dir, "orders")
      .select(col("o_orderkey"), dec2(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
  }

  /** §2.7 W1 ranking window: top-3 orders per customer. Single shuffle on
    * the partition key; rank ties broken by o_orderkey. */
  val q06WindowRank: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    load(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        dec2(col("o_totalprice")).cast("double").as("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** §2.7 W1 analytic window with a running frame: cumulative account-style
    * sum per customer over order date (exact decimal accumulation). */
  val q07WindowRunning: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** §2.7 U1 UNION ALL (the reference's append-accumulate semantics):
    * two relations unioned then re-aggregated. */
  val q08Union: Q = (s, dir) => {
    val c = load(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
    val su = load(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))
    c.unionByName(su).groupBy("nationkey").agg(count(lit(1)).as("n")).orderBy("nationkey")
  }

  /** §2.5 left-semi join (EXISTS): orders that have at least one lineitem. */
  val q09Semi: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    val li = load(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"))
    o.join(li, Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** §2.5 left-anti join (NOT EXISTS): customers with no orders in 1995-H1
    * (date-windowed so the result is non-empty at every scale factor). */
  val q10Anti: Q = (s, dir) => {
    val c = load(s, dir, "customer")
    val o = load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-02-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** §2.6 ROLLUP hierarchy totals (region → nation → grand total), via the
    * engine's SQL surface (spark.sql over registered views) — the DataFrame
    * `.rollup` path trips SPARK's ambiguous-self-join guard on Expand, and
    * SQL resolution is the idiomatic route for grouping sets anyway. */
  val q11Rollup: Q = (s, dir) => {
    load(s, dir, "customer").createOrReplaceTempView("g_customer")
    load(s, dir, "nation").createOrReplaceTempView("g_nation")
    load(s, dir, "region").createOrReplaceTempView("g_region")
    s.sql(s"""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
             |COUNT(*) AS n_customers, ${sqlLsum("c_acctbal")} AS sum_bal
             |FROM g_customer
             |JOIN g_nation ON c_nationkey = n_nationkey
             |JOIN g_region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name) ORDER BY 1,2""".stripMargin)
  }

  /** §2.6 CUBE over lineitem flags. */
  val q12Cube: Q = (s, dir) => {
    load(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(lsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")
  }

  /** §2.8 CASE WHEN conditional aggregation (TPC-H Q12 shape). */
  val q13CaseWhen: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    val li = load(s, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** §2.8 string functions: length/upper/lower/substr/replace/trim/concat. */
  val q14StringFuncs: Q = (s, dir) => {
    load(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        sum(length(col("p_name"))).as("sum_name_len"),
        countDistinct(upper(col("p_type"))).as("n_types"),
        sum(length(regexp_replace(col("p_name"), "a", ""))).as("sum_len_no_a"),
        max(concat(upper(substring(col("p_name"), 1, 3)), lit("_"), lower(col("p_brand")))).as("max_tag"))
      .orderBy("p_brand")
  }

  /** §2.8 date functions: year/month/quarter extraction + date arithmetic. */
  val q15DateFuncs: Q = (s, dir) => {
    load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate").cast("date").as("d"))
      .groupBy(year(col("d")).as("y"), quarter(col("d")).as("q"))
      .agg(count(lit(1)).as("n_orders"),
        lsum(col("o_totalprice")).as("revenue"),
        min(col("d")).as("first_day"),
        max(col("d")).as("last_day"))
      .orderBy("y", "q")
  }

  /** §2.8 F2 — the reference's release-date precision normalization
    * (year / year-month / full-date strings → DATE), applied to dates
    * truncated by orderkey mod 3. Mirrors
    * airflow/dags/dbt/spotify_etl_aws/models/staging/stg_albums.sql:7-12. */
  val q16DateNormalize: Q = (s, dir) => {
    val o = load(s, dir, "orders")
      .withColumn("dstr", col("o_orderdate").cast("date").cast("string"))
      .withColumn("raw_date",
        when(col("o_orderkey") % 3 === 0, substring(col("dstr"), 1, 4))
          .when(col("o_orderkey") % 3 === 1, substring(col("dstr"), 1, 7))
          .otherwise(col("dstr")))
    o.withColumn("norm_date",
        when(length(col("raw_date")) === 4, to_date(concat(col("raw_date"), lit("-01-01"))))
          .when(length(col("raw_date")) === 7, to_date(concat(col("raw_date"), lit("-01"))))
          .when(length(col("raw_date")) === 10, to_date(col("raw_date")))
          .otherwise(lit(null).cast("date")))
      .groupBy(year(col("norm_date")).as("y"), month(col("norm_date")).as("m"))
      .agg(count(lit(1)).as("n"))
      .orderBy("y", "m")
  }

  /** §2.8 F5 + §7.4-1 stringly-bronze semantics: values round-tripped
    * through strings and cast back (bad casts → null, coalesce defaults). */
  val q17StringlyCasts: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .select(
        col("l_orderkey").cast("string").as("s_orderkey"),
        col("l_quantity").cast("string").as("s_quantity"),
        when(col("l_returnflag") === "N", lit(null).cast("string"))
          .otherwise(col("l_returnflag")).as("s_flag"))
    li.select(
        col("s_orderkey").cast("long").as("orderkey"),
        col("s_quantity").cast("double").as("quantity"),
        coalesce(col("s_flag"), lit("UNKNOWN")).as("flag"),
        col("s_orderkey").cast("int").as("ik"))
      .groupBy("flag")
      .agg(count(lit(1)).as("n"), lsum(col("quantity")).as("sum_qty"),
        max(col("orderkey")).as("max_key"))
      .orderBy("flag")
  }

  /** §2.6 exact COUNT(DISTINCT) — two-level shuffle (expand + final). */
  val q18CountDistinct: Q = (s, dir) => {
    load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** §2.5 join + HAVING-style post-aggregation filter (TPC-H Q3 shape). */
  val q19JoinAggHaving: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    val li = load(s, dir, "lineitem")
    // Pre-aggregate the fact BEFORE the join: the group key equals the
    // join key and orders is unique per key, so aggregating first is
    // result-identical while the join input shrinks from raw lineitem to
    // one row per order (map-side partial combine then ~4× fewer shuffled
    // rows at TPC-H shape), and the HAVING prunes before the join ever
    // runs. Join-then-aggregate would shuffle the full fact — the version
    // of this query that does not survive a 100× scale-up.
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(lsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .filter(col("n_lines") >= 5)
    perOrder.join(o, perOrder("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderkey"), col("revenue"), col("n_lines"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(20)
  }

  /** §2.4/§2.5 correlated-EXISTS shape via aggregation: suppliers and their
    * lineitem revenue (TPC-H Q15-lite) — join with pre-aggregated subquery. */
  val q20SubqueryAgg: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val su = load(s, dir, "supplier")
    val rev = li.groupBy(col("l_suppkey"))
      .agg(lsumRevenue(col("l_extendedprice"), col("l_discount")).as("total_rev"))
    su.join(rev, su("s_suppkey") === rev("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(desc("total_rev"), asc("s_suppkey"))
  }

  val all: Map[String, Q] = Map(
    "q01_agg" -> q01Agg,
    "q02_filter_pushdown" -> q02Filter,
    "q03_join_dims" -> q03JoinDims,
    "q04_distinct" -> q04Distinct,
    "q05_topk" -> q05TopK,
    "q06_window_rank" -> q06WindowRank,
    "q07_window_running" -> q07WindowRunning,
    "q08_union" -> q08Union,
    "q09_semi_join" -> q09Semi,
    "q10_anti_join" -> q10Anti,
    "q11_rollup" -> q11Rollup,
    "q12_cube" -> q12Cube,
    "q13_case_when" -> q13CaseWhen,
    "q14_string_funcs" -> q14StringFuncs,
    "q15_date_funcs" -> q15DateFuncs,
    "q16_date_normalize" -> q16DateNormalize,
    "q17_stringly_casts" -> q17StringlyCasts,
    "q18_count_distinct" -> q18CountDistinct,
    "q19_join_agg_having" -> q19JoinAggHaving,
    "q20_subquery_agg" -> q20SubqueryAgg,
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${sqlLsum("l_quantity")} AS sum_qty,
         |${sqlLsum("l_extendedprice")} AS sum_base_price,
         |${sqlLavg("l_discount")} AS avg_disc,
         |COUNT(*) AS count_order
         |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_filter_pushdown" ->
      s"""SELECT ${sqlLsumProd("l_extendedprice", "l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
         |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,
    "q03_join_dims" ->
      s"""SELECT r_name, n_name, ${sqlLsum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q04_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1,2",
    "q05_topk" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice, CAST(rn AS INT) AS rn
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q07_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q08_union" ->
      """SELECT nationkey, COUNT(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01')
        |ORDER BY c_custkey""".stripMargin,
    "q11_rollup" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
         |COUNT(*) AS n_customers, ${sqlLsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name) ORDER BY 1,2""".stripMargin,
    "q12_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |COALESCE(l_linestatus, 'ALL') AS linestatus,
         |${sqlLsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY 1,2""".stripMargin,
    "q13_case_when" ->
      """SELECT l_linestatus,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_string_funcs" ->
      """SELECT p_brand,
        |CAST(SUM(LENGTH(p_name)) AS BIGINT) AS sum_name_len,
        |COUNT(DISTINCT UPPER(p_type)) AS n_types,
        |CAST(SUM(LENGTH(REPLACE(p_name, 'a', ''))) AS BIGINT) AS sum_len_no_a,
        |MAX(CONCAT(UPPER(SUBSTRING(p_name, 1, 3)), '_', LOWER(p_brand))) AS max_tag
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_date_funcs" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS y,
         |CAST(EXTRACT(QUARTER FROM CAST(o_orderdate AS DATE)) AS INT) AS q,
         |COUNT(*) AS n_orders, ${sqlLsum("o_totalprice")} AS revenue,
         |MIN(CAST(o_orderdate AS DATE)) AS first_day,
         |MAX(CAST(o_orderdate AS DATE)) AS last_day
         |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q16_date_normalize" ->
      """WITH raw AS (
        |  SELECT CASE CAST(o_orderkey % 3 AS INT)
        |    WHEN 0 THEN SUBSTRING(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 4)
        |    WHEN 1 THEN SUBSTRING(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
        |    ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS raw_date
        |  FROM orders),
        |norm AS (
        |  SELECT CASE
        |    WHEN LENGTH(raw_date) = 4 THEN CAST(CONCAT(raw_date, '-01-01') AS DATE)
        |    WHEN LENGTH(raw_date) = 7 THEN CAST(CONCAT(raw_date, '-01') AS DATE)
        |    WHEN LENGTH(raw_date) = 10 THEN CAST(raw_date AS DATE)
        |    ELSE NULL END AS norm_date
        |  FROM raw)
        |SELECT CAST(EXTRACT(YEAR FROM norm_date) AS INT) AS y,
        |CAST(EXTRACT(MONTH FROM norm_date) AS INT) AS m,
        |COUNT(*) AS n FROM norm GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q17_stringly_casts" ->
      s"""WITH stringly AS (
         |  SELECT CAST(l_orderkey AS VARCHAR) AS s_orderkey,
         |    CAST(l_quantity AS VARCHAR) AS s_quantity,
         |    CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS s_flag
         |  FROM lineitem)
         |SELECT COALESCE(s_flag, 'UNKNOWN') AS flag, COUNT(*) AS n,
         |${sqlLsum("CAST(s_quantity AS DOUBLE)")} AS sum_qty,
         |MAX(CAST(s_orderkey AS BIGINT)) AS max_key
         |FROM stringly GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_join_agg_having" ->
      s"""SELECT o_orderkey,
         |${sqlLsumRevenue("l_extendedprice", "l_discount")} AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 HAVING COUNT(*) >= 5
         |ORDER BY revenue DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q20_subquery_agg" ->
      s"""SELECT s_suppkey, s_name, total_rev FROM supplier
         |JOIN (SELECT l_suppkey, ${sqlLsumRevenue("l_extendedprice", "l_discount")} AS total_rev
         |      FROM lineitem GROUP BY 1) ON s_suppkey = l_suppkey
         |ORDER BY total_rev DESC, s_suppkey ASC""".stripMargin,
  )
}
