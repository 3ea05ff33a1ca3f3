package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational surface beyond the reference's own operators
  * (SURVEY.md §2.8 "built-ins when the surface is extended"): analytic
  * windows, exact percentiles, pivot, array aggregation, regex extraction.
  * All oracle-checked with deterministic values. */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame

  /** lag/lead/first/last analytic windows over each customer's orders. */
  val q31LagLead: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        first(col("o_orderkey")).over(w).as("first_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont` — both exact, order-independent).
    *
    * MEMORY CONTRACT: exact `percentile` is a TypedImperativeAggregate that
    * buffers EVERY value of the group on the reducer — with few groups at
    * 100 TB that is the whole column on a handful of executors. This query
    * exists for cross-engine oracle parity; the scale paths are
    * [[q80PercentileHist]] (EXACT via value histogram — reducer state ∝
    * distinct values, the right tool on discrete domains) and
    * [[q52ApproxPercentile]] (bounded sketch, for continuous domains). */
  val q32Percentile: Q = (s, dir) => {
    // Exact interpolated percentiles via the BOUNDED histogram path.
    // Earlier rounds ran Spark's native `percentile` here — a
    // TypedImperativeAggregate that buffers EVERY group value on one
    // reducer, the engine's one documented memory-weak plan. The
    // histogram path is bit-identical (ExactPercentileSpec pins
    // byHistogram == Spark percentile == DuckDB QUANTILE_CONT, same
    // interpolation formula) and its reducer state is DOMAIN-bounded
    // here, not corpus-bounded: the dec2 cast quantizes both columns to
    // exact cents, so distinct values are capped by the price/quantity
    // RANGE (≈10^7 worst case) no matter how many rows a 100 TB corpus
    // holds. The buffering formulation survives as the spec reference.
    val li = load(s, dir, "lineitem")
      // decimal-cast first (exact 2-decimal values), then double for the
      // interpolation: DuckDB's QUANTILE_CONT on DECIMAL rounds to the
      // decimal scale, so the quantile itself must run on DOUBLE.
      .select(col("l_returnflag"),
        dec2(col("l_quantity")).cast("double").as("qty"),
        dec2(col("l_extendedprice")).cast("double").as("price"))
    // ONE unpivoted histogram pass for both columns (r14: the two
    // per-column byHistogram calls each scanned lineitem and ran their
    // own histogram shuffle + windows + final agg, then joined) —
    // bit-identical outputs, half the scans, ~half the exchanges
    graft.ops.ExactPercentile.byHistogramMulti(li, "l_returnflag", Seq(
        "qty" -> Seq("median_qty" -> 0.5),
        "price" -> Seq("median_price" -> 0.5, "p95_price" -> 0.95)))
      .orderBy("l_returnflag")
  }

  /** The histogram percentile path at a FINER granularity than q32
    * (which now rides it too on the classic grouping): composite
    * (returnflag, linestatus) groups and the full quartile ladder plus
    * the p99 tail over l_quantity — the per-cohort distribution report
    * shape. Reducer state stays ∝ the 50 distinct quantity values per
    * group whatever the corpus size; the histogram interpolation
    * replicates Spark's buffering `percentile` (and DuckDB's
    * QUANTILE_CONT) bit-for-bit, so the full value oracle hash-matches
    * at every requested fraction. */
  val q80PercentileHist: Q = (s, dir) => {
    val src = load(s, dir, "lineitem")
      .select(concat_ws("/", col("l_returnflag"), col("l_linestatus")).as("cohort"),
        dec2(col("l_quantity")).cast("double").as("qty"))
    graft.ops.ExactPercentile.byHistogram(src, "cohort", "qty",
        Seq("p25_qty" -> 0.25, "median_qty" -> 0.5, "p75_qty" -> 0.75,
          "p99_qty" -> 0.99))
      .orderBy("cohort")
  }

  /** Approximate percentiles (the 100 TB twin of q32): bounded-memory,
    * mergeable sketch instead of the full-column buffer. The sketch value
    * is engine-specific, so the oracle checks the exact percentiles plus
    * in-query tolerance verdicts (oracle asserts TRUE): the accuracy
    * contract is verified, not the engine-specific estimate. Tolerance
    * 5% + 1.0 absolute — approx_percentile returns an actual data element,
    * so its gap from the interpolated exact value is bounded by the local
    * data spacing plus the 1/accuracy rank error. */
  val q52ApproxPercentile: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      // same cast-hoist as q32: one projection, four aggregate consumers
      .select(col("l_returnflag"),
        dec2(col("l_quantity")).cast("double").as("qty"),
        dec2(col("l_extendedprice")).cast("double").as("price"))
    // r14: the exact reference values ride the bounded histogram path
    // (bit-identical to the buffering `percentile` — ExactPercentileSpec)
    // instead of buffering 600k doubles per map task alongside the
    // sketch; the sketch under audit keeps its own one-pass aggregate
    val exact = graft.ops.ExactPercentile.byHistogramMulti(li,
      "l_returnflag", Seq(
        "qty" -> Seq("median_qty" -> 0.5),
        "price" -> Seq("p95_price" -> 0.95)))
    val approx = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(qty, 0.5, 10000)").as("aq"),
        expr("approx_percentile(price, 0.95, 10000)").as("ap"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("median_qty"), col("p95_price"),
        (abs(col("aq") - col("median_qty")) <= abs(col("median_qty")) * 0.05 + 1.0)
          .as("qty_approx_ok"),
        (abs(col("ap") - col("p95_price")) <= abs(col("p95_price")) * 0.05 + 1.0)
          .as("price_approx_ok"))
      .orderBy("l_returnflag")
  }

  /** Pivot (orderpriority × linestatus counts). Same fact pre-aggregation
    * as q19/q36: lineitem collapses to per-(order, status) counts before
    * the join (result-identical, exact integer sums), so the pivot's
    * input shuffle is orders-sized, not lines-sized. */
  val q33Pivot: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    val liAgg = load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
    liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("cnt")))
      .na.fill(0L)
      .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
      .orderBy("o_orderpriority")
  }

  /** Array aggregation: sorted collect_list (deterministic) + array ops. */
  val q34ArrayAgg: Q = (s, dir) => {
    load(s, dir, "nation")
      .groupBy("n_regionkey")
      .agg(sort_array(collect_list(col("n_name"))).as("nations"))
      .select(col("n_regionkey").cast("int").as("regionkey"),
        size(col("nations")).as("n_nations"),
        try_element_at(col("nations"), lit(1)).as("first_nation"),
        array_join(col("nations"), ",").as("joined"))
      .orderBy("regionkey")
  }

  /** Regex extraction + aggregation over part types. */
  val q35Regexp: Q = (s, dir) => {
    load(s, dir, "part")
      .select(regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        col("p_retailprice"))
      .groupBy("type_head")
      .agg(count(lit(1)).as("n"), lsum(col("p_retailprice")).as("sum_price"))
      .orderBy("type_head")
  }

  /** Multi-level join + conditional + date arithmetic (TPC-H Q5-like
    * shape): revenue by nation for orders within one year.
    *
    * The fact is PRE-aggregated per order before any join (group key ==
    * join key; orders is unique per key → result-identical): the join
    * then carries one row per order instead of one per line — the only
    * full-fact shuffle is the map-side-combined per-order aggregation.
    * The per-order revenue stays an exact integer (1e-4 units, the
    * [[graft.Tables.lsumRevenue]] contract) through both aggregation
    * levels — long sums are order-independent and ~1.5× faster than
    * Decimal accumulation — and double division happens exactly once at
    * the very end, so the two-level sum equals the oracle's one-level
    * sum bit-for-bit in any merge order. */
  val q36RegionalRevenue: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val n = load(s, dir, "nation")
    val liAgg = load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("rev_x1e4"), count(lit(1)).as("nl"))
    liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < add_months(lit("1995-01-01").cast("date"), 12).cast("timestamp"))
      .groupBy("n_name")
      .agg((sum(col("rev_x1e4")).cast("double") / lit(10000.0)).as("revenue"),
        sum(col("nl")).as("n_lines"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Math scalar surface: abs/round/floor/ceil/sqrt/ln/exp/pow over exact
    * decimal inputs (transcendentals are IEEE-deterministic on the same
    * double inputs in both engines). */
  val q37Math: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .select(dec2(col("l_extendedprice")).cast("double").as("p"),
        dec2(col("l_discount")).cast("double").as("d"),
        col("l_returnflag"))
    li.groupBy("l_returnflag")
      .agg(
        sum(floor(col("p"))).cast("long").as("sum_floor"),
        sum(ceil(col("p"))).cast("long").as("sum_ceil"),
        max(round(col("p") * col("d"), 1)).as("max_rounded"),
        max(sqrt(col("p"))).as("max_sqrt"), // IEEE-exact, no rounding needed
        // ln/pow go through libm, which may differ by an ulp across
        // engines — round to 8 decimals for a stable compare
        round(max(log(col("p") + 1)), 8).as("max_ln"),
        round(max(pow(col("d"), 2)), 8).as("max_d2"),
        min(abs(col("p") - 1000)).as("min_absdev"))
      .orderBy("l_returnflag")
  }

  /** Null-handling surface: nullif/ifnull/greatest/least/nvl2 semantics. */
  val q38NullFuncs: Q = (s, dir) => {
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("st"),
        dec2(col("o_totalprice")).cast("double").as("p"))
    o.select(
        coalesce(col("st"), lit("OPEN")).as("status"),
        when(col("st").isNull, col("p")).otherwise(lit(0.0)).as("open_price"),
        greatest(col("p"), lit(150000.0)).as("hi"),
        least(col("p"), lit(150000.0)).as("lo"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("open_price"))).cast("double").as("sum_open"),
        sum(dec2(col("hi"))).cast("double").as("sum_hi"),
        sum(dec2(col("lo"))).cast("double").as("sum_lo"))
      .orderBy("status")
  }

  /** split + explode (Generate) over free text: word frequencies. */
  val q39SplitExplode: Q = (s, dir) => {
    load(s, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word"))
      .limit(15)
  }

  /** As-of join (nearest-earlier signup for each purchase, per user) —
    * composed from union + running last-ignoring-nulls window
    * (graft.ops.AsOf); DuckDB verifies with its native ASOF JOIN. */
  val q49AsofJoin: Q = (s, dir) => {
    val ev = load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    graft.ops.AsOf.asofJoin(purchases, signups, "user_id", "ts", "ts", Seq("signup_id"))
      .select("purchase_id", "user_id", "signup_id")
      .orderBy("purchase_id")
  }

  /** Range join: events whose value falls in a price band around each
    * part's retail price — bin-bucketed equi-join + exact filter
    * (graft.ops.RangeJoin), NOT a BroadcastNestedLoopJoin. */
  val q50RangeJoin: Q = (s, dir) => {
    // spread the probe side (r14, [[graft.ops.Spread.toCores]] — no-op on
    // real corpora): the binned-BHJ probe walks ~250 interval candidates
    // per point and ran as ONE task over the single-row-group events scan
    // (stage profile: 1.68s wall, 1.57 CPU-s, one task = the whole query)
    val points = graft.ops.Spread.toCores(
      load(s, dir, "events").select(col("event_id"), col("value")))
    val bands = load(s, dir, "part")
      .select(col("p_partkey"),
        (dec2(col("p_retailprice")).cast("double") / 10 - 0.5).as("lo"),
        (dec2(col("p_retailprice")).cast("double") / 10 + 0.5).as("hi"))
    // binWidth = span/2: measured 2.1x faster than span-width bins at
    // sf0.1 (candidates ∝ span+binWidth; see tools/RangeJoinTune)
    graft.ops.RangeJoin.pointInInterval(points, "value", bands, "lo", "hi", binWidth = 0.5)
      .groupBy("p_partkey")
      // lsum, not dsum: this aggregation runs over the full ~matches
      // volume (events × overlapping bands) — the long accumulator is the
      // hot-path variant, bit-identical by the lsum contract
      .agg(count(lit(1)).as("n_events"), lsum(col("value")).as("sum_value"))
      .orderBy("p_partkey")
  }

  /** Set operators (INTERSECT / EXCEPT): customers ordering in both
    * halves of 1995 vs only the first half. */
  val q51SetOps: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    def half(from: String, to: String) =
      o.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(to).cast("timestamp"))
        .select("o_custkey")
    val h1 = half("1995-01-01", "1995-07-01")
    val h2 = half("1995-07-01", "1996-01-01")
    h1.intersect(h2).select(lit("both").as("tag"), col("o_custkey"))
      .unionByName(h1.except(h2).select(lit("h1_only").as("tag"), col("o_custkey")))
      .orderBy("tag", "o_custkey")
  }

  val all: Map[String, Q] = Map(
    "q31_lag_lead" -> q31LagLead,
    "q49_asof_join" -> q49AsofJoin,
    "q50_range_join" -> q50RangeJoin,
    "q51_set_ops" -> q51SetOps,
    "q37_math" -> q37Math,
    "q38_null_funcs" -> q38NullFuncs,
    "q39_split_explode" -> q39SplitExplode,
    "q32_percentile" -> q32Percentile,
    "q80_percentile_hist" -> q80PercentileHist,
    "q52_approx_percentile" -> q52ApproxPercentile,
    "q33_pivot" -> q33Pivot,
    "q34_array_agg" -> q34ArrayAgg,
    "q35_regexp" -> q35Regexp,
    "q36_regional_revenue" -> q36RegionalRevenue,
  )

  val oracles: Map[String, String] = Map(
    "q49_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, l.event_id AS signup_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') l
        |ON p.user_id = l.user_id AND p.ts >= l.ts
        |ORDER BY purchase_id""".stripMargin,
    "q50_range_join" ->
      s"""WITH bands AS (SELECT p_partkey,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) / 10 - 0.5 AS lo,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) / 10 + 0.5 AS hi
         |  FROM part)
         |SELECT p_partkey, COUNT(*) AS n_events, ${sqlLsum("value")} AS sum_value
         |FROM events JOIN bands ON value >= lo AND value < hi
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q51_set_ops" ->
      """WITH h1 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'),
        |h2 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-01-01')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM h1 INTERSECT SELECT o_custkey FROM h2)
        |UNION ALL
        |SELECT 'h1_only' AS tag, o_custkey FROM (SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q37_math" ->
      """WITH t AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS p,
        |  CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS d, l_returnflag FROM lineitem)
        |SELECT l_returnflag,
        |CAST(SUM(FLOOR(p)) AS BIGINT) AS sum_floor,
        |CAST(SUM(CEIL(p)) AS BIGINT) AS sum_ceil,
        |MAX(ROUND(p * d, 1)) AS max_rounded,
        |MAX(SQRT(p)) AS max_sqrt,
        |ROUND(MAX(LN(p + 1)), 8) AS max_ln,
        |ROUND(MAX(POW(d, 2)), 8) AS max_d2,
        |MIN(ABS(p - 1000)) AS min_absdev
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_null_funcs" ->
      """WITH t AS (SELECT NULLIF(o_orderstatus, 'O') AS st,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p FROM orders)
        |SELECT COALESCE(st, 'OPEN') AS status, COUNT(*) AS n,
        |CAST(SUM(CAST(CASE WHEN st IS NULL THEN p ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_open,
        |CAST(SUM(CAST(GREATEST(p, 150000.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_hi,
        |CAST(SUM(CAST(LEAST(p, 150000.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_lo
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_split_explode" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS word FROM documents)
        |GROUP BY 1 ORDER BY n DESC, word ASC LIMIT 15""".stripMargin,
    "q31_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |LAG(o_orderkey, 1) OVER w AS prev_order,
        |LEAD(o_orderkey, 1) OVER w AS next_order,
        |FIRST_VALUE(o_orderkey) OVER w AS first_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q32_percentile" ->
      """SELECT l_returnflag,
        |QUANTILE_CONT(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.5) AS median_qty,
        |QUANTILE_CONT(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.5) AS median_price,
        |QUANTILE_CONT(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.95) AS p95_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q80_percentile_hist" ->
      """SELECT l_returnflag || '/' || l_linestatus AS cohort,
        |QUANTILE_CONT(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.25) AS p25_qty,
        |QUANTILE_CONT(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.5) AS median_qty,
        |QUANTILE_CONT(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.75) AS p75_qty,
        |QUANTILE_CONT(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.99) AS p99_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52_approx_percentile" ->
      """SELECT l_returnflag,
        |QUANTILE_CONT(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.5) AS median_qty,
        |QUANTILE_CONT(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.95) AS p95_price,
        |TRUE AS qty_approx_ok, TRUE AS price_approx_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_pivot" ->
      """SELECT o_orderpriority,
        |COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_array_agg" ->
      """SELECT CAST(n_regionkey AS INT) AS regionkey,
        |CAST(LEN(LIST_SORT(LIST(n_name))) AS INT) AS n_nations,
        |LIST_SORT(LIST(n_name))[1] AS first_nation,
        |ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), ',') AS joined
        |FROM nation GROUP BY n_regionkey ORDER BY 1""".stripMargin,
    "q35_regexp" ->
      s"""SELECT regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
         |COUNT(*) AS n, ${sqlLsum("p_retailprice")} AS sum_price
         |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_regional_revenue" ->
      s"""SELECT n_name,
         |${sqlLsumRevenue("l_extendedprice", "l_discount")} AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, n_name ASC""".stripMargin,
  )
}
