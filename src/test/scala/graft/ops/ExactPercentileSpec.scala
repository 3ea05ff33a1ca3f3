package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The histogram percentile must be indistinguishable from Spark's own
  * buffering `percentile` — same interpolation arithmetic, null handling,
  * and edge fractions — while its plan carries only distinct values. */
class ExactPercentileSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val ps = Seq("p00" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
    "p90" -> 0.9, "p100" -> 1.0)

  test("matches Spark's percentile bit-for-bit (interpolated ranks, ties, nulls)") {
    // adversarial shape: heavy ties, uneven group sizes (odd/even →
    // exact and interpolated medians), a null, a single-row group
    val rows: Seq[(String, Option[Double])] =
      Seq.tabulate(1000)(i => ("a", Some((i % 7).toDouble))) ++
        Seq.tabulate(501)(i => ("b", Some((i * i % 13).toDouble))) ++
        Seq(("b", None), ("c", Some(42.0)))
    val df = rows.toDF("g", "v")
    val hist = ExactPercentile.byHistogram(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val buffered = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.map(_._2).mkString(",")}))").as("a"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(hist.keySet == buffered.keySet)
    hist.foreach { case (g, vals) =>
      vals.zip(buffered(g)).zipWithIndex.foreach { case ((h, b), i) =>
        assert(h == b, s"group $g ${ps(i)._1}: histogram $h != buffered $b")
      }
    }
  }

  test("byHistogramMulti equals the per-column byHistogram calls joined " +
      "on the group (the q32/q52 single-pass form)") {
    // two value columns with different null patterns; one group all-null
    // in ONE column only, plus a group all-null in both
    val rows: Seq[(String, Option[Double], Option[Double])] =
      Seq.tabulate(800)(i => ("a", Some((i % 11).toDouble),
        if (i % 5 == 0) None else Some((i * i % 17).toDouble))) ++
        Seq.tabulate(301)(i => ("b", Some(i.toDouble), None)) ++
        Seq(("c", None, None))
    val df = rows.toDF("g", "x", "y")
    val psX = Seq("x50" -> 0.5, "x90" -> 0.9)
    val psY = Seq("y25" -> 0.25, "y100" -> 1.0)
    val multi = ExactPercentile.byHistogramMulti(df, "g",
      Seq("x" -> psX, "y" -> psY))
    val single = ExactPercentile.byHistogram(df, "g", "x", psX)
      .join(ExactPercentile.byHistogram(df, "g", "y", psY), Seq("g"))
    val m = multi.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val s = single.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(m == s)
    assert(m.keySet == Set("a", "b", "c"))
  }

  test("all-null group is kept with NULL percentiles (percentile/QUANTILE_CONT contract)") {
    // the value filter removes every row of group "n" — the group must
    // still appear (left-joined back), exactly like Spark's percentile
    // and DuckDB's QUANTILE_CONT, not silently vanish
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("n", None), ("n", None))
      .toDF("g", "v")
    val hist = ExactPercentile.byHistogram(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(hist.keySet == Set("a", "n"))
    assert(hist("a").contains(2.0))
    assert(hist("n").isEmpty, "all-null group must yield NULL, not drop")
    val buffered = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(hist == buffered)
  }

  test("opt-in guard refuses oversized groups, points at the scale paths, defaults off") {
    val df = Seq.tabulate(500)(i => ("g", i.toDouble)).toDF("g", "v")
    // under the bound and unset conf: no-op
    ExactPercentile.requireBoundedGroups(df, "g", "v", 1000L)
    ExactPercentile.guardFromConf(df, "g", "v")
    val ex = intercept[IllegalStateException] {
      ExactPercentile.requireBoundedGroups(df, "g", "v", 100L)
    }
    assert(ex.getMessage.contains("byHistogram"), ex.getMessage)
    // conf-driven form (the q32 wiring)
    spark.conf.set(ExactPercentile.MaxGroupRowsKey, "100")
    try intercept[IllegalStateException] {
      ExactPercentile.guardFromConf(df, "g", "v")
    } finally spark.conf.unset(ExactPercentile.MaxGroupRowsKey)
    // nulls don't count toward the buffered volume
    val nulls = Seq.tabulate(500)(i =>
      ("g", if (i < 10) Some(i.toDouble) else None)).toDF("g", "v")
    ExactPercentile.requireBoundedGroups(nulls, "g", "v", 10L)
  }

  test("discByHistogram: both index conventions match driver references") {
    import spark.implicits._
    // uneven spacing + duplicates + two groups of different sizes
    val a = Seq(10.0, 20.0, 20.0, 30.0, 1000.0) // n = 5
    val b = Seq(5.0, 7.0, 11.0, 13.0, 17.0, 19.0) // n = 6
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    def refCeil(xs: Seq[Double], q: Double) = // DuckDB QUANTILE_DISC
      xs.sorted.apply(math.max(0, math.ceil(q * xs.size).toInt - 1))
    def refFloor(xs: Seq[Double], q: Double) = // rank q·(n−1) element
      xs.sorted.apply(math.floor(q * (xs.size - 1)).toInt)
    for (q <- Seq(0.0, 0.5, 0.6, 0.9, 1.0)) {
      val gotC = ExactPercentile.discByHistogram(df, "g", "v",
        Seq("p" -> q), ExactPercentile.discIndexCeil)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(gotC == Map("a" -> refCeil(a, q), "b" -> refCeil(b, q)),
        s"ceil convention at q=$q: $gotC")
      val gotF = ExactPercentile.discByHistogram(df, "g", "v",
        Seq("p" -> q), ExactPercentile.discIndexFloor)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(gotF == Map("a" -> refFloor(a, q), "b" -> refFloor(b, q)),
        s"floor convention at q=$q: $gotF")
    }
    // all-null group survives with NULL output
    val withNull = df.unionByName(Seq(("c", Option.empty[Double]))
      .toDF("g", "v"))
    val rows = ExactPercentile.discByHistogram(withNull, "g", "v",
      Seq("p" -> 0.5), ExactPercentile.discIndexCeil).collect()
    assert(rows.length == 3 && rows.exists(r => r.getString(0) == "c" && r.isNullAt(1)))
  }

  test("plan shape: shuffle carries distinct values (partial agg), group-sharded window") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_quantity").cast("double").as("v"))
    val out = ExactPercentile.byHistogram(df, "g", "v", Seq("p50" -> 0.5))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("partial_count"), plan) // map-side histogram combine
    assert(!plan.contains("SinglePartition"), plan) // window shards by group
    // no TypedImperativeAggregate percentile buffer anywhere
    assert(!plan.contains("percentile"), plan)
  }
}
