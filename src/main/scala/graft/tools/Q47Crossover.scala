package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the q47 multi-distinct crossover: one aggregate with several
  * COUNT(DISTINCT) columns (Catalyst expands the input once per distinct
  * column — N× shuffle volume) versus the shipped two-phase formulation
  * (one distinct-pairs aggregation per column + a plain sketch pass,
  * joined on the tiny group key).
  *
  * Run with SPARK_GRAFT_SF_DIR and an optional multiplier argument that
  * unions key-shifted copies of lineitem to emulate a larger scale factor
  * without new test data:
  *
  * {{{ runMain graft.tools.Q47Crossover 1 8 }}}
  *
  * Results are recorded in BENCH_NOTES.md and in the q47 scaladoc
  * (graft.queries.DataOpsQueries.q47ApproxDistinct).
  */
object Q47Crossover {

  /** lineitem × mult with disjoint key ranges per copy, so distinct
    * cardinalities scale with the row count (a plain self-union would
    * leave them unchanged and flatter the Expand variant). */
  def scaled(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val base = graft.Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_partkey", "l_orderkey")
    if (mult <= 1) base
    else (0 until mult).map { i =>
      val off = i.toLong * 1000000000L
      base.select(col("l_returnflag"),
        (col("l_partkey") + off).as("l_partkey"),
        (col("l_orderkey") + off).as("l_orderkey"))
    }.reduce(_ unionByName _)
  }

  /** The pre-two-phase shape: one aggregate, two COUNT(DISTINCT) → Expand. */
  def expandVariant(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"))

  /** The shipped shape: per-column distinct-pairs aggregations + one plain
    * sketch aggregation, joined on the group key. */
  def twoPhaseVariant(li: DataFrame): DataFrame = {
    def exact(c: String, as: String) =
      li.select(col("l_returnflag"), col(c)).distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as(as))
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"))
    exact("l_partkey", "exact_parts")
      .join(exact("l_orderkey", "exact_orders"), Seq("l_returnflag"))
      .join(approx, Seq("l_returnflag"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8)
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    mults.foreach { m =>
      val li = scaled(spark, dir, m).cache()
      val n = li.count() // materialize the cache so both variants read warm
      // min of two runs each, alternating to keep JIT warm-up symmetric
      val e = math.min(time(expandVariant(li)), time(expandVariant(li)))
      val t = math.min(time(twoPhaseVariant(li)), time(twoPhaseVariant(li)))
      println(f"[q47crossover] mult=$m rows=$n expand=$e%.2fs two_phase=$t%.2fs ratio=${e / t}%.2f")
      li.unpersist()
    }
    spark.stop()
  }
}
