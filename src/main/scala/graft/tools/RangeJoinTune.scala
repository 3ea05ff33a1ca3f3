package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Bin-width tuner for [[graft.ops.RangeJoin.pointInInterval]]: times the
  * q50-shaped query across candidate bin widths on a given SF dir. The
  * candidate volume is ∝ density·(span + binWidth), so narrower bins trim
  * false bin-mates at the cost of more interval registrations (broadcast
  * rows ∝ span/binWidth) — this tool measures where the trade lands.
  *
  * {{{ runMain graft.tools.RangeJoinTune /root/testdata/sf0.1 }}}
  */
object RangeJoinTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    val widths = Seq(2.0, 1.0, 0.5, 0.25, 0.125)
    // warm the file scans once so IO doesn't skew the first width
    Tables.load(spark, dir, "events").count()
    Tables.load(spark, dir, "part").count()
    val results = widths.map { w =>
      val points = Tables.load(spark, dir, "events").select(col("event_id"), col("value"))
      val bands = Tables.load(spark, dir, "part")
        .select(col("p_partkey"),
          (col("p_retailprice").cast("decimal(18,2)").cast("double") / 10 - 0.5).as("lo"),
          (col("p_retailprice").cast("decimal(18,2)").cast("double") / 10 + 0.5).as("hi"))
      val joined = graft.ops.RangeJoin.pointInInterval(
        points, "value", bands, "lo", "hi", binWidth = w)
      val t0 = System.nanoTime()
      val n = joined.groupBy("p_partkey").agg(count(lit(1))).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (w, sec, n)
    }
    results.foreach { case (w, sec, n) =>
      println(f"binWidth=$w%-6s ${sec}%.2fs  groups=$n")
    }
    spark.stop()
  }
}
