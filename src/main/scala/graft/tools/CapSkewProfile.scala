package graft.tools

import org.apache.spark.sql.functions._

/** Skew drill for the per-domain cap (r12 verdict item 1): times the
  * window cap ([[graft.ops.Curation.capPerGroup]]) against the bounded
  * BottomK cap ([[graft.ops.Curation.capPerGroupBounded]]) over the same
  * payload in two regimes —
  *
  *   - BALANCED: 1,000 domains of equal size (the typical many-domains
  *     crawl, where the window's single shuffle is the right plan);
  *   - SKEWED: ONE mega-domain holding ~40% of all rows (the exact
  *     anti-domination case the cap exists for), the rest spread over
  *     1,000 domains.
  *
  * Each lap rebuilds the plan (a reused Dataset skips completed shuffle
  * map stages — the measurement trap), forces the FULL payload with a
  * noop write (count() would prune the text column the shuffle actually
  * carries), and records wall / peak task execution memory / spill via
  * the Bench listener pattern. Results land in BENCH_NOTES.
  *
  * Usage: `runMain graft.tools.CapSkewProfile [rows] [k]`
  */
object CapSkewProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(5000000L)
    val k = args.lift(1).flatMap(_.toIntOption).getOrElse(3000)
    val spark = graft.GraftSession.local()
    val sc = spark.sparkContext
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val spill = new java.util.concurrent.atomic.AtomicLong(0L)
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
          spill.addAndGet(m.memoryBytesSpilled)
        }
      }
    })
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    val drain = bus.getClass.getMethod("waitUntilEmpty")

    val docs = spark.read.format("graft-synth")
      .option("rows", n).option("partitions", 64)
      .option("dupfraction", 0.0).load()
      .select("doc_id", "text")
    val d = col("doc_id")
    // balanced: 1,000 equal domains (n/1000 rows each — the cap bites
    // whenever n/1000 > k). skewed: doc_id % 10 < 4 → 40% of rows in one
    // mega-domain; the remainder spread over 1,000 tail domains.
    val balanced = graft.ops.OpCaches.persist(docs.withColumn("domain",
      concat(lit("site"), pmod(d, lit(1000L)).cast("string"), lit(".org"))))
    val skewed = graft.ops.OpCaches.persist(docs.withColumn("domain",
      when(pmod(d, lit(10L)) < 4L, lit("mega.com"))
        .otherwise(concat(lit("site"), pmod(d, lit(1000L)).cast("string"),
          lit(".org")))))
    println(s"[capskew] rows=${balanced.count()} (balanced) " +
      s"${skewed.count()} (skewed), k=$k")
    val megaShare = skewed.filter(col("domain") === "mega.com").count()
    println(f"[capskew] mega-domain share: $megaShare (${megaShare * 100.0 / n}%.1f%%)")

    def lap(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        drain.invoke(bus)
        peak.set(0L); spill.set(0L)
        val df = mk // fresh plan per lap — completed shuffle stages skip
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        drain.invoke(bus)
        (secs, peak.get, spill.get)
      }
      val best = runs.minBy(_._1)
      println(f"[capskew] $label%-34s ${best._1}%7.2fs  " +
        f"peakMem ${best._2 / 1048576.0}%8.1f MiB  spill ${best._3 / 1048576.0}%8.1f MiB")
    }

    for ((regime, df) <- Seq("balanced" -> balanced, "skewed" -> skewed)) {
      lap(s"$regime/window capPerGroup") {
        graft.ops.Curation.capPerGroup(df, "domain", "doc_id", k) }
      lap(s"$regime/bounded capPerGroupBounded") {
        graft.ops.Curation.capPerGroupBounded(df, "domain", "doc_id", k) }
    }
    // cross-check: identical survivors in both regimes (ids are unique)
    for ((regime, df) <- Seq("balanced" -> balanced, "skewed" -> skewed)) {
      val a = graft.ops.Curation.capPerGroup(df, "domain", "doc_id", k)
        .select("doc_id")
      val b = graft.ops.Curation.capPerGroupBounded(df, "domain", "doc_id", k)
        .select("doc_id")
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"[capskew] $regime survivors equal: ${diff == 0} (diff=$diff)")
    }
    graft.ops.OpCaches.releaseAll()
    spark.stop()
  }
}
