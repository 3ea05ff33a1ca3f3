package graft.tools

import org.apache.spark.sql.functions._

/** Html.extract throughput at crawl-page sizes (r11 verdict item 5):
  * constructs pages of ~`kb` KB by repeating a mixed block pattern,
  * times the extraction, reports MB/s/core. Drill tooling. */
object HtmlProfile {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.flatMap(_.toLongOption).getOrElse(512L)
    val kb = args.lift(1).flatMap(_.toIntOption).getOrElse(256)
    val spark = graft.GraftSession.local()
    val cores = spark.sparkContext.defaultParallelism
    // ~1 KB repeating unit: nav boilerplate + a long content paragraph
    // + a link list — the block mix a real page carries
    val unit = "<nav><a href=\"/\">Home</a> <a href=\"/d\">Docs</a></nav>" +
      "<p>" + ("the quick brown fox jumps over the lazy dog and rests " * 16).trim +
      "</p><ul><li><a href=\"/t\">tag</a></li></ul>"
    val page = concat(lit("<html><body>"),
      repeat(lit(unit), kb), lit("</body></html>"))
    val df = spark.range(rows).select(col("id"), page.as("html"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    val bytesPerPage = unit.length.toLong * kb + 26
    val totalMb = n * bytesPerPage / 1e6
    println(f"[html-drill] $n pages x ${bytesPerPage / 1024} KB = $totalMb%.0f MB, $cores cores")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val out = graft.ops.Html.extract(df, "html")
        .agg(sum(col("content_len").cast("long")),
          sum(col("n_kept").cast("long")), sum(col("boiler_len").cast("long")))
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[html-drill] run $i: $secs%.1fs -> " +
        f"${totalMb / secs}%.2f MB/s total, ${totalMb / secs / cores}%.3f MB/s/core " +
        f"(${out.head.toString.take(80)})")
    }
    df.unpersist(true)
    spark.stop()
  }
}
