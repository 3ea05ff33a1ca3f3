package graft.tools

import org.apache.spark.sql.functions._

/** Component attribution for the web-curation map chain: times each
  * per-row stage IN ISOLATION over the same constructed pages (forcing
  * the stage's real output columns with a checksum aggregate, so column
  * pruning can't hollow the measurement). Decides where a native swap
  * would pay (r11 verdict item 5). Drill tooling, not driver contract.
  *
  * Usage: `runMain graft.tools.WebChainProfile [rows]`
  */
object WebChainProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(200000L)
    val spark = graft.GraftSession.local()
    import graft.ops._
    val docs = spark.read.format("graft-synth")
      .option("rows", n).option("partitions", 64)
      .option("dupfraction", 0.0).load()
      .select("doc_id", "text")
    val d = col("doc_id")
    def m(k: Long) = pmod(d, lit(k))
    val host = when(m(13) === 0L, lit("Spam.Tracker.NET"))
      .otherwise(concat(lit("www.Site"), m(1000).cast("string"), lit(".COM")))
    val url = concat(lit("https://"), host,
      when(m(29) === 5L,
          concat(lit("/static/app."), m(50).cast("string"), lit(".js")))
        .otherwise(concat(lit("/Article/"), m(50).cast("string"))),
      lit("?utm_source=feed&a=1"))
    val html = concat(
      lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a></nav><p>"),
      col("text"),
      lit("</p><p>Article body continues with further general detail " +
        "here.</p><ul><li><a href=\"/t1\">tag one</a></li>" +
        "<li><a href=\"/t2\">tag two</a></li></ul>" +
        "<footer>(c) 2026 <a href=\"/tos\">Terms</a> " +
        "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
    val pages = graft.ops.OpCaches.persist(
      docs.select(d.as("doc_id"), url.as("url"), html.as("html"),
        col("text")))
    val warm = pages.count() // materialize the cache
    println(s"[profile] cached $warm pages")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // min-of-2, REBUILDING the plan each run: collect() on the same
      // Dataset object reuses its RDD, whose completed shuffle map
      // stage is then skipped — the second run would time (almost)
      // nothing. A fresh Dataset -> fresh RDD -> honest full execution.
      val secs = (1 to 2).map { _ =>
        val df = mk
        val t0 = System.nanoTime()
        val r = df.collect()
        require(r.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[profile] $label%-28s ${secs}%6.2fs  (${n / secs / 32}%8.0f rows/s/core)")
    }

    // drill-exact lap: count() after mark with a blocklist (the form the
    // ScaleSpec drill times) — twice, to separate codegen warm-up
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val c = Url.mark(pages, "url", blockedDomains = Seq("tracker.net"))
        .filter(col("url_keep")).count()
      println(f"[profile] drill-lap url count (run $i): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs ($c rows)")
    }

    time("baseline scan+len") {
      pages.agg(sum(length(col("html")))) }
    time("url: markblock filter+gcount") {
      Url.mark(pages, "url", blockedDomains = Seq("tracker.net"))
        .filter(col("url_keep")).groupBy().count() }
    locally { // the df.count() ACTION on the same plan
      val df = Url.mark(pages, "url", blockedDomains = Seq("tracker.net"))
        .filter(col("url_keep"))
      println("[profile] df.count plan cached? " +
        df.groupBy().count().queryExecution.executedPlan.toString
          .contains("InMemoryTableScan"))
      println("[profile] agg plan cached? " +
        df.agg(sum(when(col("url_keep"), 1L))).queryExecution.executedPlan
          .toString.contains("InMemoryTableScan"))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"[profile] url: markblock df.count (run $i): " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs ($c rows)")
      }
    }
    time("url: mark+blocklist agg") {
      Url.mark(pages, "url", blockedDomains = Seq("tracker.net"))
        .agg(sum(when(col("url_keep"), 1L))) }
    time("url: mark filter+count") {
      Url.mark(pages, "url").filter(col("url_keep"))
        .groupBy().count() }
    time("url: plain count") {
      pages.filter(length(col("url")) > 0).groupBy().count() }
    time("url: keep-expr only") {
      pages.filter(Url.keepUrl(col("url"), Seq("tracker.net")))
        .groupBy().count() }
    time("url: mark") {
      Url.mark(pages, "url").agg(sum(length(col("canonical_url"))),
        sum(when(col("url_keep"), 1L))) }
    time("html: extract") {
      Html.extract(pages, "html").agg(sum(length(col("content"))),
        sum(col("n_kept"))) }
    time("gates: langGuess") {
      pages.agg(sum(when(TextOps.langGuess(col("text"))
        .isInCollection(Seq("en", "de", "fr", "es")), 1L))) }
    time("gates: qualityScore") {
      pages.agg(sum(TextOps.qualityScore(col("text")).cast("long"))) }
    time("pii: scrub") {
      Pii.scrub(pages, "text").agg(sum(length(col("text_scrubbed"))),
        sum(col("n_email") + col("n_phone") + col("n_ip"))) }
    locally { // driver-side micro-bench: is java regex itself the cost?
      val sample = graft.sources.SynthDocsSource.schema // touch to avoid unused warn
      val _ = sample
      val txt = ("spark query table scan join merge sort hash batch " * 20).trim
      val p = java.util.regex.Pattern.compile("[^a-z0-9 ]")
      var sink = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < 10000) {
        sink += p.matcher(txt).replaceAll(" ").length
        i += 1
      }
      val perOp = (System.nanoTime() - t0) / 10000.0
      println(f"[profile] java-regex replaceAll on ${txt.length} chars: " +
        f"$perOp%.0f ns/op (sink=$sink)")
    }
    locally { // thread-scaling curve of RegExpReplace under local[32]
      Seq(32).foreach { parts =>
        val nn = 20000L * parts
        val sub = pages.limit(nn.toInt).repartition(parts)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sub.count()
        val t0 = System.nanoTime()
        sub.agg(sum(length(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " ")))).collect()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[profile] replace x$parts%2d parts ($nn rows): " +
          f"$secs%6.2fs -> ${secs * 1e6 * math.min(parts, 32) / nn}%.0f us/row/thread")
        sub.unpersist(true)
      }
    }
    time("key: lower only") {
      pages.agg(sum(length(lower(col("text"))))) }
    time("key: +replace punct") {
      pages.agg(sum(length(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " ")))) }
    time("key: +collapse spaces") {
      pages.agg(sum(length(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " ")))) }
    time("key: normalizeText") {
      pages.agg(sum(length(TextOps.normalizeText(col("text"))))) }
    time("key: dedupKey") {
      pages.agg(sum(length(TextOps.dedupKey(col("text"))))) }
    time("key: xxhash64 raw") {
      pages.agg(sum(pmod(xxhash64(col("text")), lit(1000000007L)))) }
    time("dedup key: fingerprint") {
      pages.agg(sum(pmod(TextOps.dedupFingerprint(col("text")), lit(1000000007L)))) }
    // the COMPOSED chain — where expression inlining / codegen limits /
    // CSE failures would show up as a super-linear blowup
    time("chain: extract+gates") {
      Html.extract(pages, "html")
        .filter(TextOps.langGuess(col("content"))
          .isInCollection(Seq("en", "de", "fr", "es", "und")))
        .filter(TextOps.qualityScore(col("content")) >= 20)
        .agg(sum(length(col("content")))) }
    time("chain: +scrub") {
      Pii.scrub(Html.extract(pages, "html").drop("html")
        .filter(TextOps.langGuess(col("content"))
          .isInCollection(Seq("en", "de", "fr", "es", "und")))
        .filter(TextOps.qualityScore(col("content")) >= 20), "content")
        .agg(sum(length(col("content_scrubbed")))) }
    time("chain: +fp key") {
      Pii.scrub(Html.extract(pages, "html").drop("html")
        .filter(TextOps.langGuess(col("content"))
          .isInCollection(Seq("en", "de", "fr", "es", "und")))
        .filter(TextOps.qualityScore(col("content")) >= 20), "content")
        .agg(sum(pmod(TextOps.dedupFingerprint(col("content_scrubbed")), lit(1000000007L)))) }
    time("chain: +window dedup") {
      Dedup.exactDedupNormalizedByFingerprint(
        Pii.scrub(Html.extract(pages, "html").drop("html")
          .filter(TextOps.langGuess(col("content"))
            .isInCollection(Seq("en", "de", "fr", "es", "und")))
          .filter(TextOps.qualityScore(col("content")) >= 20), "content"),
        "content_scrubbed", "doc_id")
        .filter(col("keep")).agg(sum(col("n_copies"))) }
    graft.ops.OpCaches.releaseAll()
    spark.stop()
  }
}
