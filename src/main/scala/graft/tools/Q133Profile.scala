package graft.tools

import org.apache.spark.sql.functions._

/** Stage attribution for q133 at sf0.1 — where do its seconds go?
  * Times (fresh plan each) the page construction alone, each fused
  * prefix of curateWeb over those pages, and the two q133 consumers.
  * Drill tooling. */
object Q133Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    import graft.ops._

    def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val df = mk
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q133-profile] $label%-34s $secs%6.2fs")
      OpCaches.releaseAll()
    }

    // rebuild exactly q133's pages (private in the query; reconstruct)
    def pages = {
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text")
      val mutant = base.filter(pmod(col("doc_id"), lit(10L)) === 1L)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("source"),
          concat(col("text"), lit(" !! !!")).as("text"))
      val docs = base.unionByName(mutant)
      val d2 = pmod(col("doc_id"), lit(100000000L))
      def m(k: Long) = pmod(d2, lit(k))
      val p2 = concat(
        lit("Article body continues with further detail for doc "),
        d2.cast("string"), lit("."),
        when(m(7) === 0L, concat(lit(" contact user"), d2.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
        when(m(11) === 3L, concat(lit(" call 555-"),
          lpad(m(1000).cast("string"), 3, "0"), lit("-"),
          lpad(m(10000).cast("string"), 4, "0"))).otherwise(lit("")))
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
          "<a href=\"/contact\">Contact</a></nav><p>"), col("text"),
        lit("</p><p>"), p2, lit("</p>" +
          "<ul><li><a href=\"/t1\">tag one</a></li>" +
          "<li><a href=\"/t2\">tag two</a></li></ul>" +
          "<footer>(c) 2026 <a href=\"/tos\">Terms</a> " +
          "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
      val host = when(m(13) === 0L, lit("Spam.Tracker.NET"))
        .when(m(3) === 0L, concat(lit("WWW.Shop"), m(23).cast("string"), lit(".COM")))
        .when(m(3) === 1L, concat(lit("news.site"), m(19).cast("string"), lit(".co.uk")))
        .otherwise(concat(lit("cdn.media"), m(17).cast("string"), lit(".org")))
      val url = concat(lit("https://"), host,
        when(m(29) === 5L, concat(lit("/static/app."), m(50).cast("string"), lit(".js")))
          .otherwise(concat(lit("/Article/"), m(50).cast("string"))),
        lit("?utm_source=feed"),
        when(m(2) === 0L, concat(lit("&p="), m(9).cast("string"))).otherwise(lit("")))
      docs.select(col("doc_id"), col("source"), url.as("url"), html.as("html"))
    }

    t("pages only") { pages }
    t("+ url mark+filter") {
      Url.mark(pages, "url", Seq("tracker.net")).filter(col("url_keep")) }
    t("+ html extract (html dropped)") {
      Html.extract(Url.mark(pages, "url", Seq("tracker.net"))
        .filter(col("url_keep")), "html").drop("html") }
    t("+ gates") {
      Html.extract(Url.mark(pages, "url", Seq("tracker.net"))
          .filter(col("url_keep")), "html").drop("html")
        .filter(TextOps.langGuess(col("content"))
          .isInCollection(Seq("en", "de", "fr", "es")))
        .filter(TextOps.qualityScore(col("content")) >= 40) }
    t("+ scrub") {
      Pii.scrub(Html.extract(Url.mark(pages, "url", Seq("tracker.net"))
          .filter(col("url_keep")), "html").drop("html")
        .filter(TextOps.langGuess(col("content"))
          .isInCollection(Seq("en", "de", "fr", "es")))
        .filter(TextOps.qualityScore(col("content")) >= 40), "content") }
    t("full curateWeb") {
      Curation.curateWeb(pages, "doc_id", "url", "html",
        allowedLangs = Seq("en", "de", "fr", "es"), minQuality = 40,
        blockedDomains = Seq("tracker.net"), maxPerDomain = 40) }
    t("full q133") {
      graft.SparkEntry.queries("q133_web_curation")(spark, dir) }
    spark.stop()
  }
}
