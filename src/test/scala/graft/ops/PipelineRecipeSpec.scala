package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-data recipe over the round-8/9 operator family:
  *
  *   intra-doc span dedup → quality/lang curation → substring
  *   decontamination → semantic dedup (learned cells) → temperature
  *   mixture (α = 0.5, UniMax cap) → stratified split → balanced shards
  *
  * Each stage is individually oracle-checked; this spec pins that they
  * COMPOSE — schema contracts line up, laws survive chaining (nothing
  * contaminated ships, eval/train never mix, shards stay balanced), and
  * the whole recipe is deterministic end to end. The lazy stages fuse
  * into one plan; the eager stages (CC) break it deliberately.
  */
class PipelineRecipeSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    graft.functions.NativeFunctions.register(s)
    s
  }
  val sf = "/root/testdata/sf0.001"

  test("curateWeb: every stage visibly fires, one fused map + two shuffles") {
    import spark.implicits._
    def p(t: String) = s"<p>$t</p>"
    // 21 tokens, 7 stopwords, zero punct -> lang en, quality 100
    val T1 = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river where it drinks water in peace today"
    val pages = Seq(
      // survives; email scrubbed; dedup keeper of the pair (1, 2)
      (1L, "https://www.Alpha.COM/a?utm_source=x", p(T1 + " contact a@b.io")),
      // same normalized scrubbed content as 1 (punct mutant) -> dedup-dropped
      (2L, "https://alpha.com/b", p(T1 + " !! contact a@b.io")),
      (3L, "https://alpha.com/app.js", p(T1)),   // asset extension -> URL drop
      (4L, "https://bad.org/x", p(T1)),          // blocklisted domain
      (5L, "ftp://alpha.com/x", p(T1)),          // non-http(s) scheme
      (6L, "https://beta.org/nav",               // boilerplate-only page ->
        "<nav><a href=\"/\">Home</a></nav>"),    //   empty content -> und/low
      (7L, "https://beta.org/de", p("der hund und die katze laufen " +
        "schnell durch den garten weil sie heute sehr froh sind und " +
        "spielen wollen immer")),                // lang 'de', allow-list en
      (8L, "https://beta.org/low", p("is!!!!!!!!!!")), // en but quality 0
      // four distinct survivors on ONE domain -> cap k=2 keeps 10, 11
      (10L, "https://big.com/p0", p(T1 + " landmark site number zero here")),
      (11L, "https://big.com/p1", p(T1 + " landmark site number one here")),
      (12L, "https://big.com/p2", p(T1 + " landmark site number two here")),
      (13L, "https://big.com/p3", p(T1 + " landmark site number three here")))
      .toDF("doc_id", "url", "html")
    val out = Curation.curateWeb(pages, "doc_id", "url", "html",
      allowedLangs = Seq("en"), minQuality = 40,
      blockedDomains = Seq("bad.org"), maxPerDomain = 2)
    val rows = out.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 10L, 11L),
      rows.mkString("; "))
    val r1 = rows(0)
    assert(r1.getAs[Long]("n_email") == 1L)
    val scrubbed = r1.getAs[String]("content_scrubbed")
    assert(scrubbed.contains("[EMAIL]") && !scrubbed.contains("a@b.io"))
    assert(r1.getAs[Long]("n_copies") == 2L,
      "the punct mutant must reach dedup and collapse onto its original")
    assert(r1.getAs[String]("url_domain") == "alpha.com")
    assert(r1.getAs[String]("canonical_url") == "https://alpha.com/a")
    // shape: the per-row stages fuse — exactly TWO exchanges total
    // (fingerprint-dedup window + per-domain cap window)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 2, plan)
    // without the cap: ONE shuffle
    val noCap = Curation.curateWeb(pages, "doc_id", "url", "html",
      allowedLangs = Seq("en"), minQuality = 40,
      blockedDomains = Seq("bad.org"))
    val planNoCap = noCap.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(planNoCap).length == 1, planNoCap)
    assert(noCap.count() == 5) // 1 + all four big.com pages
  }

  test("curateWeb(fixMojibake): recovered content is repaired before the gates") {
    val spark2 = spark
    import spark2.implicits._
    val clean = " the café — a naïve review"
    val moji = new String(
      clean.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    val T = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river where it drinks water in peace today"
    val pages = Seq(
      (1L, "https://alpha.com/a", s"<html><body><p>$T$moji</p></body></html>"),
      (2L, "https://beta.com/b", s"<html><body><p>$T clean page</p></body></html>")
    ).toDF("doc_id", "url", "html")
    def run(fix: Boolean) = Curation.curateWeb(pages, "doc_id", "url", "html",
      allowedLangs = Seq("en"), minQuality = 10, fixMojibake = fix)
    val fixed = run(fix = true)
    val raw = run(fix = false)
    assert(fixed.count() == 2 && raw.count() == 2)
    val fixedContent = fixed.filter(col("doc_id") === 1L)
      .select("content_scrubbed").head().getString(0)
    val rawContent = raw.filter(col("doc_id") === 1L)
      .select("content_scrubbed").head().getString(0)
    assert(fixedContent.contains("café — a naïve") && !fixedContent.contains("Ã"),
      fixedContent)
    assert(rawContent.contains("cafÃ©"), rawContent)
    // the clean page is byte-identical through both paths
    assert(fixed.filter(col("doc_id") === 2L).select("content_scrubbed").head() ==
      raw.filter(col("doc_id") === 2L).select("content_scrubbed").head())
  }

  test("curateWeb with a PSL: domains group by real suffix rules, blocklist rides them") {
    import spark.implicits._
    def p(t: String) = s"<p>$t</p>"
    val T1 = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river where it drinks water in peace today"
    val pages = Seq(
      // two distinct user sites on github.io — the PSL keeps them APART
      // (the heuristic would group both under github.io and a cap of 1
      // would wrongly drop one)
      (1L, "https://alice.github.io/a", p(T1 + " alpha page")),
      (2L, "https://bob.github.io/b", p(T1 + " beta page")),
      // blocklisted BY its PSL-registered domain
      (3L, "https://evil.foo.go.jp/x", p(T1 + " gamma page")),
      (4L, "https://fine.bar.go.jp/y", p(T1 + " delta page")))
      .toDF("doc_id", "url", "html")
    val psl = Seq("com", "org", "io", "jp", "go.jp", "github.io").toDF("suffix")
    val out = Curation.curateWeb(pages, "doc_id", "url", "html",
      allowedLangs = Seq("en"), minQuality = 40,
      blockedDomains = Seq("foo.go.jp"), psl = Some(psl),
      maxPerDomain = 1)
    val rows = out.orderBy("doc_id")
      .select("doc_id", "url_domain").as[(Long, String)].collect()
    assert(rows.toSeq == Seq(
      (1L, "alice.github.io"), (2L, "bob.github.io"), (4L, "bar.go.jp")),
      rows.mkString("; "))
    // same pages through the HEURISTIC default: both github.io users
    // collapse into one domain group and the cap drops one — exactly
    // the day-one mis-grouping the PSL variant exists to fix
    val heur = Curation.curateWeb(pages, "doc_id", "url", "html",
      allowedLangs = Seq("en"), minQuality = 40,
      blockedDomains = Seq("foo.go.jp"), maxPerDomain = 1)
    // heuristic mis-groupings, both directions: evil.foo.go.jp maps to
    // go.jp — NOT blocklisted, so the blocked site SURVIVES (3); and
    // both *.github.io users and both *.go.jp hosts collapse into one
    // group each, so cap 1 drops bob (2) and fine.bar (4)
    val heurIds = heur.select("doc_id").as[Long].collect().toSet
    assert(heurIds == Set(1L, 3L), heurIds.toString)
  }

  test("full recipe: compose, laws hold, deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // the "benchmark" to protect: mid-doc passages of every 50th doc
    val evalDf = docs.filter(pmod(col("doc_id"), lit(50L)) === 0L)
      .filter(size(TextOps.tokens(col("text"))) >= 24)
      .select(col("doc_id").as("eval_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 5, 20)).as("text"))

    def run(): org.apache.spark.sql.DataFrame = {
      // 1. intra-doc span dedup (map-only text rewrite)
      val despanned = docs.withColumn("text",
        graft.functions.NativeFunctions.graft_despan(col("text"), 16))
      // 1.5 full-taxonomy PII scrub (release contract: raw text never
      //     ships) — stateless map chain, fuses with the stages around it
      val scrubbed = Pii.scrub(despanned, "text")
        .drop("text", "n_email", "n_phone", "n_ip")
        .withColumnRenamed("text_scrubbed", "text")
      // 2. curation: language allow-list + quality floor
      val curated = scrubbed
        .filter(TextOps.langGuess(col("text"))
          .isInCollection(Seq("en", "de", "fr", "es")))
        .filter(TextOps.qualityScore(col("text")) >= 40)
      // 3. decontamination vs the eval passages — the SELECTIVE
      //    word-shingle detector drops; the paranoid winnow detector is
      //    the audit, not the drop path (on this synthetic small-vocab
      //    corpus any 12-char substring is everywhere — see the
      //    winnowContaminationPairs selectivity note)
      val contaminated = Dedup.contaminationPairs(
        curated, "doc_id", evalDf, "eval_id", "text", minShared = 3L)
        .select(col("train_id").as("doc_id")).distinct()
      val clean = curated.join(contaminated, Seq("doc_id"), "left_anti")
      // 4. semantic dedup on the doc embeddings (doc_id == vec_id space
      //    at this SF; inner join keeps docs that have an embedding)
      val withVec = clean.join(
        emb.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      // corpus-level model, trained ONCE on the unfiltered embedding
      // table (the q48/q104 pattern) — cell geometry must not drift with
      // upstream filter changes
      val model = Ivf.trainCached(s"$sf/embeddings#recipe", emb,
        "embedding", k = 16)
      val deduped = SemDedup.semanticDedupIvf(
        withVec, "doc_id", "embedding", model, eps = 0.999999)
      // 4.5 temperature-flattened language mixture (α = 0.5): the head
      //     language shrinks, the tail keeps presence; the UniMax cap
      //     never oversamples a language
      val mixed = Curation.temperatureMixture(deduped, "doc_id", "lang",
        budget = deduped.count() / 2)
      // 5. exact stratified split by language
      val split = Splits.stratifiedExactSplit(mixed, "doc_id", "lang",
        Seq("train" -> 9000, "holdout" -> -1), seed = 5)
      // 6. balanced shards over the TRAIN side only
      Splits.balancedShards(split.filter(col("split") === "train"),
        "doc_id", "n_chars", nShards = 4)
    }

    val out = run().cache()
    val n = out.count()
    assert(n > 0, "recipe must not empty the corpus")
    // decontamination law survives the chain: nothing sharing >=3 word
    // shingles with any eval passage ships
    val shippedHits = Dedup.contaminationPairs(
      out.select("doc_id", "text"), "doc_id", evalDf, "eval_id", "text",
      minShared = 3L).count()
    assert(shippedHits == 0, s"$shippedHits contaminated docs shipped")
    // split hygiene: every shipped row is train-side
    assert(out.filter(col("split") =!= "train").count() == 0)
    // PII release contract survives the chain: nothing shipped matches
    // any scrub-class pattern
    graft.ops.Pii.Classes.foreach { c =>
      assert(out.filter(col("text").rlike(c.pattern)).count() == 0,
        s"shipped text still matches ${c.name}")
    }
    // the temperature mixture kept the language tail alive through the
    // rest of the chain
    assert(out.select("lang").distinct().count() >= 2,
      "tail languages must survive the mixture")
    // shard balance law holds at the end of the chain
    val sums = out.groupBy("shard").agg(sum("n_chars").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.length == 4)
    val maxW = out.agg(max("n_chars")).head().getLong(0)
    assert(sums.max - sums.min <= maxW)
    // end-to-end determinism
    val again = run()
    assert(out.select("doc_id", "shard").except(
      again.select("doc_id", "shard")).count() == 0)
    assert(again.select("doc_id", "shard").except(
      out.select("doc_id", "shard")).count() == 0)
    out.unpersist()
    OpCaches.releaseAll()
  }
}
