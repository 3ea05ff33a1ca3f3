package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for [[Url]]: canonical-form fixtures, the
  * registered-domain heuristic, the keep predicate, plan shape (one map
  * stage, no shuffle), and the blocklist-join variant. */
class UrlSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url").select(Url.canonicalize(col("url"))).head().getString(0)

  private def domain(url: String): String =
    Seq(url).toDF("url").select(Url.registeredDomain(col("url"))).head().getString(0)

  private def keep(url: String, blocked: Seq[String] = Nil): Boolean =
    Seq(url).toDF("url").select(Url.keepUrl(col("url"), blocked)).head().getBoolean(0)

  test("canonicalize: case, www, default port, fragment, tracking params, slash") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag")
      == "http://example.com/a/b?a=1&b=2")
    assert(canon("https://News.Example.co.uk:443/Path") ==
      "https://news.example.co.uk/Path")
    // path case is preserved; host case is not
    assert(canon("https://SITE.org/CamelPath") == "https://site.org/CamelPath")
    // bare host == host + '/' == host + '///'
    assert(canon("https://site.org") == "https://site.org")
    assert(canon("https://site.org/") == "https://site.org")
    assert(canon("https://site.org///") == "https://site.org")
    // param order never splits a group; empty params dropped
    assert(canon("http://site.org/?x=1&a=9") == canon("http://site.org?a=9&x=1"))
    assert(canon("http://site.org/p?&&a=1") == "http://site.org/p?a=1")
    // all params tracking -> no query at all
    assert(canon("http://site.org/p?utm_source=a&utm_medium=b&gclid=z")
      == "http://site.org/p")
    // tracker keys are matched case-INSENSITIVELY (third-party snippets
    // vary casing; a surviving UTM_SOURCE would split a duplicate group)
    assert(canon("http://site.org/p?UTM_SOURCE=x&a=1") == "http://site.org/p?a=1")
    assert(canon("http://site.org/p?FbClId=z&Utm_Campaign=c&a=1")
      == "http://site.org/p?a=1")
    // ...but param VALUES are untouched (pattern stops at '=')
    assert(canon("http://site.org/p?a=UTM_SOURCE") == "http://site.org/p?a=UTM_SOURCE")
    // 'ref' is stripped wholesale — the documented trade-off (see the
    // TrackingParamPattern scaladoc): on sites where ref selects content
    // these two distinct pages deliberately canonicalize identically
    assert(canon("http://forum.org/t?ref=homepage")
      == canon("http://forum.org/t?ref=sidebar"))
    // 'ref' must be the WHOLE key: prefix/suffix lookalikes survive
    assert(canon("http://site.org/p?refid=9") == "http://site.org/p?refid=9")
    assert(canon("http://site.org/p?href=x") == "http://site.org/p?href=x")
    // non-default port is KEPT (it names a different resource)
    assert(canon("http://site.org:8080/p") == "http://site.org:8080/p")
    // :443 is only default for https, :80 only for http
    assert(canon("http://site.org:443/p") == "http://site.org:443/p")
    // not an absolute URL -> ''
    assert(canon("not a url") == "")
    assert(canon("/relative/path") == "")
  }

  test("registered domain heuristic: two-level suffixes, plain TLDs, single label") {
    assert(domain("http://www.news.example.co.uk/x") == "example.co.uk")
    assert(domain("http://a.b.site.org/x") == "site.org")
    assert(domain("http://Example.COM/x") == "example.com")
    assert(domain("http://deep.cdn.assets.org/x") == "assets.org")
    assert(domain("http://localhost/x") == "localhost")
    // ac counts as a second-level suffix only with >= 3 labels
    assert(domain("http://maths.ox.ac.uk/") == "ox.ac.uk")
  }

  /** Fixture PSL slice covering the multi-level suffix classes the
    * heuristic mis-groups: 2-label ccTLD registries (`go.jp`, `com.au`),
    * a private-registry rule (`github.io`), and a 3-label US-school rule
    * (`k12.ma.us`). Lowercase, no leading dot — the [[Url.markWithPsl]]
    * input contract. */
  private val PslFixture = Seq("com", "org", "net", "io", "uk", "jp", "us",
    "co.uk", "ac.uk", "gov.uk", "com.au", "go.jp", "co.jp", "github.io",
    "k12.ma.us")

  private def pslDomain(url: String): String =
    Seq(url).toDF("url")
      .select(Url.registeredDomainWithSuffixes(col("url"), PslFixture))
      .head().getString(0)

  test("PSL registered domain: longest-match wins, agrees with heuristic where it's right") {
    // agreement cases — the heuristic already groups these correctly
    assert(pslDomain("http://www.news.example.co.uk/x") == "example.co.uk")
    assert(pslDomain("http://a.b.site.org/x") == "site.org")
    assert(pslDomain("http://Example.COM/x") == "example.com")
    assert(pslDomain("http://shop.example.com.au/x") == "example.com.au")
    assert(domain("http://shop.example.com.au/x") == "example.com.au")
    // host IS a public suffix -> fallback (last two labels), never a
    // phantom extra label
    assert(pslDomain("http://co.uk/") == "co.uk")
    // no rule matches at all -> last-two-labels fallback, same as the
    // heuristic's .otherwise branch
    assert(pslDomain("http://x.internal.corp/x") == "internal.corp")
    assert(pslDomain("http://localhost/x") == "localhost")
  }

  test("PSL vs heuristic: the documented divergence cases") {
    // go.jp is a public suffix the 7-entry heuristic doesn't know:
    // heuristic collapses every *.go.jp agency into one group
    assert(pslDomain("http://foo.go.jp/x") == "foo.go.jp")
    assert(domain("http://foo.go.jp/x") == "go.jp")
    assert(pslDomain("http://www.mofa.go.jp/x") == "mofa.go.jp")
    // private-registry rule: every user site is its own registered domain
    assert(pslDomain("http://user.github.io/p") == "user.github.io")
    assert(domain("http://user.github.io/p") == "github.io")
    // 3-label suffix: the heuristic's 2-label window can't express it
    assert(pslDomain("http://school.k12.ma.us/x") == "school.k12.ma.us")
    assert(domain("http://school.k12.ma.us/x") == "ma.us")
  }

  test("PSL wildcard + exception rules: the publicsuffix.org test vectors") {
    // pure-PSL vectors go through ...FromHost on literal hosts: the
    // URL-level path strips a leading `www.` as part of canonicalization
    // (its own pinned convention), which would hide the !www.ck vector
    def dom(rules: Seq[String])(h: String) = Seq(h).toDF("h")
      .select(Url.registeredDomainWithSuffixesFromHost(col("h"), rules))
      .head().getString(0)
    // straight from the PSL test file's *.ck / !www.ck family…
    val ck = dom(Seq("com", "*.ck", "!www.ck")) _
    assert(ck("b.test.ck") == "b.test.ck")     // *.ck: test.ck is a suffix
    assert(ck("a.b.test.ck") == "b.test.ck")
    assert(ck("www.ck") == "www.ck")           // !www.ck: the rule IS the domain
    assert(ck("www.www.ck") == "www.ck")
    // host IS the wildcard public suffix (PSL: no registered domain) →
    // the documented best-effort fallback, last two labels
    assert(ck("test.ck") == "test.ck")
    // …and the *.kobe.jp / !city.kobe.jp family, where a SHORTER plain
    // rule (jp) coexists with the wildcard
    val jp = dom(Seq("jp", "*.kobe.jp", "!city.kobe.jp")) _
    assert(jp("kobe.jp") == "kobe.jp")               // plain jp rule
    assert(jp("www.c.kobe.jp") == "www.c.kobe.jp")   // *.kobe.jp
    assert(jp("a.www.c.kobe.jp") == "www.c.kobe.jp")
    assert(jp("city.kobe.jp") == "city.kobe.jp")     // exception
    assert(jp("www.city.kobe.jp") == "city.kobe.jp")
    // URL-level: the www-strip convention composes with the exception
    // rule (www.www.ck → host www.ck → exception hits)
    val viaUrl = Seq("http://www.www.ck/x").toDF("url")
      .select(Url.registeredDomainWithSuffixes(col("url"),
        Seq("com", "*.ck", "!www.ck"))).head().getString(0)
    assert(viaUrl == "www.ck")
  }

  test("PslRules.compile: comments/blanks/nulls dropped, casing normalized, bad wildcards rejected") {
    val rules = Url.PslRules.compile(Seq(
      "// comment line", "", "  ", null, "COM", "*.CK", "!WWW.ck", "co.uk"))
    assert(rules.plain == Map(1 -> Seq("com"), 2 -> Seq("co.uk")))
    assert(rules.wildcardBases == Map(1 -> Seq("ck")))
    assert(rules.exceptions == Map(2 -> Seq("www.ck")))
    // a mixed-case DataFrame rule matches after markWithPsl's sanitation
    val psl = Seq("GO.JP", null, "  ", "// x").toDF("suffix")
    val marked = Url.markWithPsl(
      Seq("https://a.foo.GO.jp/x").toDF("url"), "url", psl)
    assert(marked.select("url_domain").head().getString(0) == "foo.go.jp")
    // embedded / non-leftmost wildcards are loud errors, not silent labels
    intercept[IllegalArgumentException](Url.PslRules.compile(Seq("a.*.b")))
    intercept[IllegalArgumentException](Url.PslRules.compile(Seq("!*.ck")))
    intercept[IllegalArgumentException](Url.PslRules.compile(Seq("*")))
  }

  test("loadPslFile: raw public_suffix_list.dat format round-trips into markWithPsl") {
    val dat = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(dat,
      """// ===BEGIN ICANN DOMAINS===
        |com
        |
        |// ck : https://example.invalid
        |*.ck
        |!www.ck
        |jp
        |kobe.jp
        |""".stripMargin)
    val psl = Url.loadPslFile(spark, dat.toString)
    assert(psl.count() == 5) // comments and blanks dropped
    val marked = Url.markWithPsl(
      Seq("https://a.b.test.ck/x").toDF("url"), "url", psl)
    assert(marked.select("url_domain").head().getString(0) == "b.test.ck")
  }

  test("markWithPsl: one map stage, no shuffle, guarded collect, blocklist") {
    import org.apache.spark.sql.DataFrame
    val psl: DataFrame = PslFixture.toDF("suffix")
    val df = Seq(
      "https://a.foo.go.jp/doc",
      "https://user.github.io/p",
      "https://evil.spam.com/x",
      "https://keep.site.org/y").toDF("url")
    val marked = Url.markWithPsl(df, "url", psl, blockedDomains = Seq("spam.com"))
    // zero-shuffle contract: the PSL rides the plan as InSet predicates
    val plan = marked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val rows = marked.orderBy("url")
      .select("url", "url_domain", "url_keep")
      .as[(String, String, Boolean)].collect()
    assert(rows.map(_._2).toSeq ==
      Seq("foo.go.jp", "spam.com", "site.org", "user.github.io"))
    assert(rows.map(_._3).toSeq == Seq(true, false, true, true))
    // the guard fails loudly, never OOMs the driver
    val e = intercept[IllegalArgumentException](
      Url.markWithPsl(df, "url", psl, maxSuffixes = 3))
    assert(e.getMessage.contains("maxSuffixes"))
  }

  test("keep predicate: schemes, asset extensions, blocklisted domains") {
    assert(keep("https://site.org/article"))
    assert(!keep("ftp://site.org/article"))
    assert(!keep("mailto:someone@site.org"))
    assert(!keep("https://site.org/app.js"))
    assert(!keep("https://site.org/IMG.PNG")) // extension check is case-blind
    assert(!keep("https://site.org/a.woff2"))
    assert(keep("https://site.org/jsx")) // extension must be an extension
    assert(!keep("https://evil.spam.net/x", blocked = Seq("spam.net")))
    assert(keep("https://fine.site.net/x", blocked = Seq("spam.net")))
  }

  test("compiled parts kernel == regex twins, field for field") {
    // every canonicalization fixture in this spec plus the edge shapes:
    // the kernel must reproduce scheme/host/path/canonicalQuery and the
    // derived canonical EXACTLY (for non-absolute URLs the kernel zeroes
    // all fields — every consumer is gated on scheme, so only the
    // derived canonical is compared there)
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "https://News.Example.co.uk:443/Path",
      "https://SITE.org/CamelPath",
      "https://site.org", "https://site.org/", "https://site.org///",
      "http://site.org/?x=1&a=9", "http://site.org?a=9&x=1",
      "http://site.org/p?&&a=1",
      "http://site.org/p?utm_source=a&utm_medium=b&gclid=z",
      "http://site.org/p?UTM_SOURCE=x&a=1",
      "http://site.org/p?FbClId=z&Utm_Campaign=c&a=1",
      "http://site.org/p?a=UTM_SOURCE",
      "http://site.org/p?refid=9&href=x&ref=gone",
      "http://site.org:8080/p", "http://site.org:443/p",
      "https://h.org/p?flag&a=1",       // param without '=' survives
      "https://h.org/p?utm_a-b=1",      // non-alnum utm key survives
      "https://h.org/a?z=1&y=2&z=0",    // duplicate keys both kept, sorted
      "ftp://x.org/y?a=1#f", "a://",
      "not a url", "/relative/path", "", "#only-fragment",
      "https://Üni.example.org/Pfad?b=1&a=2") // non-ASCII host lowercase
      .toDF("url")
    val p = Url.parts(col("url"))
    val cmp = urls.select(
      col("url"),
      p.getField("scheme").as("ks"), Url.scheme(col("url")).as("ts"),
      p.getField("host").as("kh"), Url.host(col("url")).as("th"),
      p.getField("path").as("kp"), Url.path(col("url")).as("tp"),
      p.getField("query").as("kq"), Url.canonicalQuery(col("url")).as("tq"),
      Url.canonicalize(col("url")).as("tc")).collect()
    cmp.foreach { r =>
      val abs = r.getAs[String]("ts").nonEmpty
      assert(r.getAs[String]("ks") == r.getAs[String]("ts"), r.toString)
      if (abs) {
        assert(r.getAs[String]("kh") == r.getAs[String]("th"), r.toString)
        assert(r.getAs[String]("kp") == r.getAs[String]("tp"), r.toString)
        assert(r.getAs[String]("kq") == r.getAs[String]("tq"), r.toString)
      }
    }
    // derived canonical == regex canonicalize on every row (incl. the
    // non-absolute ones, both '')
    val derived = urls.select(Url.canonicalize(col("url")).as("tw"),
      when(p.getField("scheme") === "", lit("")).otherwise(
        concat(p.getField("scheme"), lit("://"), p.getField("host"),
          p.getField("path"), when(p.getField("query") === "", lit(""))
            .otherwise(concat(lit("?"), p.getField("query"))))).as("kc"))
    assert(derived.filter(col("tw") =!= col("kc")).count() == 0)
    // and mark()'s outputs (kernel-derived) equal the regex forms
    val marked = Url.mark(urls, "url", blockedDomains = Seq("site.org"))
    val diff = marked.filter(
      col("canonical_url") =!= Url.canonicalize(col("url")) ||
      col("url_domain") =!= Url.registeredDomain(col("url")) ||
      col("url_keep") =!= Url.keepUrl(col("url"), Seq("site.org")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("mark is one map stage: no exchange, no aggregate") {
    val df = spark.range(100).select(
      concat(lit("https://h"), pmod(col("id"), lit(7L)).cast("string"),
        lit(".example.org/p/"), col("id").cast("string")).as("url"))
    val marked = Url.mark(df, "url")
    val plan = marked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(marked.filter(col("url_keep")).count() == 100)
    assert(marked.select("url_domain").distinct().collect()
      .map(_.getString(0)).forall(_ == "example.org"))
  }

  test("mark refuses inputs that already carry its output columns") {
    val df = Seq(("https://a.org/x", true)).toDF("url", "url_keep")
    val e = intercept[IllegalArgumentException](Url.mark(df, "url"))
    assert(e.getMessage.contains("url_keep"))
  }

  test("blocklist join drops exactly the blocked registered domains") {
    val urls = Seq(
      "https://keep.alpha.org/1",
      "https://drop.bad.com/2",
      "https://www.bad.com/3",
      "https://sub.deep.bad.com/4",
      "https://alpha.org/5").toDF("url")
    val blocked = Seq("bad.com").toDF("domain")
    val kept = Url.filterByBlocklist(urls, "url", blocked)
    assert(kept.count() == 2)
    assert(kept.filter(col("url").contains("bad.com")).count() == 0)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
