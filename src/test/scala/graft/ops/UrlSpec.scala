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
