package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + filtering — the front stage of every web-crawl
  * curation pipeline (C4 and RefinedWeb both start here: normalize the
  * URL, drop blocklisted domains and non-document resources, then dedup
  * by canonical URL before any text processing runs, because a URL-level
  * drop is ~10^3× cheaper than fetching/parsing the page it names).
  *
  * Everything is composed from built-in string/regexp/array expressions —
  * per-row, no shuffle, and (HOF filter/sort aside) codegen'd — and is
  * deliberately restricted to constructs an external SQL engine replays
  * exactly (anchored regexes, lexicographic ASCII sort), so the whole
  * canonicalization is oracle-checkable end-to-end (q129).
  *
  * Scope contract (documented, not hidden): absolute `http(s)://` URLs
  * without userinfo — the web-crawl regime. Other schemes are not
  * canonicalized away; they are what [[keepUrl]] filters out.
  *
  * Canonical form: lowercase scheme and host, `www.` prefix stripped,
  * default port stripped (`:80` http / `:443` https), fragment stripped,
  * trailing slashes on the path stripped (so `/a/` ≡ `/a`, and a bare
  * host ≡ host + `/`), tracking query parameters removed (`utm_*`,
  * `fbclid`, `gclid`, `msclkid`, `mc_eid`, `igshid`, `ref`), remaining
  * parameters SORTED so parameter order never splits a duplicate group.
  */
object Url {

  /** Query parameters that never identify content (click/campaign
    * trackers) — dropped by [[canonicalize]]. Anchored, RE2-safe. */
  val TrackingParamPattern: String =
    "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid|igshid|ref)="

  /** Resource extensions that are not documents (the C4-style asset
    * drop). Case-insensitive via lowercased path. */
  val BlockedExtensionPattern: String =
    "\\.(css|js|mjs|png|jpe?g|gif|ico|svg|webp|woff2?|ttf|mp4|mp3|zip|gz|exe)$"

  private def stripFragment(url: Column): Column =
    regexp_replace(url, "#.*", "")

  /** Lowercased scheme, or '' when the URL is not absolute. */
  def scheme(url: Column): Column =
    lower(regexp_extract(stripFragment(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** scheme://host[:port]... minus the scheme, '' when not absolute. */
  private def afterScheme(url: Column): Column = {
    val u = stripFragment(url)
    when(scheme(url) === "", lit(""))
      .otherwise(regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""))
  }

  /** Lowercased host with `www.` and the scheme-default port stripped. */
  def host(url: Column): Column = {
    val hp = lower(regexp_extract(afterScheme(url), "^([^/?]*)", 1))
    val noWww = regexp_replace(hp, "^www\\.", "")
    val s = scheme(url)
    when(s === "http", regexp_replace(noWww, ":80$", ""))
      .when(s === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** Path with trailing slashes stripped ('' for the bare host). Not
    * lowercased: paths are case-significant, unlike hosts. */
  def path(url: Column): Column = {
    val pq = regexp_replace(afterScheme(url), "^[^/?]*", "")
    regexp_replace(regexp_extract(pq, "^([^?]*)", 1), "/+$", "")
  }

  /** Canonical query string: tracking params dropped, the rest sorted
    * and re-joined; '' when nothing survives. */
  def canonicalQuery(url: Column): Column = {
    val q = regexp_extract(stripFragment(url), "\\?(.*)$", 1)
    array_join(array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))), "&")
  }

  /** The canonical URL (see the object doc for the exact form). Rows
    * that are not absolute http(s)-style URLs canonicalize to '' —
    * [[keepUrl]] rejects them anyway. */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    when(scheme(url) === "", lit(""))
      .otherwise(concat(scheme(url), lit("://"), host(url), path(url),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registered-domain ("site") extraction from [[host]] with the
    * standard two-level-suffix heuristic: `a.b.co.uk` → `b.co.uk`,
    * `a.b.org` → `b.org`. The full public-suffix list is a data file,
    * not an algorithm — production swaps [[SecondLevelSuffixes]] for a
    * broadcast lookup of the PSL; the grouping shape is identical. */
  val SecondLevelSuffixes: Seq[String] =
    Seq("co", "com", "net", "org", "gov", "ac", "edu")

  def registeredDomain(url: Column): Column = {
    val l = split(host(url), "\\.")
    val n = size(l)
    when(n >= 3 && element_at(l, n - 1).isInCollection(SecondLevelSuffixes),
        concat_ws(".", slice(l, n - 2, lit(3))))
      .otherwise(concat_ws(".", slice(l, greatest(n - 1, lit(1)), lit(2))))
  }

  /** The C4/RefinedWeb keep predicate: absolute http(s), not an asset
    * extension, registered domain not blocklisted. `blockedDomains` is a
    * LITERAL list (rides the plan; fine up to ~10^4 entries) — for a
    * crawl-scale blocklist use [[filterByBlocklist]]. */
  def keepUrl(url: Column, blockedDomains: Seq[String] = Nil): Column = {
    val base = scheme(url).isInCollection(Seq("http", "https")) &&
      !lower(path(url)).rlike(BlockedExtensionPattern)
    if (blockedDomains.isEmpty) base
    else base && !registeredDomain(url).isInCollection(blockedDomains)
  }

  /** Annotate rows with the canonical URL, registered domain, and the
    * keep verdict — one map stage, no shuffle; filtering and URL-level
    * dedup ([[Dedup.exactDedupNormalizedByFingerprint]] semantics apply:
    * group by `xxhash64(canonical_url)` at crawl scale) compose on top. */
  def mark(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String] = Nil): DataFrame = {
    Sampling.requireFreshColumns(df, "Url.mark",
      "canonical_url", "url_domain", "url_keep")
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("url_domain", registeredDomain(col(urlCol)))
      .withColumn("url_keep", keepUrl(col(urlCol), blockedDomains))
  }

  /** Blocklist as a TABLE (column `domain`): left-anti join on the
    * registered domain. Blocklists are ~10^5–10^7 rows — broadcast-sized
    * next to a 100 TB crawl, and Catalyst/AQE broadcasts them; the crawl
    * side never shuffles. */
  def filterByBlocklist(df: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    require(blocked.columns.contains("domain"),
      "blocklist must have a 'domain' column")
    df.withColumn("url_domain", registeredDomain(col(urlCol)))
      .join(broadcast(blocked.select(col("domain").as("url_domain")).distinct()),
        Seq("url_domain"), "left_anti")
  }
}
