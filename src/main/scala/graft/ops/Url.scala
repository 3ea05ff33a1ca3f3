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
    * trackers) — dropped by [[canonicalize]]. Anchored, RE2-safe.
    *
    * Case-INSENSITIVE on the key (`(?i)` — RE2 and java.util.regex agree):
    * trackers are appended by third-party snippets whose casing varies
    * (`UTM_SOURCE=` appears in the wild), and a surviving case-variant
    * tracker would split one page into several canonical URLs — the
    * failure mode canonicalization exists to prevent. Param VALUES are
    * untouched (the pattern stops at `=`).
    *
    * `ref` trade-off (documented choice, same spirit as the userinfo
    * scope contract above): `ref`/`ref_src` style referral tags are the
    * most common non-`utm_` tracker, so it is stripped — accepting that
    * on the minority of sites where `ref` SELECTS content (some forums,
    * some storefront filters) distinct pages canonicalize identically
    * and downstream URL-level dedup keeps only one. A crawl that targets
    * such a site should canonicalize with a site-specific pattern; the
    * default optimizes for the common case where keeping `ref` splits
    * duplicate groups by referrer. UrlSpec pins both behaviors. */
  val TrackingParamPattern: String =
    "(?i)^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid|igshid|ref)="

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
    * not an algorithm — [[registeredDomainWithSuffixes]] /
    * [[markWithPsl]] are the table-driven production variants; this
    * heuristic is the NO-DATA fallback (and the two agree wherever the
    * heuristic is right — UrlSpec pins the divergence cases). */
  val SecondLevelSuffixes: Seq[String] =
    Seq("co", "com", "net", "org", "gov", "ac", "edu")

  def registeredDomain(url: Column): Column =
    registeredDomainFromHost(host(url))

  /** The heuristic over an already-extracted host (the [[mark]] path —
    * the host comes from the compiled [[parts]] kernel there). */
  def registeredDomainFromHost(h: Column): Column = {
    val l = split(h, "\\.")
    val n = size(l)
    when(n >= 3 && element_at(l, n - 1).isInCollection(SecondLevelSuffixes),
        concat_ws(".", slice(l, n - 2, lit(3))))
      .otherwise(concat_ws(".", slice(l, greatest(n - 1, lit(1)), lit(2))))
  }

  /** One-pass compiled URL decomposition (`graft_url_parts` —
    * `struct(scheme, host, path, query)`): the production twin of the
    * regex Columns above, which chain ~10 java-regex replaces per row
    * and hit the per-JVM replaceAll throughput wall (see
    * [[graft.functions.Hashing.urlParts]] for exact semantics and the
    * measurement). The regex Columns STAY as the transparent forms the
    * SQL oracles replay; [[mark]]/[[markWithPsl]] derive everything
    * from one kernel evaluation per row. */
  def parts(url: Column): Column = {
    graft.functions.NativeFunctions.ensureRegistered()
    graft.functions.NativeFunctions.graft_url_parts(url)
  }

  private def canonicalFromParts(p: Column): Column =
    when(p.getField("scheme") === "", lit(""))
      .otherwise(concat(p.getField("scheme"), lit("://"), p.getField("host"),
        p.getField("path"),
        when(p.getField("query") === "", lit(""))
          .otherwise(concat(lit("?"), p.getField("query")))))

  /** PSL rules never exceed a handful of labels (the longest entries in
    * the real list are 4-label, e.g. `s3.dualstack.ap-south-1.amazonaws
    * .com`-class private rules); candidate generation is capped here so
    * the per-row cost is a CONSTANT number of set probes. */
  val MaxSuffixLabels: Int = 4

  /** Registered-domain extraction against a REAL public-suffix list —
    * the production variant [[registeredDomain]]'s scaladoc promises.
    * Longest-match-wins over the host's trailing label runs, exactly the
    * PSL algorithm for plain (non-wildcard, non-exception) rules: try
    * the longest candidate suffix first ([[MaxSuffixLabels]] labels down
    * to 1); on the first hit the registered domain is the suffix plus
    * ONE more label. A host that IS a public suffix, or that matches
    * nothing, falls back to the last-two-labels default — the PSL's own
    * prevailing `*` rule, and [[registeredDomain]]'s `.otherwise` branch,
    * so the two variants agree everywhere the heuristic is right and
    * differ only where the heuristic mis-groups (UrlSpec pins the
    * documented divergence cases: `foo.go.jp`, `user.github.io`,
    * `school.k12.ma.us`).
    *
    * Scale shape — why a compiled set, not a join: a join-based
    * longest-match needs candidate explode + a per-row re-group, putting
    * a shuffle on the CRAWL side for a lookup table of ~10^4 rows. The
    * PSL is model-sized (the real list is ~9k active rules), so it rides
    * the plan as Catalyst `InSet` predicates — hash-set probes, O(1) per
    * candidate, zero shuffle, same one-map-stage plan as the heuristic.
    * [[markWithPsl]] is the table-driven seam that feeds this from a
    * DataFrame (the [[filterByBlocklist]]-style entry point). */
  def registeredDomainWithSuffixes(url: Column, suffixes: Seq[String]): Column =
    registeredDomainWithSuffixesFromHost(host(url), suffixes)

  /** PSL longest-match over an already-extracted host (the
    * [[markWithPsl]] path — host from the compiled [[parts]] kernel). */
  def registeredDomainWithSuffixesFromHost(h: Column,
      suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "public-suffix list must be non-empty")
    val l = split(h, "\\.")
    val n = size(l)
    val fallback = concat_ws(".", slice(l, greatest(n - 1, lit(1)), lit(2)))
    (MaxSuffixLabels to 1 by -1).foldRight(fallback) { (i, elseCol) =>
      // candidate suffix = last i labels; a hit needs one label in front
      when(n > i && concat_ws(".", slice(l, n - i + 1, lit(i)))
          .isInCollection(suffixes),
        concat_ws(".", slice(l, n - i, lit(i + 1))))
        .otherwise(elseCol)
    }
  }

  /** [[mark]] with PSL-backed registered domains: `psl` is a DataFrame
    * with a `suffix` column (one public-suffix rule per row, lowercase,
    * no leading dot). The list is collected ONCE (model-sized, guarded —
    * the [[Curation.mixtureBalance]] driver-table pattern: fail loudly,
    * never OOM) and compiled into the plan; the crawl side stays a
    * single map stage with zero shuffle. */
  def markWithPsl(df: DataFrame, urlCol: String, psl: DataFrame,
      blockedDomains: Seq[String] = Nil,
      maxSuffixes: Int = 1000000): DataFrame = {
    require(psl.columns.contains("suffix"),
      "public-suffix list must have a 'suffix' column")
    Sampling.requireFreshColumns(df, "Url.markWithPsl",
      "canonical_url", "url_domain", "url_keep", "__url_parts")
    val suffixes = psl.select(col("suffix").cast("string")).distinct()
      .limit(maxSuffixes + 1)
      .collect().map(_.getString(0)).toSeq
    require(suffixes.size <= maxSuffixes,
      s"markWithPsl: more than $maxSuffixes suffix rules — the list is " +
        "compiled into the plan; raise maxSuffixes only with driver/plan " +
        "memory to match")
    val p = col("__url_parts")
    val dom = registeredDomainWithSuffixesFromHost(p.getField("host"), suffixes)
    val keepBase = p.getField("scheme").isInCollection(Seq("http", "https")) &&
      !lower(p.getField("path")).rlike(BlockedExtensionPattern)
    val keep = if (blockedDomains.isEmpty) keepBase
      else keepBase && !dom.isInCollection(blockedDomains)
    df.withColumn("__url_parts", parts(col(urlCol)))
      .withColumn("canonical_url", canonicalFromParts(p))
      .withColumn("url_domain", dom)
      .withColumn("url_keep", keep)
      .drop("__url_parts")
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
      "canonical_url", "url_domain", "url_keep", "__url_parts")
    val p = col("__url_parts")
    val dom = registeredDomainFromHost(p.getField("host"))
    val keepBase = p.getField("scheme").isInCollection(Seq("http", "https")) &&
      !lower(p.getField("path")).rlike(BlockedExtensionPattern)
    val keep = if (blockedDomains.isEmpty) keepBase
      else keepBase && !dom.isInCollection(blockedDomains)
    df.withColumn("__url_parts", parts(col(urlCol)))
      .withColumn("canonical_url", canonicalFromParts(p))
      .withColumn("url_domain", dom)
      .withColumn("url_keep", keep)
      .drop("__url_parts")
  }

  /** Blocklist as a TABLE (column `domain`): left-anti join on the
    * registered domain. Blocklists are ~10^5–10^7 rows — broadcast-sized
    * next to a 100 TB crawl, and Catalyst/AQE broadcasts them; the crawl
    * side never shuffles. */
  def filterByBlocklist(df: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    require(blocked.columns.contains("domain"),
      "blocklist must have a 'domain' column")
    df.withColumn("url_domain",
        registeredDomainFromHost(parts(col(urlCol)).getField("host")))
      .join(broadcast(blocked.select(col("domain").as("url_domain")).distinct()),
        Seq("url_domain"), "left_anti")
  }
}
