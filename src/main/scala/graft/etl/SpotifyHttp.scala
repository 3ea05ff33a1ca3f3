package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** Production HTTP implementation of [[Ingest.SpotifyClient]] (reference
  * S1: ingestion/ingestion/raw/raw.py:51-134 — client-credentials token
  * grant, bearer-authed GETs, 401-refresh-retry, `next`-link pagination).
  *
  * The wire layer is abstracted behind [[SpotifyHttp.Transport]] so the
  * auth/retry/pagination logic is unit-testable with a stubbed transport
  * (this build environment has no egress); production wires
  * [[SpotifyHttp.JdkTransport]] (java.net.http) — no extra dependencies.
  */
object SpotifyHttp {

  final case class Response(status: Int, body: String)

  /** Minimal wire abstraction: just enough surface for the Spotify flows. */
  trait Transport {
    def get(url: String, headers: Map[String, String]): Response
    def postForm(url: String, headers: Map[String, String], body: String): Response
  }

  /** java.net.http-backed transport. */
  final class JdkTransport(timeout: Duration = Duration.ofSeconds(30)) extends Transport {
    private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

    private def send(b: HttpRequest.Builder, headers: Map[String, String]): Response = {
      headers.foreach { case (k, v) => b.header(k, v) }
      val r = client.send(b.timeout(timeout).build(), HttpResponse.BodyHandlers.ofString())
      Response(r.statusCode(), r.body())
    }

    override def get(url: String, headers: Map[String, String]): Response =
      send(HttpRequest.newBuilder(URI.create(url)).GET(), headers)

    override def postForm(url: String, headers: Map[String, String], body: String): Response =
      send(HttpRequest.newBuilder(URI.create(url))
          .POST(HttpRequest.BodyPublishers.ofString(body)),
        headers + ("Content-Type" -> "application/x-www-form-urlencoded"))
  }

  /** Pull one string field out of a JSON object body (token + next-link
    * extraction — the two places the client needs a value from a response
    * it otherwise lands verbatim; a full parser would be dead weight). */
  private[etl] def jsonString(body: String, field: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(body)
    m.map(_.group(1).replace("\\/", "/").replace("\\\"", "\""))
  }

  /** Extract the balanced `"items": [ … ]` array nested under the given
    * key's OBJECT (`"tracks"`, `"artists"`, … — the search-response
    * unwrap, reference raw.py:127-128). The scan is string-aware
    * throughout AND scoped: `items` is only accepted as a member NAME of
    * the key's own object (depth 1 inside it, string-close followed by
    * `:` `[`), so an items-less `{"tracks": {"total": 0}}` next to an
    * `{"artists": {"items": […]}}` returns None instead of silently
    * handing back the wrong entity list, and an `"items"` or `]`
    * inside a string VALUE can neither start nor cut the array. */
  /** Whether the body carries `"key": { … }` at all — the presence probe
    * [[HttpSpotifyClient.search]] uses to tell "entity object there but
    * items-less" (the reference treats that as EMPTY: raw.py's
    * `.get("items", [])` shape) apart from "entity object missing"
    * (genuine shape drift — loud [[ApiShapeException]]). */
  private[etl] def jsonHasKeyObject(body: String, key: String): Boolean =
    ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\\{").r
      .findFirstMatchIn(body).isDefined

  private[etl] def jsonItemsArray(body: String, key: String): Option[String] = {
    val keyMatch = ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\\{").r
      .findFirstMatchIn(body).getOrElse(return None)
    var i = keyMatch.end - 1 // the '{' opening the key's object
    var depth = 0
    var inStr = false
    var esc = false
    var strStart = -1
    var arrStart = -1
    var arrDepth = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') {
          inStr = false
          if (arrStart < 0 && depth == 1 &&
              body.substring(strStart, i) == "items") {
            // member name "items" of the key object: expect ':' then '['
            var j = i + 1
            while (j < body.length && body.charAt(j).isWhitespace) j += 1
            if (j < body.length && body.charAt(j) == ':') {
              j += 1
              while (j < body.length && body.charAt(j).isWhitespace) j += 1
              if (j < body.length && body.charAt(j) == '[') {
                arrStart = j
                arrDepth = depth // array brackets count from here
                i = j - 1        // resume the scan AT the '[' (i += 1 below)
              }
            }
          }
        }
      } else c match {
        case '"' => inStr = true; strStart = i + 1
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (arrStart >= 0 && depth == arrDepth)
            return Some(body.substring(arrStart, i + 1))
          if (depth == 0) return None // key object closed without items
        case _ =>
      }
      i += 1
    }
    None
  }

  final class AuthException(msg: String) extends RuntimeException(msg)

  /** A 200 response whose BODY does not have the expected shape (missing
    * `{type}s.items`, API contract drift) — deliberately NOT an
    * [[AuthException]]: callers with auth-specific handling (credential
    * refresh, re-prompt) must not misdiagnose a data-shape problem as a
    * credential problem. */
  final class ApiShapeException(msg: String) extends RuntimeException(msg)

  /** Bearer-authed Spotify client over an injectable [[Transport]].
    *
    * Flow parity with the reference:
    *  - client-credentials grant with HTTP Basic auth (raw.py:51-66);
    *  - every API call carries `Authorization: Bearer <token>` (raw.py:80-84);
    *  - a 401 triggers ONE token refresh + retry (raw.py:87-93 — the
    *    reference recurses unboundedly; bounding it to one retry is the
    *    safe reading of the same intent);
    *  - playlist responses are wrapped in a JSON array (raw.py:125-126);
    *  - paged endpoints follow the payload's `next` link (Spotify caps
    *    pages at 100 items) up to `maxPages`.
    */
  final class HttpSpotifyClient(
      transport: Transport,
      clientId: String,
      clientSecret: String,
      apiBase: String = "https://api.spotify.com/v1/",
      tokenUrl: String = "https://accounts.spotify.com/api/token",
      maxPages: Int = 100) extends Ingest.SpotifyClient {

    // NB: the counter must initialize BEFORE accessToken — the first token
    // grant runs in the constructor and increments it
    private var refreshes = 0
    private var accessToken: String = refreshAccessToken()

    /** Number of token grants performed (first grant included) — test hook. */
    def tokenRefreshCount: Int = refreshes

    private def refreshAccessToken(): String = {
      val basic = Base64.getEncoder.encodeToString(
        s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
      val r = transport.postForm(tokenUrl,
        Map("Authorization" -> s"Basic $basic"), "grant_type=client_credentials")
      if (r.status != 200)
        throw new AuthException(s"token grant failed: ${r.status}")
      refreshes += 1
      jsonString(r.body, "access_token")
        .getOrElse(throw new AuthException("token grant: no access_token in response"))
    }

    /** GET with bearer auth; on 401, refresh the token once and retry. */
    private def authedGet(url: String): Response = {
      def go(): Response = transport.get(url,
        Map("Authorization" -> s"Bearer $accessToken", "Content-Type" -> "application/json"))
      val first = go()
      if (first.status != 401) first
      else { accessToken = refreshAccessToken(); go() }
    }

    private def getOk(url: String): String = {
      val r = authedGet(url)
      if (r.status != 200)
        throw new AuthException(s"GET $url failed: ${r.status}")
      r.body
    }

    /** Playlist fetch, wrapped in a JSON array like the reference lands it. */
    override def fetchPlaylist(playlistId: String, limit: Int): String =
      s"[${getOk(s"${apiBase}playlists/$playlistId")}]"

    /** Generic entity search (reference raw.py:117-128): GET `search`
      * with `q`/`type`/`limit` query params — a genre filter folds into
      * `q` as `genre:<g>`, exactly the reference's query_string — then
      * unwrap the `{type}s.items` list. Bearer/401 handling rides
      * [[authedGet]] like every other call. */
    override def search(query: String, searchType: String,
        genre: Option[String], limit: Int): String = {
      val q = genre.map(g => s"$query genre:$g").getOrElse(query)
      def enc(s: String) =
        java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
      val body = getOk(
        s"${apiBase}search?q=${enc(q)}&type=${enc(searchType)}&limit=$limit")
      // items-less entity object ({"tracks": {"total": 0}}) is an EMPTY
      // result, matching the reference's .get-with-default read of the
      // same response; only a missing entity object — real shape drift —
      // fails loudly (ADVICE r13 #5: callers porting reference pipelines
      // saw hard failures on items-less 200s)
      jsonItemsArray(body, searchType + "s").getOrElse {
        if (jsonHasKeyObject(body, searchType + "s")) "[]"
        else throw new ApiShapeException(
          s"search: no ${searchType}s object in response")
      }
    }

    /** Follow a paged endpoint's `next` links; returns the raw page bodies
      * as a JSON array (one element per page). */
    def fetchPaged(endpoint: String): String = {
      val pages = scala.collection.mutable.ArrayBuffer.empty[String]
      var url: Option[String] = Some(s"$apiBase$endpoint")
      while (url.isDefined && pages.size < maxPages) {
        val body = getOk(url.get)
        pages += body
        url = jsonString(body, "next").filter(_.nonEmpty)
      }
      pages.mkString("[", ",", "]")
    }
  }
}
