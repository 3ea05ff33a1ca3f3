package graft.etl

import java.nio.file.{Files, Paths}

/** Raw-zone ingestion (reference S1/K1: ingestion/ingestion/raw/raw.py —
  * Spotify REST client landing playlist JSON files).
  *
  * The HTTP fetch is driver-side and out of the engine's dataflow (the
  * reference's too: requests → json.dump). The engine-facing contract is
  * just "JSON documents appear in the raw zone"; [[SpotifyClient]]
  * abstracts the fetch so tests (and this zero-egress environment) plug a
  * deterministic fake while production wires an HTTP implementation with
  * bearer auth + 401-refresh-retry (reference raw.py:68-99).
  */
object Ingest {

  /** The fetch abstraction: playlist id → raw JSON document (the API
    * response wrapped in a JSON array, like reference raw.py:125-126),
    * plus the generic entity search (reference raw.py:101-134): `q`/
    * `type` search with an optional `genre:` filter, returning the
    * UNWRAPPED `{type}s.items` list as a JSON array — exactly what the
    * reference hands its parser. */
  trait SpotifyClient {
    def fetchPlaylist(playlistId: String, limit: Int = 50): String
    def search(query: String, searchType: String,
      genre: Option[String] = None, limit: Int = 20): String
  }

  /** Deterministic fake for tests / offline runs. */
  final class FakeSpotifyClient extends SpotifyClient {
    /** Fake search items keyed by (query, type, genre): type-shaped
      * objects with the genre echoed where present, so specs can assert
      * the filter reached the result construction. */
    override def search(query: String, searchType: String,
        genre: Option[String], limit: Int): String = {
      val g = genre.map(v => s""", "genres": ["$v"]""").getOrElse("")
      (1 to math.min(limit, 3)).map { i =>
        s"""{"id": "${query.replace(' ', '_')}_${searchType}_$i",
           | "name": "${searchType.capitalize} $i"$g}""".stripMargin
      }.mkString("[", ",", "]")
    }

    override def fetchPlaylist(playlistId: String, limit: Int): String = {
      val items = (1 to math.min(limit, 3)).map { i =>
        s"""{"track": {"id": "${playlistId}_t$i", "name": "Track $i",
           | "duration_ms": ${100000 + i}, "popularity": $i,
           | "explicit": false, "track_number": $i,
           | "album": {"id": "${playlistId}_al$i", "name": "Album $i",
           |   "release_date": "2024-01-0$i", "release_date_precision": "day",
           |   "total_tracks": 1},
           | "artists": [{"id": "${playlistId}_ar$i", "name": "Artist $i"}]}}""".stripMargin
      }.mkString(",")
      s"""[{"id": "$playlistId", "name": "Playlist $playlistId",
         | "description": "fake", "public": true,
         | "owner": {"id": "owner"}, "followers": {"total": 1},
         | "tracks": {"total": ${math.min(limit, 3)}, "items": [$items]}}]""".stripMargin
    }
  }

  /** Filename sanitation, reference raw.py:285-286 (F6). */
  def sanitize(playlistId: String): String =
    playlistId.replace("?", "_").replace(":", "_")

  /** Fetch each playlist and land it in the raw zone with the reference's
    * naming scheme (playlist_{id}_{limit}.json). Returns written paths. */
  def landPlaylists(client: SpotifyClient, playlistIds: Seq[String],
      rawZone: String, limit: Int = 50): Seq[String] = {
    Files.createDirectories(Paths.get(rawZone))
    playlistIds.map { id =>
      val path = Paths.get(rawZone, s"playlist_${sanitize(id)}_$limit.json")
      Files.writeString(path, client.fetchPlaylist(id, limit))
      path.toString
    }
  }

  /** Run an entity search and land the items in the raw zone with the
    * reference's search-shaped filename
    * (`{query with _}_{type}_{genre}_{limit}.json`, raw.py:286 — the
    * reference interpolates Python `None` into the name when no genre is
    * given; `"None"` is kept verbatim so day-2 re-runs land on the same
    * files an existing deployment already has). Returns the written path. */
  def landSearch(client: SpotifyClient, query: String, searchType: String,
      rawZone: String, genre: Option[String] = None,
      limit: Int = 20): String = {
    Files.createDirectories(Paths.get(rawZone))
    // stricter than the reference's replace(' ', '_'): a '/' in the
    // query ("AC/DC") would resolve as a path separator — crash at best,
    // escape the raw zone at worst ("../"). Every non-filename-safe
    // char folds to '_'; space-only queries land on the same name the
    // reference produces. Folding is LOSSY beyond spaces ('AC/DC',
    // 'AC DC' and 'AC_DC' all sanitize to 'AC_DC'), and colliding names
    // would silently overwrite an earlier query's landed items — so when
    // sanitization changed anything a space-replace would not, an 8-hex
    // digest of the RAW string disambiguates the name (deterministic:
    // day-2 re-runs of the same query still land on the same file, the
    // reference's re-run contract).
    def safe(s: String) = {
      val folded = s.replaceAll("[^A-Za-z0-9._-]", "_")
      if (folded == s.replace(' ', '_')) folded
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        folded + "-" + md.take(4).map("%02x".format(_)).mkString
      }
    }
    val name = s"${safe(query)}_${safe(searchType)}_" +
      s"${safe(genre.getOrElse("None"))}_$limit.json"
    val path = Paths.get(rawZone, name)
    Files.writeString(path, client.search(query, searchType, genre, limit))
    path.toString
  }
}
