package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed gold-layer API: case classes mirroring the reference's declared
  * (but never wired) pydantic models (reference models/model.py:4-29),
  * bound to the gold DataFrames with compile-time field checks.
  *
  * The untyped DataFrame surface stays primary (bronze/silver are
  * schema-dynamic by design); these encoders are the contract a library
  * consumer programs against.
  */
object Models {

  case class Playlist(
      playlist_id: String, playlist_name: String, playlist_description: String,
      playlist_owner_id: String, playlist_followers: Option[Int],
      playlist_public: Option[Boolean])

  case class DimAlbum(
      album_id: String, album_name: String,
      album_release_date: Option[java.sql.Date], album_total_tracks: Option[Int])

  case class DimArtist(artist_id: String, artist_name: String)

  case class FactPlaylistTrack(
      playlist_id: String, track_id: String, track_name: String,
      track_number: Option[Int], track_duration_ms: Option[Int],
      track_popularity: Option[Int], track_explicit: Option[Boolean],
      album_release_date: Option[java.sql.Date],
      album_name: String, album_id: String,
      artist_name: String, artist_id: String)

  implicit val playlistEnc: Encoder[Playlist] = Encoders.product[Playlist]
  implicit val dimAlbumEnc: Encoder[DimAlbum] = Encoders.product[DimAlbum]
  implicit val dimArtistEnc: Encoder[DimArtist] = Encoders.product[DimArtist]
  implicit val factEnc: Encoder[FactPlaylistTrack] = Encoders.product[FactPlaylistTrack]

  /** Typed views over the gold frames from [[Gold.build]]. */
  def typedGold(gold: Map[String, DataFrame]): (
      Dataset[Playlist], Dataset[DimAlbum], Dataset[DimArtist], Dataset[FactPlaylistTrack]) = (
    gold("dim_playlists").as[Playlist],
    gold("dim_albums").as[DimAlbum],
    gold("dim_artists").as[DimArtist],
    gold("fact_playlist_tracks").as[FactPlaylistTrack])
}
