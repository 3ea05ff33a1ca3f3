package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the playlist ETL (never schema-inference in
  * production paths — SURVEY.md §1.2).
  *
  * The raw schema mirrors the reference's ingested playlist document
  * (reference: ingestion/ingestion/raw/raw.py:125-126 wraps the playlist
  * response in a list; field inventory per FIXTURES.md §1). Only fields the
  * pipeline reads are declared — extra JSON fields are simply ignored by
  * the reader, which is the schema-on-read behavior the reference gets
  * from dict.get().
  */
object Schemas {

  val artistSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
  ))

  val albumSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("release_date", StringType),
    StructField("release_date_precision", StringType),
    StructField("total_tracks", LongType),
  ))

  val trackSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("duration_ms", LongType),
    StructField("popularity", LongType),
    StructField("explicit", BooleanType),
    StructField("track_number", LongType),
    StructField("album", albumSchema),
    StructField("artists", ArrayType(artistSchema)),
  ))

  val trackItemSchema: StructType = StructType(Seq(
    StructField("added_at", StringType),
    StructField("is_local", BooleanType),
    StructField("track", trackSchema),
  ))

  /** One playlist document (the element type of the raw JSON array). */
  val rawPlaylistSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("public", BooleanType),
    StructField("collaborative", BooleanType),
    StructField("snapshot_id", StringType),
    StructField("owner", StructType(Seq(StructField("id", StringType)))),
    StructField("followers", StructType(Seq(StructField("total", LongType)))),
    StructField("tracks", StructType(Seq(
      StructField("items", ArrayType(trackItemSchema)),
      StructField("total", LongType),
    ))),
  ))

  /** Bronze column lists — all `string` (reference bronze.py:202 types every
    * inferred column TEXT; booleans serialize lowercase 'true'/'false'). */
  val bronzePlaylistCols: Seq[String] =
    Seq("id", "name", "description", "owner_id", "followers", "public")
  val bronzeTrackCols: Seq[String] =
    Seq("track_id", "name", "playlist_id", "album_id", "duration_ms",
      "popularity", "explicit", "track_number", "album_release_date", "artist_id")
  val bronzeAlbumCols: Seq[String] =
    Seq("album_id", "name", "release_date", "total_tracks", "track_id")
  val bronzeArtistCols: Seq[String] =
    Seq("artist_id", "name", "track_id")
}
