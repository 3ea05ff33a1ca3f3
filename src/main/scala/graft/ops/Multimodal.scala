package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media is carried as opaque `binary` columns plus a typed
  * metadata struct; decode/feature-extract runs per-partition.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] produces deterministic fake features from the
  * bytes. Everything around it — schema, batch shape, partition-parallel
  * execution, feature schema — is real and is exactly what a production
  * decode (JNI/FFI or Pandas-UDF-style vectorized batch) would plug into.
  *
  * Scale notes: decode is the classic CPU-heavy map stage — no shuffle,
  * scales with cores. Partition sizing should target the media payload
  * (`spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits in memory), and the binary column should be pruned out of
  * any plan that only needs metadata (columnar parquet does this for free).
  */
object Multimodal {

  /** Metadata schema carried alongside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
  ))

  /** Feature schema produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("features", ArrayType(FloatType)),
  ))

  /** Wrap any DataFrame with an id + string payload column into the
    * canonical media-table shape (binary payload + metadata struct). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String = "image", format: String = "raw"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** Pure-expression metadata pass (no decode): byte count + checksum.
    * Stays in whole-stage codegen. */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"),
      col("meta.media_type").as("media_type"))

  /** Vectorized decode contract — the seam a production codec drops into.
    * One call per BATCH of payloads, columnar in / columnar out (the same
    * shape an Arrow record batch or a vectorized Pandas-style UDF hands a
    * native library): a JNI/FFI decoder amortizes its per-call overhead
    * over the batch and can hand the whole array to SIMD/accelerator code.
    * Implementations must be deterministic per payload and return exactly
    * one `dim`-length vector per input, in order. */
  trait BatchCodec extends Serializable {
    def decodeBatch(payloads: Array[Array[Byte]], dim: Int): Array[Array[Float]]
  }

  /** The deterministic stand-in codec (no media libraries in this
    * container): per-payload byte-value histogram, L1-normalized. */
  object StubCodec extends BatchCodec {
    override def decodeBatch(payloads: Array[Array[Byte]], dim: Int): Array[Array[Float]] =
      payloads.map(b => decodeStub(b, dim).toArray)
  }

  /** The decode/feature-extract stage: partition-parallel over blobs,
    * iterated in `batchSize` groups so the codec sees columnar batches
    * ([[BatchCodec]]) rather than single rows. The default codec is the
    * documented deterministic stub — a real decoder is a one-object
    * drop-in; everything else (schema, batching, checksum, partition
    * parallelism) is engine-side and tested. */
  def decodeFeatures(media: DataFrame, featureDim: Int = 16,
      codec: BatchCodec = StubCodec, batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1)
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val payloads = batch.map(_.getAs[Array[Byte]](1)).toArray
          val feats = codec.decodeBatch(payloads, featureDim)
          require(feats.length == payloads.length,
            s"codec returned ${feats.length} vectors for ${payloads.length} payloads")
          batch.indices.iterator.map { i =>
            val bytes = payloads(i)
            Row(batch(i).getLong(0), bytes.length.toLong, checksumHex(bytes),
              feats(i).toSeq)
          }
        }
      }(enc)
  }

  /** Resize stage: per-row map producing a fixed-size payload + updated
    * metadata (width/height filled in). The pixel resample is STUBBED
    * (truncate/cycle-pad the bytes to `w*h`) — a real codec plugs into
    * [[resizeStub]]; the Spark-side shape (binary → binary map, metadata
    * struct rewrite, codegen-friendly surroundings) is the real contract. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", org.apache.spark.sql.types.BinaryType),
      StructField("meta", mediaMetaSchema))))
    media.select(col("media_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          Row(r.getLong(0), resizeStub(bytes, w * h),
            Row(meta.get(0), meta.get(1), w, h, meta.get(4)))
        }
      }(enc)
  }

  /** Frame sampling for video-typed payloads: split the payload into
    * fixed-size frames and keep every `stride`-th one, exploded to one row
    * per sampled frame. Pure Column expressions (slice arithmetic over the
    * binary), so the whole stage stays in codegen and the frame COUNTS are
    * reproducible in any engine — only the codec that would decode each
    * frame is a stub elsewhere. */
  def frameSample(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    require(frameBytes >= 1 && stride >= 1)
    val len = octet_length(col("payload")).cast("long")
    val nFrames = ceil(len.cast("double") / frameBytes).cast("long")
    media.select(col("media_id"), col("payload"), len.as("n_bytes"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0) // empty payload → no frames (and no empty sequence())
      .select(col("media_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        least(lit(frameBytes.toLong),
          col("n_bytes") - col("frame_idx") * frameBytes).as("frame_bytes"))
  }

  /** Deterministic fake resample: truncate or cycle-pad to `size` bytes. */
  private[ops] def resizeStub(bytes: Array[Byte], size: Int): Array[Byte] = {
    val out = new Array[Byte](size)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < size) { out(i) = bytes(i % bytes.length); i += 1 }
    }
    out
  }

  /** Deterministic fake decode: byte-value histogram over `dim` buckets,
    * L1-normalized. A real implementation would decode pixels/samples here. */
  private[ops] def decodeStub(bytes: Array[Byte], dim: Int): Seq[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % dim) += 1f
      i += 1
    }
    val total = math.max(1f, bytes.length.toFloat)
    hist.map(_ / total).toSeq
  }

  private def checksumHex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }
}
