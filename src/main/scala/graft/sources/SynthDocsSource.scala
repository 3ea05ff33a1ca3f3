package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2: a deterministic synthetic document corpus
  * (`spark.read.format("graft-synth")`), the in-engine sourcing option
  * from SURVEY §2.1-S1 and a scale-testing tool — the source generates
  * any number of rows partition-parallel with NO driver materialization,
  * so dedup/similarity operators can be driven at arbitrary scale.
  *
  * Options:
  *  - `rows` (default 1000): total documents
  *  - `partitions` (default 8): input partitions (each generates its range)
  *  - `seed` (default 42): corpus seed — same seed ⇒ identical corpus
  *  - `dupFraction` (default 0.1): fraction of docs that are near-dups of
  *    an earlier doc (one token appended) — ground truth for dedup ops,
  *    detectable as id pairs (i, i - i % 10) when i % 10 == 0-ish
  */
class SynthDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(properties)
}

object SynthDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val vocab: Array[String] = Array(
    "spark", "query", "table", "scan", "join", "merge", "sort", "hash",
    "batch", "stream", "row", "data", "key", "value", "filter", "group",
    "window", "order", "fast", "slow", "big", "small", "the", "line", "part")
  private val langs = Array("en", "de", "fr", "es", "zh")

  /** splitmix64 — deterministic per-doc rng stream. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic text for a doc id (duplicates handled by the reader). */
  private[sources] def baseText(seed: Long, id: Long): String = {
    val n = 20 + (mix(seed ^ id) & 0x7fffffff) % 180
    val sb = new StringBuilder
    var i = 0L
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(((mix(seed ^ id ^ (i * 0x5851F42D4C957F2DL)) & 0x7fffffff) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  private[sources] def row(seed: Long, dupEvery: Long, id: Long): InternalRow = {
    // every dupEvery-th doc is a near-dup of the previous doc
    val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
    val text = if (isDup) baseText(seed, id - 1) + " twin" else baseText(seed, id)
    val lang = langs(((mix(seed ^ (id * 31)) & 0x7fffffff) % langs.length).toInt)
    new GenericInternalRow(Array[Any](
      id,
      UTF8String.fromString(text),
      UTF8String.fromString(lang),
      UTF8String.fromString("src" + (id % 20)),
      text.length.toLong))
  }
}

private class SynthTable(props: util.Map[String, String]) extends Table with SupportsRead {
  private def opt(k: String, d: Long): Long =
    Option(props.get(k)).map(_.toLong).getOrElse(d)

  override def name(): String = "graft_synth_docs"
  override def schema(): StructType = SynthDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private val rows = opt("rows", 1000L)
      private val parts = opt("partitions", 8L).toInt
      private val seed = opt("seed", 42L)
      private val dupFraction = Option(props.get("dupfraction"))
        .map(_.toDouble).getOrElse(0.1)
      private val dupEvery = if (dupFraction <= 0) 0L else math.round(1.0 / dupFraction)

      override def build(): Scan = this
      override def readSchema(): StructType = SynthDocsSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + parts - 1) / parts)
        (0 until parts).map { p =>
          SynthRange(p * per, math.min(rows, (p + 1) * per), seed, dupEvery)
        }.filter(r => r.start < r.end).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val r = partition.asInstanceOf[SynthRange]
          new PartitionReader[InternalRow] {
            private var id = r.start - 1
            override def next(): Boolean = { id += 1; id < r.end }
            override def get(): InternalRow =
              SynthDocsSource.row(r.seed, r.dupEvery, id)
            override def close(): Unit = ()
          }
        }
    }
}

private case class SynthRange(start: Long, end: Long, seed: Long, dupEvery: Long)
  extends InputPartition
