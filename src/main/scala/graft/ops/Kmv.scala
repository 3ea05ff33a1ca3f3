package graft.ops

import graft.functions.{KmvBits, NativeFunctions}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-Minimum-Values (theta) sketch — the SET-OPERATION member of the
  * mergeable sketch family ([[Bloom]] membership, [[CountMin]] frequency,
  * [[Hll]] distinct, [[DdSketch]] quantiles). A shard-audit question the
  * others can't answer: "how many distinct urls do shard A and shard B
  * SHARE?" — HLL intersects only by inclusion–exclusion (error ∝ union
  * size), while two KMV sketches answer union, intersection, and Jaccard
  * directly ([[unionEst]] / [[interEst]]). See [[KmvBits]] for the math
  * and the canonical byte layout.
  *
  * Same scale contract as the HLL build:
  *  - [[sketch]] is a typed [[Aggregator]] with map-side partials —
  *    shuffle is one ≤(9 + 8k)-byte row per group per mapper, never keys;
  *  - sketch(A ∪ B) is BIT-IDENTICAL to merge(sketch(A), sketch(B))
  *    regardless of partitioning — unconditionally (no collapse cap), so
  *    per-shard sketches stored next to the data roll up exactly
  *    (KmvSpec pins this);
  *  - a sketch that never filled holds its whole hashed key set, so
  *    small-set estimates (and set ops between two unfilled sketches)
  *    are EXACT, not approximate.
  *
  * Default k = 1024: 8 KiB per group, rse ≈ 1/√(k−2) ≈ 3.1%.
  */
object Kmv {

  /** Default retained values: 8 KiB per sketch, rse ≈ 3.1%. */
  val DefaultK: Int = 1024

  private def checkK(k: Int): Unit =
    require(k >= 16 && k <= (1 << 20), s"KMV k must be in [16, 2^20], got $k")

  /** Grouped sketch build over long keys. NULL keys skip the fold —
    * COUNT(DISTINCT) semantics (the [[Hll.HllAggregator]] contract). */
  private[graft] class KmvAggregator(k: Int)
      extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = KmvBits.empty(k)
    override def reduce(buf: Array[Byte], key: java.lang.Long): Array[Byte] = {
      if (key != null) KmvBits.add(buf, key.longValue()) else buf
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      KmvBits.merged(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = KmvBits.compact(buf)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Sketch-of-sketches roll-up (per-shard → global). Null or zero-length
    * inputs (empty shards) merge as identity. */
  private[graft] class KmvMergeAggregator(k: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = KmvBits.empty(k)
    override def reduce(buf: Array[Byte], sk: Array[Byte]): Array[Byte] =
      if (sk == null || sk.isEmpty) buf else KmvBits.merged(buf, sk)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      KmvBits.merged(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = KmvBits.compact(buf)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate column building a sketch from a long key column —
    * `df.groupBy(...).agg(Kmv.sketch(col("k")))`. */
  def sketch(keyCol: Column, k: Int = DefaultK): Column = {
    checkK(k)
    udaf(new KmvAggregator(k), Encoders.LONG).apply(keyCol.cast("long"))
  }

  /** Aggregate column merging sketch columns (the per-shard roll-up). */
  def merge(sketchCol: Column, k: Int = DefaultK): Column = {
    checkK(k)
    udaf(new KmvMergeAggregator(k), Encoders.BINARY).apply(sketchCol)
  }

  /** Distinct-count estimate (codegen'd `graft_kmv_est`). */
  def estimate(sketchCol: Column): Column =
    NativeFunctions.graft_kmv_est(sketchCol)

  /** |A ∪ B| estimate from two sketch columns (codegen'd). */
  def unionEst(a: Column, b: Column): Column =
    NativeFunctions.graft_kmv_union(a, b)

  /** |A ∩ B| estimate from two sketch columns (codegen'd). */
  def interEst(a: Column, b: Column): Column =
    NativeFunctions.graft_kmv_inter(a, b)

  /** Sketch a TEXT column via the engine-independent rolling-hash
    * fingerprint (the [[Hll.sketchText]] twin). */
  def sketchText(textCol: Column, k: Int = DefaultK): Column =
    sketch(NativeFunctions.graft_fingerprint(textCol), k)
}
