package graft.ops

import graft.GraftSession
import graft.functions.BloomBits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom prefilter contract: zero false negatives (the hard guarantee the
  * decontamination pipeline leans on), empirically tiny false-positive
  * rate at the design sizing, and the distributed OR-aggregator build
  * agreeing exactly with a driver-side reference build. */
class BloomSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("bit math: no false negatives, FP rate small at design sizing") {
    val m = 1 << 17 // 2^17 bits for 1k keys ≈ 131 bits/key
    val bits = new Array[Long](m >>> 6)
    val keys = (0L until 1000L).map(i => BloomBits.mix(i * 7919L + 13L))
    keys.foreach(BloomBits.set(bits, _, 3))
    assert(keys.forall(BloomBits.mightContain(bits, _, 3)), "false negative!")
    val absent = (0L until 100000L).map(i => BloomBits.mix(i * 104729L + 5L))
      .filterNot(keys.contains)
    val fp = absent.count(BloomBits.mightContain(bits, _, 3))
    // design rate (1-e^(-kn/m))^k ≈ 1.1e-5 here; allow 100x slack
    assert(fp <= absent.size / 1000 + 1, s"FP rate too high: $fp/${absent.size}")
  }

  test("distributed aggregator build equals driver-side reference build") {
    import spark.implicits._
    val keys = (1L to 5000L).map(i => i * 2654435761L)
    val distributed = Bloom.build(
      keys.toDF("k").repartition(8), col("k"), numBits = 1 << 17)
    val reference = new Array[Long]((1 << 17) >>> 6)
    keys.foreach(BloomBits.set(reference, _, Bloom.DefaultK))
    assert(java.util.Arrays.equals(distributed, reference))
  }

  test("empty build side yields an all-clear filter (flags nothing)") {
    import spark.implicits._
    val bits = Bloom.build(Seq.empty[Long].toDF("k"), col("k"), numBits = 1 << 14)
    assert(bits.forall(_ == 0L))
    assert(!BloomBits.mightContain(bits, 42L, Bloom.DefaultK))
  }

  test("codegen'd probe expression agrees with driver-side probe") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val bits = Bloom.buildFromText(evalSet, col("text"))
    // Spark-side probe (whole-stage codegen path)
    val sparkFlagged = docs
      .filter(Bloom.mightContainText(col("text"), bits))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // driver-side probe over the same fingerprints (interpreted path)
    val fps = docs.select(col("doc_id"),
        graft.functions.NativeFunctions.graft_fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val driverFlagged = fps.collect {
      case (id, fp) if BloomBits.mightContain(bits, fp, Bloom.DefaultK) => id
    }.toSet
    assert(sparkFlagged == driverFlagged)
    // and the eval side itself is always flagged (no false negatives E2E)
    val evalIds = evalSet.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.subsetOf(sparkFlagged))
  }
}
