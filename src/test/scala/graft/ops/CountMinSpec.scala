package graft.ops

import graft.GraftSession
import graft.functions.CmsBits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min contracts: the one-sided guarantee (estimate ≥ true count,
  * for EVERY key), bounded overshoot at design sizing, and the
  * distributed sum-merge build agreeing exactly with a driver-side
  * reference build. */
class CountMinSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("estimate >= true count for every key; overshoot bounded") {
    val w = 1 << 12
    val d = 4
    val grid = new Array[Long](w * d)
    // zipf-ish stream: key k occurs ~1000/k times
    val stream = (1 to 200).flatMap(k => Seq.fill(1000 / k)(k.toLong * 7919L))
    stream.foreach(CmsBits.add(grid, _, w, d))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (key, cnt) =>
      val est = CmsBits.estimate(grid, key, w, d)
      assert(est >= cnt, s"CMS under-counted key $key: $est < $cnt")
      // N ≈ 5900, w=4096 → expected collision mass per cell ≈ 1.4
      assert(est <= cnt + 50, s"overshoot too large for $key: $est vs $cnt")
    }
  }

  test("distributed aggregator build equals driver-side reference build") {
    import spark.implicits._
    val keys = (1L to 20000L).map(i => (i % 97L) * 2654435761L)
    val w = 1 << 12
    val distributed = CountMin.build(
      keys.toDF("k").repartition(8), col("k"), w = w)
    val reference = new Array[Long](w * CountMin.DefaultDepth)
    keys.foreach(CmsBits.add(reference, _, w, CountMin.DefaultDepth))
    assert(java.util.Arrays.equals(distributed, reference))
  }

  test("codegen'd estimate expression agrees with driver-side estimate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val occ = CorpusStats.bigramOccurrences(docs, "text")
    val grid = CountMin.buildFromText(occ, col("pair"))
    val sparkEst = occ.distinct()
      .select(col("pair"), CountMin.estimateText(col("pair"), grid).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val fps = occ.distinct().select(col("pair"),
        graft.functions.NativeFunctions.graft_fingerprint(col("pair")).as("fp"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    fps.foreach { case (pair, fp) =>
      assert(sparkEst(pair) ==
        CmsBits.estimate(grid, fp, CountMin.DefaultWidth, CountMin.DefaultDepth))
    }
    // and every estimate covers the exact count (guarantee holds E2E,
    // modulo fingerprint collisions which only push estimates UP)
    val exact = CorpusStats.bigramCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    exact.foreach { case (pair, cnt) =>
      assert(sparkEst(pair) >= cnt, s"under-count for '$pair'")
    }
  }
}
