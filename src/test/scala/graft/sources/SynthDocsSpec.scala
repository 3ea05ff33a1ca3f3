package graft.sources

import graft.GraftSession
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthDocsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def synth(rows: Long, parts: Int = 4, seed: Long = 42L) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).option("seed", seed)
      .load()

  test("source registers by short name, honors rows/partitions, is deterministic") {
    val df = synth(1000, parts = 5)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.select("doc_id").distinct().count() == 1000)
    // same seed → identical corpus; different seed → different corpus
    assert(synth(1000).except(synth(1000)).count() == 0)
    assert(synth(1000, seed = 7).except(synth(1000)).count() > 0)
  }

  test("planted near-dups are detectable by the MinHash pipeline") {
    val df = synth(2000)
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text", minSim = 0.5)
      .filter(col("id_b") === col("id_a") + 1) // twin of the previous doc
    val expected = df.filter(col("doc_id") % 10 === 0 && col("doc_id") > 0).count()
    assert(pairs.count() >= (expected * 90) / 100,
      s"found ${pairs.count()} of $expected planted twins")
  }

  test("generation happens on executors, not the driver (no collect path)") {
    // 1M rows in 8 partitions materializes nothing driver-side; an
    // aggregate over it must stream through in bounded memory
    val big = synth(1000000L, parts = 8)
    val n = big.agg(count(lit(1)), sum(col("n_chars"))).head()
    assert(n.getLong(0) == 1000000L)
    assert(n.getLong(1) > 0)
  }
}
