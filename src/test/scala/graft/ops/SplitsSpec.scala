package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    graft.functions.NativeFunctions.register(s)
    s
  }
  val docs = "/root/testdata/sf0.001/documents.parquet"
  val splits3 = Seq("train" -> 8000, "val" -> 1000, "test" -> -1)

  test("stratifiedExactSplit: EXACT floor counts per stratum, total preserved") {
    val df = spark.read.parquet(docs)
    val out = Splits.stratifiedExactSplit(df, "doc_id", "lang", splits3, seed = 7)
    val counts = out.groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ns = df.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ns.foreach { case (lang, n) =>
      assert(counts.getOrElse((lang, "train"), 0L) == n * 8000 / 10000, s"$lang train")
      assert(counts.getOrElse((lang, "val"), 0L) == n * 1000 / 10000, s"$lang val")
      assert(counts.getOrElse((lang, "test"), 0L) ==
        n - n * 8000 / 10000 - n * 1000 / 10000, s"$lang test")
    }
    assert(out.count() == df.count())
  }

  test("stratifiedExactSplit: deterministic per seed; seeds genuinely reshuffle") {
    val df = spark.read.parquet(docs)
    def ids(seed: Int) = Splits.stratifiedExactSplit(df, "doc_id", "lang", splits3, seed)
      .filter(col("split") === "val").select("doc_id")
    assert(ids(7).except(ids(7)).count() == 0)
    assert(ids(7).count() == ids(8).count()) // exact counts are seed-free
    assert(ids(7).except(ids(8)).count() > 0) // membership is not
  }

  test("hashSplit: membership is per-id stable — adding documents never reassigns") {
    val df = spark.read.parquet(docs)
    val half = df.filter(pmod(col("doc_id"), lit(2)) === 0)
    val full = Splits.hashSplit(df, "doc_id", splits3, seed = 3)
      .select(col("doc_id"), col("split"))
    val sub = Splits.hashSplit(half, "doc_id", splits3, seed = 3)
      .select(col("doc_id"), col("split").as("sub_split"))
    // the subset's assignment agrees with the full corpus row-for-row
    assert(full.join(sub, Seq("doc_id"))
      .filter(col("split") =!= col("sub_split")).count() == 0)
  }

  test("hashSplit: proportions near targets, bands exhaustive") {
    val out = Splits.hashSplit(spark.read.parquet(docs), "doc_id", splits3, seed = 3)
    val n = out.count()
    val train = out.filter(col("split") === "train").count()
    // binomial tolerance at n≈500: ±6 percentage points
    assert(math.abs(train.toDouble / n - 0.8) < 0.06)
    assert(out.filter(!col("split").isInCollection(Seq("train", "val", "test")))
      .count() == 0)
  }

  test("composed seeded selections are independent (the 5M-drill regression)") {
    // The round-10 recipe drill found the affine seeded hash made a
    // seed-0 threshold selection followed by a seed-7 band carve
    // INTERVALS (90/10 split measured 98.9/1.1 over mixture survivors).
    // Pin the composition at a size where binomial noise is small:
    // survivors of a 50% seed-0 selection must split ~90/10 at seed 7.
    val ids = spark.range(200000).toDF("doc_id")
    val surv = ids.filter(
      Sampling.seededKnuth(col("doc_id"), 0) * lit(10000L) <
        lit(5000L) * lit(2147483648L))
    val split = Splits.hashSplit(surv, "doc_id",
      Seq("train" -> 9000, "holdout" -> -1), seed = 7)
    val n = split.count().toDouble
    val tr = split.filter(col("split") === "train").count()
    assert(n > 90000, s"seed-0 selection out of band: $n")
    assert(math.abs(tr / n - 0.9) < 0.01,
      f"composed selections correlated: train ${tr / n}%.4f (want ~0.90)")
    // and the same for two nonzero seeds
    val surv2 = ids.filter(
      Sampling.seededKnuth(col("doc_id"), 3) * lit(10000L) <
        lit(5000L) * lit(2147483648L))
    val split2 = Splits.hashSplit(surv2, "doc_id",
      Seq("train" -> 9000, "holdout" -> -1), seed = 7)
    val n2 = split2.count().toDouble
    val tr2 = split2.filter(col("split") === "train").count()
    assert(math.abs(tr2 / n2 - 0.9) < 0.01,
      f"seed-3→seed-7 correlated: ${tr2 / n2}%.4f")
  }

  test("curriculumShards equals a reference NTILE window on the same order") {
    val df = spark.read.parquet(docs)
    val got = Splits.curriculumShards(df, "doc_id", "n_chars", nShards = 7)
      .select(col("doc_id"), col("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars"), col("doc_id"))
    val ref = df.select(col("doc_id"), ntile(7).over(w).cast("long").as("shard_ref"))
    assert(got.join(ref, Seq("doc_id"))
      .filter(col("shard") =!= col("shard_ref")).count() == 0)
  }

  test("curriculumShards: more shards than rows degrades to rank, like NTILE") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (2L, 5L), (3L, 10L)).toDF("doc_id", "n_chars")
    val got = Splits.curriculumShards(tiny, "doc_id", "n_chars", nShards = 7)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // order: (5,2) < (10,1) < (10,3) → shards 1, 2, 3
    assert(got == Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("balancedShards: near-equal weight sums, snake matches a reference") {
    import spark.implicits._
    val df = spark.read.parquet(docs)
    val out = Splits.balancedShards(df, "doc_id", "n_chars", nShards = 8)
    val sums = out.groupBy("shard").agg(sum("n_chars").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums.keySet == (1L to 8L).toSet)
    val maxW = df.agg(max("n_chars")).head().getLong(0)
    // snake over the descending order: spread stays within one max row
    assert(sums.values.max - sums.values.min <= maxW,
      s"imbalance ${sums.values.max - sums.values.min} > $maxW")
    // small-data reference: driver-side snake over the same total order
    val tiny = Seq((1L, 50L), (2L, 40L), (3L, 40L), (4L, 10L), (5L, 9L),
      (6L, 8L), (7L, 1L)).toDF("doc_id", "n_chars")
    val got = Splits.balancedShards(tiny, "doc_id", "n_chars", nShards = 3)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // desc order: 1,2,3,4,5,6,7 → ranks 0..6 → snake: 1,2,3 | 3,2,1 | 1
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 3L, 5L -> 2L, 6L -> 1L, 7L -> 1L), got)
  }

  test("spec validation: malformed split lists are rejected") {
    val df = spark.read.parquet(docs)
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "doc_id", Seq("a" -> 9000, "b" -> 2000, "c" -> -1))
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "doc_id", Seq("a" -> 5000, "b" -> 5000))
    }
    intercept[IllegalArgumentException] {
      Splits.curriculumShards(df, "doc_id", "n_chars", nShards = 7, maxDistinct = 2)
    }
    // fractional rank signals must fail loudly, not silently collapse:
    // the histogram keys on cast-to-long while the window partitions on
    // the raw value — 0.3 and 0.7 would both map to key 0
    import spark.implicits._
    val frac = Seq((1L, 0.3), (2L, 0.7)).toDF("doc_id", "score")
    val e = intercept[IllegalArgumentException] {
      Splits.curriculumShards(frac, "doc_id", "score", nShards = 2)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    intercept[IllegalArgumentException] {
      Splits.balancedShards(frac, "doc_id", "score", nShards = 2)
    }
  }

  test("output-column collisions fail loudly instead of overwriting") {
    import spark.implicits._
    // withColumn silently replaces same-named input columns — an input
    // that already carries `split`/`shard` would be corrupted silently
    val hasSplit = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "split")
    val e1 = intercept[IllegalArgumentException] {
      Splits.hashSplit(hasSplit, "doc_id", Seq("train" -> 9000, "rest" -> -1))
    }
    assert(e1.getMessage.contains("split"), e1.getMessage)
    intercept[IllegalArgumentException] {
      Splits.stratifiedExactSplit(hasSplit, "doc_id", "split",
        Seq("train" -> 9000, "rest" -> -1))
    }
    val hasShard = Seq((1L, 5L, 0L)).toDF("doc_id", "n_chars", "shard")
    intercept[IllegalArgumentException] {
      Splits.curriculumShards(hasShard, "doc_id", "n_chars", nShards = 2)
    }
    intercept[IllegalArgumentException] {
      Splits.balancedShards(hasShard, "doc_id", "n_chars", nShards = 2)
    }
    intercept[IllegalArgumentException] {
      Sampling.deterministicShard(hasShard, "doc_id", nShards = 2)
    }
    val hasAge = Seq((1L, 10L, 3L)).toDF("event_id", "ts_ns", "age_days")
    intercept[IllegalArgumentException] {
      Sampling.applyTimeDecay(hasAge, "event_id", "ts_ns", refDay = 1L)
    }
    val hasKey = Seq((1L, 2L)).toDF("doc_id", "sample_key")
    intercept[IllegalArgumentException] {
      Sampling.uniformExactK(hasKey, "doc_id", k = 1)
    }
  }
}
