package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the per-group cap and weighted-sampling operators. */
class CurationSamplingSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("capPerGroup: at most k rows per group, and exactly the smallest ids") {
    val k = 2
    val capped = Curation.capPerGroup(docs, "source", "doc_id", k)
    val sizes = capped.groupBy("source").agg(count(lit(1)).as("n"))
    assert(sizes.filter(col("n") > k).count() == 0)
    // survivors per group are exactly the k smallest doc_ids of that group
    val expected = docs.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter(col("rn") <= k).select("source", "doc_id")
    assert(capped.select("source", "doc_id").exceptAll(expected).count() == 0)
    assert(expected.exceptAll(capped.select("source", "doc_id")).count() == 0)
  }

  test("capPerGroup keeps groups smaller than k whole") {
    val capped = Curation.capPerGroup(docs, "source", "doc_id", 1000000)
    assert(capped.count() == docs.count())
  }

  test("capPerGroupBounded == capPerGroup row-for-row (incl. a null group)") {
    // a null-domain group exercises the null-safe join key: the window
    // variant treats null as its own partition, the bounded variant must
    // cap it identically instead of dropping it at the semi join
    val withNull = docs.withColumn("source",
      when(pmod(col("doc_id"), lit(11L)) === 0L, lit(null: String))
        .otherwise(col("source")))
    for (k <- Seq(1, 2, 30)) {
      val win = Curation.capPerGroup(withNull, "source", "doc_id", k)
        .select("source", "doc_id")
      val bnd = Curation.capPerGroupBounded(withNull, "source", "doc_id", k)
        .select("source", "doc_id")
      assert(bnd.exceptAll(win).count() == 0, s"k=$k: bounded \\ window nonempty")
      assert(win.exceptAll(bnd).count() == 0, s"k=$k: window \\ bounded nonempty")
    }
  }

  test("capPerGroupBounded: string ids — hash-ordered keep, window-equal, null ids drop") {
    // real crawls key rows by string doc ids (r13 verdict #3): the
    // bounded cap ranks them on (xxhash64(id), id) — pin row-for-row
    // equality against a window ordered the SAME way, so the contract
    // is exactly "deterministic uniform keep", not lexicographic
    val sdocs = docs.withColumn("sid", concat(lit("doc-"), col("doc_id")))
      .withColumn("sid",
        when(pmod(col("doc_id"), lit(13L)) === 0L, lit(null: String))
          .otherwise(col("sid")))
    for (k <- Seq(1, 3, 25)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(xxhash64(col("sid")), col("sid"))
      val win = sdocs.filter(col("sid").isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("source", "sid")
      val bnd = Curation.capPerGroupBounded(sdocs, "source", "sid", k)
        .select("source", "sid")
      assert(bnd.exceptAll(win).count() == 0, s"k=$k: bounded \\ window nonempty")
      assert(win.exceptAll(bnd).count() == 0, s"k=$k: window \\ bounded nonempty")
      // null ids never survive (documented semantics, no encoder crash)
      assert(bnd.filter(col("sid").isNull).count() == 0)
    }
  }

  test("capPerGroupBounded: null integral order values drop instead of crashing the aggregator") {
    val withNullId = docs.withColumn("oid",
      when(pmod(col("doc_id"), lit(17L)) === 0L, lit(null: java.lang.Long))
        .otherwise(col("doc_id")))
    val bnd = Curation.capPerGroupBounded(withNullId, "source", "oid", 5)
    assert(bnd.filter(col("oid").isNull).count() == 0)
    // and the non-null rows still cap exactly like the window
    val win = Curation.capPerGroup(
      withNullId.filter(col("oid").isNotNull), "source", "oid", 5)
      .select("source", "oid")
    assert(bnd.select("source", "oid").exceptAll(win).count() == 0)
    assert(win.exceptAll(bnd.select("source", "oid")).count() == 0)
  }

  test("capPerGroupBounded: payload columns survive the semi join intact") {
    val bnd = Curation.capPerGroupBounded(docs, "source", "doc_id", 3)
    assert(bnd.columns.toSeq == docs.columns.toSeq)
    // every surviving row is a verbatim input row (semi join, no dupes)
    assert(bnd.exceptAll(docs).count() == 0)
    assert(bnd.groupBy("source").count().filter(col("count") > 3).count() == 0)
  }

  test("curateWeb: boundedDomainCap=true matches the window cap row-for-row") {
    val spark2 = spark
    import spark2.implicits._
    val pages = (1L to 400L).map { i =>
      val dom = if (i % 3 == 0) "big.com" else s"site${i % 7}.org"
      val text = s"the quick brown fox number $i jumps over the lazy dog " +
        "and keeps running through the long meadow for a while longer"
      (i, s"https://www.$dom/a/$i",
        s"<html><body><p>$text</p><p>$text</p></body></html>")
    }.toDF("doc_id", "url", "html")
    def run(bounded: Boolean) = Curation.curateWeb(pages, "doc_id", "url",
      "html", allowedLangs = Seq("en", "und"), minQuality = 10,
      maxPerDomain = 5, boundedDomainCap = bounded)
      .select("doc_id", "canonical_url", "url_domain")
    val win = run(bounded = false)
    val bnd = run(bounded = true)
    assert(win.count() > 0)
    assert(bnd.exceptAll(win).count() == 0 && win.exceptAll(bnd).count() == 0)
    // STRING doc ids (what real crawls carry — r13 verdict #3): the
    // bounded cap must run, respect the cap, and keep only genuine rows
    val spages = pages.withColumn("doc_id", concat(lit("p/"), col("doc_id")))
    val sbnd = Curation.curateWeb(spages, "doc_id", "url", "html",
      allowedLangs = Seq("en", "und"), minQuality = 10,
      maxPerDomain = 5, boundedDomainCap = true)
    assert(sbnd.count() > 0)
    assert(sbnd.groupBy("url_domain").count()
      .filter(col("count") > 5).count() == 0)
    assert(sbnd.select("doc_id")
      .exceptAll(spages.select("doc_id")).count() == 0)
  }

  test("curateMedia: size gate, byte dedup, per-modality perceptual dedup, cross-run seams") {
    val spark2 = spark
    import spark2.implicits._
    def row(id: Long, payload: Array[Byte]) = (id, payload)
    val media = Seq(
      row(1L, Multimodal.synthPngShifted(7L, 0)),    // image original
      row(2L, Multimodal.synthPngShifted(7L, 20)),   // brightness twin: DROP (dhash)
      row(3L, Multimodal.synthPngShifted(7L, 0)),    // byte-identical: DROP (byte stage)
      row(4L, Multimodal.synthWavSigned(9L, 1)),     // audio original
      row(5L, Multimodal.synthWavSigned(9L, -1)),    // polarity twin: DROP (ahash31)
      row(6L, Array.fill[Byte](8)(42)),              // junk original
      row(7L, Array.fill[Byte](8)(42)),              // byte-identical junk: DROP
      row(8L, Array.fill[Byte](3)(42)),              // under minBytes: DROP (gate)
      row(9L, Array.fill[Byte](8)(43)))              // distinct junk: survives
      .toDF("media_id", "payload")
      .withColumn("meta", lit(null).cast(Multimodal.mediaMetaSchema))
    val out = Curation.curateMedia(media, "media_id", minBytes = 5)
    val kept = out.select("media_id", "media_kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(1L -> "image", 4L -> "audio", 6L -> "other",
      9L -> "other"), kept)
    // cross-run seams: a prior run's banded states drop the survivors'
    // drifted re-encounters while genuinely new media pass
    val day1 = media.filter(col("media_id").isin(1L, 4L))
    val imgState = Incremental.imageBandState(day1)
    val audState = Incremental.audioBandState(day1)
    val day2 = Seq(
      row(11L, Multimodal.synthPngShiftedBumped(7L, 20, 30)), // drifted image: DROP
      row(12L, Multimodal.synthWavBumped(9L, 40)),            // drifted audio: DROP
      row(13L, Multimodal.synthPngShifted(200L, 0)),          // new image (8x7 grid base)
      row(14L, Array.fill[Byte](9)(44)))                      // junk passes states
      .toDF("media_id", "payload")
      .withColumn("meta", lit(null).cast(Multimodal.mediaMetaSchema))
    // new-image freshness is constructional luck on tiny grids — verify
    // driver-side and only then assert it survives (the q147 convention)
    val h13 = Multimodal.dHash63(Multimodal.synthPngShifted(200L, 0)).get
    val h1 = Multimodal.dHash63(Multimodal.synthPngShifted(7L, 0)).get
    val fresh13 = java.lang.Long.bitCount(h13 ^ h1) > 3
    val out2 = Curation.curateMedia(day2, "media_id", minBytes = 5,
      seenImageBands = Some(imgState), seenAudioBands = Some(audState))
    val kept2 = out2.select("media_id").as[Long].collect().toSet
    val expected = if (fresh13) Set(13L, 14L) else Set(14L)
    assert(kept2 == expected, s"$kept2 (fresh13=$fresh13)")
    OpCaches.releaseAll()
  }

  test("keepByWeight: weight 0 keeps nothing, 100 keeps everything, deterministic") {
    assert(Sampling.weightedSample(docs, "doc_id", lit(0)).count() == 0)
    assert(Sampling.weightedSample(docs, "doc_id", lit(100)).count() == docs.count())
    val once = Sampling.weightedSample(docs, "doc_id", lit(37))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.weightedSample(docs, "doc_id", lit(37))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again)
    assert(once.nonEmpty && once.size < docs.count())
  }

  test("bigramCounts: total pairs = sum of max(0, n_tokens - 1)") {
    val total = CorpusStats.bigramCounts(docs, "text")
      .agg(sum("cnt")).head().getLong(0)
    val expected = docs.select(
        greatest(size(TextOps.tokens(col("text"))) - 1, lit(0)).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(total == expected)
    // and the top pair is an actual adjacent pair with a sane count
    val top = CorpusStats.bigramCounts(docs, "text")
      .orderBy(desc("cnt")).head()
    assert(top.getString(0).split(" ").length >= 2 && top.getLong(1) >= 1L)
  }

  test("uniformExactK: exact size, stable across reruns and partitionings") {
    val k = 17
    val a = Sampling.uniformExactK(docs, "doc_id", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.uniformExactK(docs.repartition(13), "doc_id", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.size == k && a == b)
    // plans as a bounded top-k, not a global sort
    val plan = Sampling.uniformExactK(docs, "doc_id", k).queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("uniformExactKPerGroup: exactly min(k, group size) per group, partition-stable") {
    import org.apache.spark.sql.functions._
    val k = 4
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.uniformExactKPerGroup(docs, "lang", "doc_id", k)
    val perGroup = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup == sizes.map { case (g, n) => g -> math.min(k.toLong, n) })
    // same rows under a different partitioning (hash order, no RNG)
    val a = sampled.select("lang", "doc_id").collect().map(_.toSeq).toSet
    val b = Sampling.uniformExactKPerGroup(docs.repartition(13), "lang", "doc_id", k)
      .select("lang", "doc_id").collect().map(_.toSeq).toSet
    assert(a == b)
    // bounded-buffer aggregation, not a window sort: no group is ever
    // sorted whole, and nothing funnels through one partition
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    // rk is the ascending sample_key order within each group
    val en = sampled.filter(col("lang") === "en")
      .select("rk", "sample_key").collect().sortBy(_.getInt(0))
    assert(en.map(_.getLong(1)).toSeq == en.map(_.getLong(1)).sorted.toSeq)
  }

  test("unigramLogProb: rare-token docs score lower, token mass conserved") {
    import spark.implicits._
    val corpus = Seq.tabulate(50)(i => (i.toLong, "the quick brown fox")) :+
      ((99L, "zxqv jkwp")) // two hapax tokens — maximally surprising
    val out = CorpusStats.unigramLogProb(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(99L)._1 == 2L)
    // per-token average log-prob of the gibberish doc is far below common
    assert(out(99L)._2 / 2.0 < out(0L)._2 / 4.0)
    assert(out.values.map(_._1).sum == 50L * 4 + 2)
  }

  test("keepByWeight realized rate tracks the weight (Knuth hash uniformity)") {
    val n = docs.count()
    val kept = Sampling.weightedSample(docs, "doc_id", lit(50)).count()
    // 500 draws at p=.5: ±4σ ≈ ±45
    assert(math.abs(kept - n / 2) <= 4 * math.sqrt(n / 4.0) + 4,
      s"kept $kept of $n at weight 50")
  }

  test("ccnetBuckets: per-lang terciles, rank by avg log-prob, truncating division") {
    import spark.implicits._
    // lang A: 9 docs — 3 fluent (common tokens), 3 mixed, 3 gibberish
    // (hapax tokens). lang B: its own vocabulary, 3 docs.
    val rows =
      (0L until 3L).map(i => (i, "the cat sat on the mat", "A")) ++
      (3L until 6L).map(i => (i, s"the cat zz$i on the mat", "A")) ++
      (6L until 9L).map(i => (i, s"qq$i ww$i ee$i rr$i tt$i yy$i", "A")) ++
      (9L until 12L).map(i => (i, s"alpha beta gamma delta num$i", "B"))
    val out = CorpusStats.ccnetBuckets(rows.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    // terciles per lang: 9 A-docs → 3 per band; fluent docs are head,
    // gibberish is tail
    assert((0L until 3L).forall(out(_)._3 == "head"), out)
    assert((3L until 6L).forall(out(_)._3 == "middle"), out)
    assert((6L until 9L).forall(out(_)._3 == "tail"), out)
    // B is banded independently of A's scores
    assert((9L until 12L).map(out(_)._3).toSet == Set("head", "middle", "tail"))
    // truncating-division law on negative sums (Spark div == DuckDB //
    // == JVM Long division): avg is exactly s/n toward zero
    val perDoc = CorpusStats.unigramLogProb(
      rows.filter(_._3 == "A").toDF("doc_id", "text", "lang")
        .filter(col("lang") === "A"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // (language A's unigram model over only-A rows == per-lang model)
    for ((id, (n, s)) <- perDoc) {
      assert(out(id)._2 == s / n, s"doc $id: avg ${out(id)._2} != $s/$n")
      assert(s < 0, "log-probs must be negative for this law to bite")
    }
  }

  test("mixtureBalance: achieved shares track targets, scarce domain kept whole") {
    import spark.implicits._
    // skewed corpus: 30k of A, 10k of B; target an even 50/50 split
    val skewed = ((0L until 30000L).map(i => (i, "A")) ++
      (30000L until 40000L).map(i => (i, "B"))).toDF("doc_id", "dom")
    val sel = Curation.mixtureBalance(skewed, "doc_id", "dom",
      Map("A" -> 5000, "B" -> 5000))
    val byDom = sel.groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // B is the scarce domain (feasible total K = 20000): kept whole
    assert(byDom("B") == 10000L, byDom)
    // A thinned at rate 1/3: Binomial(30000, 1/3), ±5σ ≈ ±408
    assert(math.abs(byDom("A") - 10000L) <= 410, byDom)
  }

  test("mixtureBalance: deterministic, a subset, and validates its inputs") {
    import spark.implicits._
    val df = ((0L until 600L).map(i =>
      (i, if (i % 3 == 0) "x" else "y"))).toDF("doc_id", "dom")
    val t = Map("x" -> 5000, "y" -> 5000)
    def ids() = Curation.mixtureBalance(df, "doc_id", "dom", t)
      .select("doc_id").as[Long].collect().toSet
    val got = ids()
    assert(got == ids(), "same seed must select the same rows")
    assert(got.subsetOf((0L until 600L).toSet))
    val seeded = Curation.mixtureBalance(df, "doc_id", "dom", t, seed = 9)
      .select("doc_id").as[Long].collect().toSet
    assert(seeded != got, "a different seed must draw a different subset")
    intercept[IllegalArgumentException] { // shares must sum to 10000
      Curation.mixtureBalance(df, "doc_id", "dom", Map("x" -> 1, "y" -> 2))
    }
    intercept[IllegalArgumentException] { // domain set must match exactly
      Curation.mixtureBalance(df, "doc_id", "dom",
        Map("x" -> 5000, "z" -> 5000))
    }
  }

  test("epochMix: full-epoch law, maxEpochs cap, partial epoch tracks residual") {
    import spark.implicits._
    // domain A: 1000 docs × 10 tokens = 10k; B: 200 docs × 10 = 2k.
    // Budget 24k at 50/50: B_A = B_B = 12k → A: 1 full epoch + 2k
    // partial (rate .2); B: capped at maxEpochs=4 (12k/2k = 6), no partial
    val df = ((0L until 1000L).map(i => (i, "A")) ++
      (1000L until 1200L).map(i => (i, "B"))).toDF("doc_id", "dom")
      .withColumn("nt", lit(10L))
    val out = Curation.epochMix(df, "doc_id", "dom", col("nt"),
      Map("A" -> 5000, "B" -> 5000), totalBudget = 24000L, maxEpochs = 4)
    val byEpoch = out.groupBy("dom", "epoch").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every B doc appears in epochs 1..4 exactly; no partial 5th
    (1L to 4L).foreach(e => assert(byEpoch(("B", e)) == 200L, byEpoch))
    assert(!byEpoch.contains(("B", 5L)))
    // every A doc appears in epoch 1; partial epoch 2 ≈ 200 docs
    // (Binomial(1000, .2), ±5σ ≈ ±63)
    assert(byEpoch(("A", 1L)) == 1000L)
    assert(math.abs(byEpoch(("A", 2L)) - 200L) <= 65, byEpoch)
    assert(!byEpoch.contains(("A", 3L)))
    // per-(doc, epoch) uniqueness and determinism
    assert(out.count() == out.distinct().count())
    assert(out.collect().toSet == Curation.epochMix(df, "doc_id", "dom",
      col("nt"), Map("A" -> 5000, "B" -> 5000), 24000L, 4).collect().toSet)
  }

  test("mixtureBalance selection is one map-only filter (no exchange)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"d${i % 2}")).toDF("doc_id", "dom")
    val plan = Curation.mixtureBalance(df, "doc_id", "dom",
      Map("d0" -> 5000, "d1" -> 5000)).queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(nodes)
    assert(!nodes(plan).map(_.nodeName).exists(_.contains("Exchange")))
  }

  test("temperatureMixture: flattens the head, keeps the tail, caps at one epoch") {
    val n = docs.count()
    val out = Curation.temperatureMixture(docs, "doc_id", "lang", n / 2)
    val raw = docs.groupBy("lang").agg(count(lit(1)).as("n_raw"))
    val kept = out.groupBy("lang").agg(count(lit(1)).as("n_kept"),
      first("keep_bp").as("bp"))
    val j = raw.join(kept, Seq("lang")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every language present in the output (temperature keeps the tail)
    assert(j.size == docs.select("lang").distinct().count())
    // the head language's kept SHARE is strictly below its raw share
    val (headLang, (headRaw, headKept, _)) = j.maxBy(_._2._1)
    val totKept = j.values.map(_._2).sum
    assert(headKept.toDouble / totKept < headRaw.toDouble / n,
      s"$headLang share not flattened: $headKept/$totKept vs $headRaw/$n")
    // kept counts are binomial around t_d = n_d * bp / 10000: 5σ bound
    j.foreach { case (lang, (nd, nk, bp)) =>
      val t = nd.toDouble * bp / 10000.0
      val sigma = math.sqrt(t * (1 - bp / 10000.0)).max(1.0)
      assert(math.abs(nk - t) <= 5 * sigma, s"$lang kept $nk vs target $t")
    }
    // UniMax cap: a budget exceeding the corpus keeps EVERY row exactly
    // once (bp = 10000 for all domains), never oversamples
    val all = Curation.temperatureMixture(docs, "doc_id", "lang", n * 10)
    assert(all.count() == n)
    assert(all.select("keep_bp").distinct().head().getLong(0) == 10000L)
    // deterministic + subset + collision guard
    val again = Curation.temperatureMixture(docs, "doc_id", "lang", n / 2)
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    intercept[IllegalArgumentException] {
      Curation.temperatureMixture(out, "doc_id", "lang", 10L)
    }
  }
}
