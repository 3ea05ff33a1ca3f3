package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    graft.functions.NativeFunctions.register(s)
    s
  }
  val embPath = "/root/testdata/sf0.001/embeddings.parquet"

  def model(emb: org.apache.spark.sql.DataFrame) =
    Ivf.trainCached(s"$embPath#semspec", emb, "embedding", k = 8)

  test("identical planted twins collapse; the original (min id) survives") {
    val emb = spark.read.parquet(embPath)
    val twins = emb.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val survivors = SemDedup.semanticDedupIvf(
      emb.unionByName(twins), "vec_id", "embedding", model(emb), eps = 0.999999)
    val surv = survivors.select("vec_id")
    val origSurv = surv.filter(col("vec_id") < 1000000L)
    val twinSurv = surv.filter(col("vec_id") >= 1000000L)
      .select((col("vec_id") - 1000000L).as("vec_id"))
    // every pair lost exactly its twin: no (orig, twin) both-survive, and
    // no twin outlived its original (equal cdist ⇒ min id wins)
    assert(origSurv.join(twinSurv, Seq("vec_id"), "left_semi").count() == 0)
    assert(twinSurv.join(origSurv, Seq("vec_id"), "left_anti").count() == 0)
    assert(survivors.count() == emb.count())
    OpCaches.releaseAll()
  }

  test("group-local CC equals the distributed star CC on confined graphs") {
    import spark.implicits._
    // deterministic pseudo-random edges, each confined to one of 7 groups
    // (the IVF-cell shape); includes chains, a clique, dup + self edges
    val edges = (0 until 400).map { i =>
      val g = i % 7
      val a = (i * 2654435761L) % 50
      val b = (i * 40503L + 7) % 50
      (g.toLong, g * 1000L + a, g * 1000L + b)
    } ++ Seq((0L, 1L, 1L)) // self-edge: must not add a node
    val pairs = edges.toDF("cell", "id_a", "id_b")
    val got = Dedup.connectedComponentsWithinGroups(pairs, "cell")
    val ref = Dedup.connectedComponentsStar(pairs.select("id_a", "id_b"))
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0)
    OpCaches.releaseAll()
  }

  test("group-local CC: oversized group fails loudly, never OOMs silently") {
    import spark.implicits._
    val pairs = (1L to 20L).map(i => (0L, i, i + 1)).toDF("cell", "id_a", "id_b")
    val e = intercept[org.apache.spark.SparkException] {
      Dedup.connectedComponentsWithinGroups(pairs, "cell",
        maxEdgesPerGroup = 5).count()
    }
    assert(e.getMessage != null)
  }

  test("representative is the centroid-NEAREST member, not min id") {
    import spark.implicits._
    // a 2-vector cluster: v2 sits closer to the lone centroid than v1,
    // cosine(v1, v2) ≈ 1 → dup group; the min-ID rule would keep id 1,
    // the SemDeDup rule must keep id 2
    val m = Ivf.IvfModel(Array(Array(1.0, 0.0, 0.0, 0.0)))
    val rows = Seq(
      (1L, Seq(10.0f, 0f, 0f, 0f)), // far from centroid
      (2L, Seq(1.2f, 0f, 0f, 0f)), // near centroid, same direction
      (3L, Seq(0f, 5.0f, 0f, 0f)) // orthogonal — no dup
    ).toDF("vec_id", "embedding")
    val surv = SemDedup.semanticDedupIvf(rows, "vec_id", "embedding", m,
      eps = 0.99).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(2L, 3L))
    OpCaches.releaseAll()
  }

  test("over-full cells are kept UNDEDUPED (maxCell guard), never exploded") {
    val emb = spark.read.parquet(embPath)
    val twins = emb.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val all = emb.unionByName(twins)
    // maxCell = 1: every multi-member cell is over-full → nothing dedups
    val surv = SemDedup.semanticDedupIvf(all, "vec_id", "embedding",
      model(emb), eps = 0.999999, maxCell = 1)
    assert(surv.count() == all.count())
    OpCaches.releaseAll()
  }

  test("deterministic across runs") {
    val emb = spark.read.parquet(embPath)
    val twins = emb.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val all = emb.unionByName(twins)
    def run() = SemDedup.semanticDedupIvf(all, "vec_id", "embedding",
      model(emb), eps = 0.999999).select("vec_id")
    val (a, b) = (run(), run())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    OpCaches.releaseAll()
  }

  test("zero vectors never kill a pair job and never count as near-dups") {
    import spark.implicits._
    val m = Ivf.IvfModel(Array(Array(0.5, 0.0), Array(0.0, 0.5)))
    val rows = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), // two zero vectors, same cell
      (3L, Seq(1f, 0f)), (4L, Seq(1f, 0f)) // one real dup pair
    ).toDF("vec_id", "embedding")
    val surv = SemDedup.semanticDedupIvf(rows, "vec_id", "embedding", m,
      eps = 0.99).select("vec_id").collect().map(_.getLong(0)).toSet
    // zero vectors both survive (dup of nothing); the real pair dedups
    assert(surv == Set(1L, 2L, 3L))
    // same guard on the LSH pair path and the centroid quality gate
    val pairs = Similarity.cosineNearDupPairs(rows, "vec_id", "embedding",
      dim = 2, threshold = 0.99, bits = 4)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((3L, 4L)))
    val kept = Similarity.embedQualityFilter(rows, "vec_id", "embedding",
      rows.filter(col("vec_id") === 3L), dims = 2, minCosine = 0.5)
    assert(kept.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L))
    OpCaches.releaseAll()
  }

  test("hard negatives: equals the window formulation, excludes positives") {
    val emb = spark.read.parquet(embPath)
    val queries = emb.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding"), col("label"))
    val positives = emb.select(col("vec_id"), col("label"))
      .join(queries.select(col("q_id"), col("label")), Seq("label"))
      .select(col("q_id"), col("vec_id"))
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding",
      queries, "q_id", "embedding", positives, k = 5)
    // no positive (same-label row) leaks into any query's negatives
    assert(got.join(positives.withColumnRenamed("q_id", "query_id"),
      Seq("query_id", "vec_id"), "left_semi").count() == 0)
    // reference: window rank over the same exclusion
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    val ref = emb.select(col("vec_id"), col("embedding").as("v"), col("label"))
      .join(broadcast(queries.select(col("q_id").as("query_id"),
        col("embedding").as("qv"), col("label").as("ql"))))
      .filter(col("label") =!= col("ql"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk").cast("int").as("rk"), col("vec_id"),
        col("cos").as("cosine_sim"))
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0)
  }

  test("l2Normalize: unit norms, zero vectors stay zero, cosine consistency") {
    import spark.implicits._
    val emb = spark.read.parquet(embPath)
    val out = Similarity.l2Normalize(emb, "embedding")
    // every nonzero vector's unit has norm ~1
    val unitNorm = Similarity.dot(col("unit"), col("unit"))
    assert(out.filter(col("norm") > 0)
      .filter(abs(unitNorm - 1.0) > 1e-9).count() == 0)
    // zero vector: no ANSI divide, zero unit
    val z = Similarity.l2Normalize(
      Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding"), "embedding")
      .head()
    assert(z.getAs[Double]("norm") == 0.0)
    assert(z.getSeq[Double](z.fieldIndex("unit")).forall(_ == 0.0))
    // cosine of originals ≈ dot of units (equality up to FP re-association)
    val a = emb.filter(col("vec_id") === 1).select(col("embedding").as("va"))
    val b = emb.filter(col("vec_id") === 2).select(col("embedding").as("vb"))
    val both = a.crossJoin(b)
    val cosRaw = both.select(Similarity.cosine(col("va"), col("vb"))).head().getDouble(0)
    val ua = Similarity.l2Normalize(emb.filter(col("vec_id") === 1), "embedding")
      .select(col("unit").as("ua"))
    val ub = Similarity.l2Normalize(emb.filter(col("vec_id") === 2), "embedding")
      .select(col("unit").as("ub"))
    val cosUnit = ua.crossJoin(ub)
      .select(Similarity.dot(col("ua"), col("ub"))).head().getDouble(0)
    assert(math.abs(cosRaw - cosUnit) < 1e-12)
  }

  test("IVF-probed hard negatives: full probe equals exact, partial keeps recall") {
    val emb = spark.read.parquet(embPath)
    val m = Ivf.trainCached(s"$embPath#hnspec", emb, "embedding", k = 8)
    val queries = emb.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding"), col("label"))
    val positives = emb.select(col("vec_id"), col("label"))
      .join(queries.select(col("q_id"), col("label")), Seq("label"))
      .select(col("q_id"), col("vec_id"))
    val exact = Similarity.hardNegatives(emb, "vec_id", "embedding",
      queries, "q_id", "embedding", positives, k = 5)
    // nProbe = every cell ⇒ zero recall loss: bit-equal to the exact path
    val full = Similarity.hardNegativesIvf(emb, "vec_id", "embedding",
      queries, "q_id", "embedding", positives, k = 5, m, nProbe = 8)
    assert(full.except(exact).count() == 0 && exact.except(full).count() == 0)
    // partial probe: top negatives live in cells near the query
    val part = Similarity.hardNegativesIvf(emb, "vec_id", "embedding",
      queries, "q_id", "embedding", positives, k = 5, m, nProbe = 4)
    val hits = part.select("query_id", "vec_id")
      .join(exact.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_semi").count()
    assert(hits * 100 >= exact.count() * 60, s"recall $hits/${exact.count()}")
  }

  test("hard negatives survive a zero-norm corpus vector (cosineSafe)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0f, 0f), 1), // the ANSI DIVIDE_BY_ZERO landmine
      (4L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding"), col("label"))
    val positives = corpus.select(col("vec_id"), col("label"))
      .join(queries.select(col("q_id"), col("label")), Seq("label"))
      .select(col("q_id"), col("vec_id"))
    val got = Similarity.hardNegatives(corpus, "vec_id", "embedding",
      queries, "q_id", "embedding", positives, k = 3)
      .select("rk", "vec_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ranks: 2 (0.9-ish cos), then 4 (0), then the zero vector (0, id tie)
    assert(got(1) == 2L)
    assert(Set(got(2), got(3)) == Set(3L, 4L))
  }
}
