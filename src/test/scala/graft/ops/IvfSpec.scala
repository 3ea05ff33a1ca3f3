package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("IVF probe: self retrieved; top result matches brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Ivf.train(emb, "embedding", k = 8)
    assert(model.centroids.length == 8)
    val indexed = Ivf.index(model, emb, "embedding")
    // every vector is assigned exactly one cell, all cells populated-ish
    assert(indexed.filter(col("ivf_cell").isNull).count() == 0)
    assert(indexed.select("ivf_cell").distinct().count() > 1)
    val q = emb.filter(col("vec_id") === 11).select("embedding").head().getSeq[Float](0)
    val ivfTop = Ivf.topK(model, indexed, "vec_id", "embedding", q, k = 5, nProbe = 2).collect()
    assert(ivfTop.head.getLong(0) == 11L) // self lives in the probed cell
    val bruteTop = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5).collect()
    assert(ivfTop.head.getLong(0) == bruteTop.head.getLong(0))
  }

  test("assignment is deterministic across runs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m1 = Ivf.train(emb, "embedding", k = 4)
    val m2 = Ivf.train(emb, "embedding", k = 4)
    val a1 = Ivf.index(m1, emb, "embedding").select("vec_id", "ivf_cell")
    val a2 = Ivf.index(m2, emb, "embedding").select("vec_id", "ivf_cell")
    assert(a1.except(a2).count() == 0)
  }

  test("native argmin assignment == composed array_min formulation, and codegen compiles") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Ivf.train(emb, "embedding", k = 8)
    graft.functions.NativeFunctions.register(spark)
    val both = emb.select(
      Ivf.assign(model, col("embedding")).as("native"),
      Ivf.assignComposed(model, col("embedding")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    // the distance leg too (refine consumes best.d): min distance equals
    // the distance to the composed-assigned centroid
    val d = emb.select(
      Ivf.bestCentroid(model, col("embedding")).getField("d").as("nd"),
      Ivf.assignComposed(model, col("embedding")).as("ci"),
      col("embedding"))
    val mism = model.centroids.indices.map { i =>
      d.filter(col("ci") === i)
        .filter(col("nd") =!= graft.functions.NativeFunctions
          .graft_l2sq(col("embedding"), model.centroids(i)))
        .count()
    }.sum
    assert(mism == 0)
    // the kernel call sits inside compiled whole-stage codegen (the whole
    // point: no 64 KB fallback, no interpreted eval on the assign path)
    val plan = emb.select(Ivf.assign(model, col("embedding")))
      .queryExecution.executedPlan
    assert(plan.toString.startsWith("*"), plan.toString.take(200))
    val gen = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(gen.contains("Hashing.argminL2"), gen.take(500))
  }

  test("native cells_by_dist == composed array_sort formulation at every " +
      "nProbe, and codegen compiles") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Ivf.train(emb, "embedding", k = 8)
    graft.functions.NativeFunctions.register(spark)
    val dim = model.centroids.head.length
    for (nProbe <- Seq(1, 3, 8)) {
      val both = emb.select(
        slice(graft.functions.NativeFunctions.graft_cells_by_dist(
          col("embedding"), model.centroids.flatten, dim), 1, nProbe)
          .as("native"),
        Similarity.probeCellsComposed(model, col("embedding"), nProbe)
          .as("composed"))
      assert(both.filter(col("native") =!= col("composed")).count() == 0,
        s"nProbe=$nProbe ordering drift")
    }
    // duplicated centroids: ties must keep ascending index order, the
    // struct(d, i) tie-break the composed form encodes
    val dup = Ivf.IvfModel(Array(model.centroids(0), model.centroids(1),
      model.centroids(0), model.centroids(1)))
    val tied = emb.select(
      graft.functions.NativeFunctions.graft_cells_by_dist(
        col("embedding"), dup.centroids.flatten, dim).as("native"),
      Similarity.probeCellsComposed(dup, col("embedding"), 4).as("composed"))
    assert(tied.filter(col("native") =!= col("composed")).count() == 0)
    val plan = emb.select(graft.functions.NativeFunctions.graft_cells_by_dist(
      col("embedding"), model.centroids.flatten, dim))
      .queryExecution.executedPlan
    assert(plan.toString.startsWith("*"), plan.toString.take(200))
    val gen = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(gen.contains("Hashing.cellsByDist"), gen.take(500))
  }

  test("trainCached trains once per corpus key and reuses the model") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m1 = Ivf.trainCached("ivfspec-corpus", emb, "embedding", k = 4)
    val m2 = Ivf.trainCached("ivfspec-corpus", emb, "embedding", k = 4)
    assert(m1 eq m2) // same instance — no retrain on the second call
    val m3 = Ivf.trainCached("ivfspec-corpus", emb, "embedding", k = 5)
    assert(!(m3 eq m1)) // different params → different cache slot
  }

  test("training sample is partition-parallel (no GlobalLimit funnel)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // probe the plan Ivf.train builds for an oversized corpus by replaying
    // its sampling expression: sample() must appear, limit must not
    val sampled = emb.select(col("embedding")).sample(withReplacement = false, 0.5, 42L)
    val plan = sampled.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Sample"), plan)
    assert(!plan.contains("GlobalLimit"), plan)
    // and the train path no longer funnels through limit(maxSample)
    // (topK's limit(k) is a TakeOrderedAndProject — different, fine)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/ops/Ivf.scala")))
    assert(!src.contains("limit(maxSample)"), "Ivf.train must sample, not limit")
    assert(src.contains(".sample(withReplacement"), "Ivf.train should use seeded sample()")
  }

  test("multi-probe recall is monotone in nProbe and beats single-cell") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Ivf.trainCached("ivfspec-recall", emb, "embedding", k = 8)
    val indexed = Ivf.index(model, emb, "embedding").cache()
    val queries = emb.filter(col("vec_id") % 25 === 0) // 20 probes at sf0.001
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def recallAt(nProbe: Int): Double = {
      val hits = queries.map { case (_, q) =>
        val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet
        val ivf = Ivf.topK(model, indexed, "vec_id", "embedding", q, k = 10,
          nProbe = nProbe).collect().map(_.getLong(0)).toSet
        (ivf & brute).size.toDouble / brute.size
      }
      hits.sum / hits.length
    }
    val r1 = recallAt(1)
    val r2 = recallAt(2)
    val r8 = recallAt(8) // probing every cell IS brute force
    indexed.unpersist()
    assert(r2 >= r1, s"recall(nProbe=2)=$r2 < recall(nProbe=1)=$r1")
    assert(r8 >= r2 && r8 == 1.0, s"full probe must equal brute force, got $r8")
    assert(r1 > 0.3, s"single-cell recall implausibly low: $r1")
  }

  test("Lloyd refinement: deterministic, monotone inertia, full-corpus improvement") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m0 = Ivf.trainCached("ivfspec-refine", emb, "embedding", k = 8)
    val r1 = Ivf.refine(m0, emb, "embedding", iters = 4)
    val r2 = Ivf.refine(m0, emb, "embedding", iters = 4)
    // fixed-point sums + index tie-breaks → bit-identical reruns
    assert(r1.model.centroids.map(_.toSeq).toSeq == r2.model.centroids.map(_.toSeq).toSeq)
    assert(r1.inertiaQ == r2.inertiaQ)
    // Lloyd: non-increasing cost, up to the quantization granularity
    r1.inertiaQ.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + a / 1000000L + 1024L, s"$b > $a")
      case _ =>
    }
    // never worse than the input model beyond quantization granularity
    // (at this SF the trainer already saw the full corpus, so the trace
    // is flat-to-descending rather than strictly descending)
    assert(r1.inertiaQ.last <= r1.inertiaQ.head + r1.inertiaQ.head / 1000000L + 1024L,
      s"refinement degraded the model: ${r1.inertiaQ}")
  }

  test("model persistence: warehouse round-trip is bit-exact, probes identical") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m = Ivf.trainCached("ivfspec-persist", emb, "embedding", k = 4)
    val refined = Ivf.refine(m, emb, "embedding", iters = 2).model
    Ivf.save(refined, spark, "ivf_model_spec")
    val loaded = Ivf.load(spark, "ivf_model_spec")
    // doubles round-trip parquet exactly → identical model
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      refined.centroids.map(_.toSeq).toSeq)
    // and therefore identical probe results in a "new session" using it
    val q = emb.select("embedding").head().getSeq[Float](0)
    val a = Ivf.topK(refined, Ivf.index(refined, emb, "embedding"),
      "vec_id", "embedding", q, k = 5).collect().map(_.getLong(0)).toSeq
    val b = Ivf.topK(loaded, Ivf.index(loaded, emb, "embedding"),
      "vec_id", "embedding", q, k = 5).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("Lloyd refinement: empty cells keep their centroid, no NaN") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    // second centroid absurdly far away → never assigned → must survive
    val m = Ivf.IvfModel(Array(Array.fill(dim)(0.0), Array.fill(dim)(1e9)))
    val r = Ivf.refine(m, emb, "embedding", iters = 2)
    assert(r.model.centroids(1).forall(_ == 1e9))
    assert(r.model.centroids(0).forall(v => !v.isNaN && !v.isInfinite))
  }

  /** The 100 TB probe story: `ivf_cell` as a PARTITION COLUMN means a cell
    * probe prunes whole files/directories from the listing — the scan never
    * touches the other cells' data. */
  test("ivf_cell partition column → cell probe prunes partitions") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Ivf.trainCached("ivfspec-prune", emb, "embedding", k = 4)
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_part").toString
    Ivf.index(model, emb, "embedding")
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(out)
    // one directory per cell on disk
    val cellDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("ivf_cell="))
    assert(cellDirs.length == model.centroids.length)
    val probed = spark.read.parquet(out).filter(col("ivf_cell") === 2)
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(ivf_cell"), plan)
    assert(probed.count() ==
      Ivf.index(model, emb, "embedding").filter(col("ivf_cell") === 2).count())
  }
}
