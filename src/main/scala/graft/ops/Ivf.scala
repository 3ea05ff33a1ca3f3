package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index: vectors are
  * assigned to their nearest centroid; a query probes only the `nProbe`
  * closest centroid cells.
  *
  * This is the other scale path next to random-hyperplane LSH
  * ([[Similarity.lshTopK]]): LSH is data-independent (no training, good
  * for streaming ingest), IVF adapts to the data distribution (better
  * recall/cell-size tradeoffs on clustered embeddings). At 100 TB the
  * assignment is a map stage (broadcast centroids), the index is just a
  * `centroid_id` column — ideally a partition column of the stored
  * table so a probe prunes file listings, not only rows.
  *
  * Training uses k-means|| via Spark MLlib on a bounded sample with a
  * fixed seed — deterministic and cheap relative to the corpus.
  */
object Ivf {

  case class IvfModel(centroids: Array[Array[Double]])

  /** Cell count that keeps the EXPECTED cell size constant as the corpus
    * grows — the configuration the ScaleDrill measured (BENCH_NOTES r14):
    * SemDeDup-style intra-cell work is Σ s_c², so a FIXED k goes
    * superlinear per corpus decade (measured 1.24–1.34) while k ∝ n stays
    * under linear (0.72) with flat memory. `targetCellSize` defaults to
    * the suite profile (sf0.1's 2k vectors / 32 cells ≈ 62... the drill's
    * 625-per-cell k-scaled leg is the validated large-corpus point);
    * `minK` keeps small corpora at the tuned suite cell count. */
  def kForCorpus(nRows: Long, targetCellSize: Int = 625,
      minK: Int = 32): Int = {
    require(targetCellSize >= 1 && minK >= 1)
    math.max(minK, math.min(1 << 20, nRows / targetCellSize)).toInt
  }

  /** Train centroids on a seeded, partition-parallel sample of the vectors.
    *
    * The sample uses `df.sample(fraction, seed)` — each partition filters
    * its own rows with a seeded Bernoulli draw, so (unlike `limit(n)`,
    * which funnels everything through one GlobalLimit partition and gives
    * no determinism about WHICH rows survive) the sample is deterministic
    * for a fixed input + seed and never concentrates on one executor. The
    * one up-front `count()` is a metadata-cheap scan amortized over the
    * model's lifetime — train once per corpus and reuse ([[trainCached]]). */
  def train(vectors: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxSample: Int = 100000): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = vectors.count()
    // 1.1 headroom keeps E[sample] ≥ maxSample when n >> maxSample; k-means
    // only needs "about this many" rows, not an exact count
    val fraction = if (n <= maxSample) 1.0 else math.min(1.0, 1.1 * maxSample / n)
    val sampled = vectors.select(array_to_vector(
        col(vecCol).cast("array<double>")).as("features"))
      .sample(withReplacement = false, fraction, seed)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .fit(sampled)
    IvfModel(model.clusterCenters.map(_.toArray))
  }

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfModel]()

  /** [[train]] memoized on a caller-supplied corpus key (e.g. the table
    * path + k): the index model is built ONCE and reused across queries —
    * retraining k-means inside every query would redo the corpus scan and
    * can drift assignments between otherwise-identical probes. */
  def trainCached(key: String, vectors: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L, maxSample: Int = 100000): IvfModel =
    modelCache.computeIfAbsent(s"$key|$vecCol|$k|$seed",
      _ => train(vectors, vecCol, k, seed, maxSample))

  /** Test/profiling hook: drop memoized models so a re-train is measurable. */
  def clearModelCacheForTest(): Unit = modelCache.clear()

  /** Persist a model (trained and optionally [[refine]]d) as a warehouse
    * table — (cell, centroid) rows via [[graft.etl.Zones.saveTable]], so
    * train-once survives across sessions: tomorrow's run [[load]]s the
    * centroids instead of re-scanning the corpus, the batch sibling of
    * the [[Incremental]] state tables. Model-sized IO (k × dim doubles),
    * never data-sized. */
  def save(model: IvfModel, spark: SparkSession, table: String): Unit = {
    import spark.implicits._
    graft.etl.Zones.saveTable(
      model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid"), table)
  }

  /** Load a model persisted by [[save]]. Doubles round-trip parquet
    * bit-exactly, so assignments (and therefore probe results) with the
    * loaded model are identical to the session that trained it. */
  def load(spark: SparkSession, table: String): IvfModel = {
    val rows = spark.table(table).select(col("cell"), col("centroid"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"IVF model table '$table' is empty")
    require(rows.zipWithIndex.forall { case (r, i) => r.getInt(0) == i },
      s"IVF model table '$table' has missing/duplicate cells")
    IvfModel(rows.map(_.getSeq[Double](1).toArray))
  }

  /** Nearest-centroid id for a vector column: ONE native argmin kernel
    * over the flat literal centroid table
    * ([[graft.functions.ArgminL2Expr]]) — bit-identical to
    * [[assignComposed]] (IvfSpec pins it), but the generated code is a
    * single static call instead of k unrolled distance loops, which is
    * what kept the PQ/IVF assignment plans under the JVM's 64 KB
    * generated-method limit (r13 verdict, What's wrong #2). */
  def assign(model: IvfModel, vec: Column): Column =
    bestCentroid(model, vec).getField("i")

  /** (distance, index) struct of the nearest centroid — the shared core
    * of [[assign]] (index) and [[refine]] (both fields in one pass). */
  private[graft] def bestCentroid(model: IvfModel, vec: Column): Column = {
    val dim = model.centroids.head.length
    graft.functions.NativeFunctions.graft_argmin_l2(
      vec, model.centroids.flatten, dim)
  }

  /** The composed argmin formulation (k unrolled `graft_l2sq` structs
    * under `array_min`) — retained ONLY as the equality reference
    * IvfSpec pins [[assign]] against; its unrolled generated code is the
    * 64 KB-overflow shape production paths no longer run. */
  private[graft] def assignComposed(model: IvfModel, vec: Column): Column = {
    val dists = model.centroids.zipWithIndex.map { case (c, i) =>
      struct(l2sq(vec, c).as("d"), lit(i).as("i"))
    }
    array_min(array(dists: _*)).getField("i")
  }

  /** Native codegen'd squared-L2 to a literal centroid — bit-identical to
    * [[l2sqHof]] (same fold order; FunctionsSpec pins it). The HOF twin
    * paid an interpreted lambda per dimension × centroid × row. */
  private def l2sq(vec: Column, centroid: Array[Double]): Column =
    graft.functions.NativeFunctions.graft_l2sq(vec, centroid)

  /** The HOF reference formulation (oracle-replayable; spec pin only). */
  private[graft] def l2sqHof(vec: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(vec, array(centroid.map(lit(_)): _*),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)

  /** Add the IVF cell id to a vector table (the "index build"). */
  def index(model: IvfModel, vectors: DataFrame, vecCol: String): DataFrame = {
    graft.functions.NativeFunctions.register(vectors.sparkSession)
    vectors.withColumn("ivf_cell", assign(model, col(vecCol)))
  }

  /** A refined model plus the per-round inertia trace (Σ squared distance
    * to the assigned centroid, in 2^-qBits fixed-point units — integer,
    * so the trace is exactly reproducible). BigInt because the corpus-wide
    * sum of quantized squared distances has no magnitude bound a long can
    * promise: it accumulates in decimal(38,0) on the executors (the
    * [[Dedup.connectedComponents]] label-sum idiom) — a long sum would
    * overflow for large/unnormalized embeddings, and under Spark's default
    * ANSI mode that THROWS mid-refinement rather than degrading. */
  case class Refined(model: IvfModel, inertiaQ: Seq[BigInt])

  /** Distributed Lloyd refinement: `iters` rounds of (assign every vector
    * to its nearest centroid → recompute centroids as per-cell means).
    * [[train]] fits k-means on a bounded SAMPLE; this polishes that model
    * against the FULL corpus — the standard two-stage recipe when the
    * sample's cell boundaries drift from the real distribution.
    *
    * Scale shape, per round: ONE Spark job — assignment is the same
    * broadcast-centroid codegen expression the probe uses, the per-cell
    * mean is a partial aggregation whose shuffle carries k × dim rows
    * (independent of corpus size), and the round's inertia rides the same
    * aggregation as a quantized column instead of a second scan (the
    * CC/BPE observed-control pattern; here the control state IS the
    * aggregate output). Driver holds k × dim rows per round. No
    * checkpointing needed: each round's input is the ORIGINAL vector
    * table plus new centroid literals, so lineage never grows.
    *
    * Deterministic by construction: per-cell sums accumulate in 2^qBits
    * fixed-point longs (order-independent under any partitioning — the
    * [[Similarity.groupCentroidFixedPoint]] idiom), and assignment
    * tie-breaks by centroid index. Empty cells keep their previous
    * centroid. Lloyd's monotone-inertia guarantee holds up to the
    * quantization granularity (IvfSpec pins the trace). */
  def refine(model: IvfModel, vectors: DataFrame, vecCol: String,
      iters: Int, qBits: Int = 20): Refined = {
    require(iters >= 1 && qBits >= 0 && qBits <= 40)
    graft.functions.NativeFunctions.register(vectors.sparkSession)
    val scale = (1L << qBits).toDouble
    var cur = model
    val inertias = scala.collection.mutable.ArrayBuffer.empty[BigInt]
    for (_ <- 1 to iters) {
      // one native argmin pass per row (distance + index together) —
      // the [[assign]] kernel; the composed unrolled form is spec-only
      val best = bestCentroid(cur, col(vecCol))
      // The quantized per-(cell, dim) sums accumulate in LONG (primitive
      // buffer, codegen'd) with a DECIMAL(38,0) retry: a long sum only
      // overflows when one cell's Σ|x_dim|·2^qBits exceeds 2^63 (at
      // qBits=20 that is Σ|x| > 8.8e12 in a single cell — ~1e12 co-located
      // vectors of unit magnitude), and Spark's ANSI mode turns that into
      // a loud mid-job failure, never a wrong sum. Catching it and
      // re-running the round in exact decimal keeps the unbounded-
      // magnitude contract of the r7 fix without making every normal
      // round pay the Decimal-object aggregation buffer (~20% of q78).
      // Per-value quantization goes through an EXPLICIT round() before
      // the sum cast so both paths produce identical integers: a bare
      // double→long cast truncates toward zero while double→decimal(38,0)
      // rounds HALF_UP — without the round() the fallback would compute
      // (slightly) different centroids than the fast path. round() is
      // HALF_UP in both, and the rounded double is integer-exact below
      // 2^53, so the subsequent cast is lossless either way.
      def roundRows(decimal: Boolean) = {
        val sumT = if (decimal) "decimal(38,0)" else "long"
        def q(c: org.apache.spark.sql.Column) = round(c * scale, 0).cast(sumT)
        vectors
          // two selects: posexplode is a Generate, and its extraction
          // re-resolves getField before the struct aliases land — naming
          // the struct column first sidesteps the resolution-order trap
          .select(best.as("best"), col(vecCol).as("v"))
          .select(col("best.i").as("cell"), col("best.d").as("d"),
            posexplode(transform(col("v"), x => x.cast("double")))
              .as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(count(lit(1)).as("n"),
            sum(q(col("x"))).as("sum_q"),
            // one inertia contribution per VECTOR, not per dim
            sum(when(col("dim") === 0, q(col("d")))).as("in_q"))
          .collect()
      }
      val rows = try roundRows(decimal = false) catch {
        case e: Throwable if isOverflow(e) =>
          // observable fallback: a silent decimal re-run would hide that
          // the corpus tripped the long-sum magnitude bound
          System.err.println(
            s"graft.Ivf.refine: long-sum round hit ANSI overflow ($e); " +
              "re-running the round with decimal(38,0) sums")
          roundRows(decimal = true)
      }
      def asBig(v: Any): BigInt = v match {
        case null => BigInt(0)
        case l: java.lang.Long => BigInt(l.longValue)
        case d: java.math.BigDecimal => BigInt(d.toBigInteger)
      }
      inertias += rows.map(r => asBig(r.get(r.fieldIndex("in_q")))).sum
      val next = cur.centroids.map(_.clone()) // empty cells keep position
      rows.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("dim")) =
          asBig(r.get(r.fieldIndex("sum_q"))).doubleValue / r.getAs[Long]("n") / scale
      }
      cur = IvfModel(next)
    }
    Refined(cur, inertias.toSeq)
  }

  /** True iff the failure chain is an ANSI arithmetic/cast overflow (the
    * long-sum escape hatch in [[refine]]). Matches TYPED evidence only —
    * an `ArithmeticException` (Spark's SparkArithmeticException extends
    * it) or a SparkThrowable whose error CONDITION is an overflow class —
    * never a raw message substring: a codegen StackOverflowError or a
    * user string containing "overflow" must not silently trigger a full
    * decimal re-run (and mask the original failure if the retry fails
    * too). */
  private def isOverflow(e: Throwable): Boolean = {
    val overflowConditions =
      Set("ARITHMETIC_OVERFLOW", "CAST_OVERFLOW",
        "NUMERIC_VALUE_OUT_OF_RANGE", "BINARY_ARITHMETIC_OVERFLOW")
    var t: Throwable = e
    while (t != null) {
      val cond = t match {
        case st: org.apache.spark.SparkThrowable =>
          Option(st.getCondition).getOrElse("")
        case _ => ""
      }
      if (t.isInstanceOf[ArithmeticException] ||
        overflowConditions.exists(cond.startsWith)) return true
      t = t.getCause
    }
    false
  }

  /** The `nProbe` cells nearest to a query (driver-side arithmetic over
    * the model — the cell-pruning half of a probe, shared by [[topK]]
    * and the IVF-PQ composition in q92). */
  def probeCells(model: IvfModel, query: Seq[Float], nProbe: Int): Seq[Int] = {
    val qd = query.map(_.toDouble).toArray
    model.centroids.zipWithIndex
      .map { case (c, i) => (c.zip(qd).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).take(nProbe).map(_._2).toSeq
  }

  /** Top-k by cosine probing only the `nProbe` cells nearest the query. */
  def topK(model: IvfModel, indexed: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nProbe: Int = 2): DataFrame = {
    // Similarity.cosine resolves through the graft_dot native expression
    graft.functions.NativeFunctions.register(indexed.sparkSession)
    val q = array(query.map(lit(_)): _*)
    indexed
      .filter(col("ivf_cell").isInCollection(probeCells(model, query, nProbe)))
      .select(col(idCol), Similarity.cosine(col(vecCol), q).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)
  }
}
