package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/validation/test splitting and curriculum sharding — the
  * last-mile assignment operators of a training-data pipeline (every
  * corpus ships as named splits, and curriculum recipes consume shards
  * ordered by a difficulty signal).
  *
  * Two split regimes, the [[Sampling]] design language throughout
  * (seeded Knuth hash, integer thresholds, no RNG state):
  *  - [[hashSplit]]: ONE map-only pass, no shuffle, proportions
  *    approximate (binomial). The 100 TB default.
  *  - [[stratifiedExactSplit]]: exact ⌊n_s·bp/10000⌋ row counts per
  *    stratum, via a per-stratum rank over the seeded hash order. Costs
  *    one window sort per stratum — the audit/eval-set builder, not the
  *    petabyte path.
  * Both are deterministic per (id, seed) / (stratum contents, seed) and
  * replay exactly in external SQL.
  */
object Splits {

  /** Validate basis-point split specs: positive, sum ≤ 10000 (the
    * remainder is the LAST split's — callers list explicit fractions for
    * all but the final catch-all split). */
  private def checkSplits(splitsBp: Seq[(String, Int)]): Unit = {
    require(splitsBp.size >= 2, "need at least two splits")
    require(splitsBp.map(_._1).distinct.size == splitsBp.size,
      "duplicate split names")
    require(splitsBp.init.forall(_._2 > 0), "split fractions must be > 0")
    require(splitsBp.last._2 == -1,
      "last split must carry bp = -1 (the catch-all remainder)")
    require(splitsBp.init.map(_._2).sum < 10000,
      "explicit split fractions must sum below 10000")
  }

  /** Map-only hash split: row → the split whose cumulative basis-point
    * band contains `seededKnuth(id) · 10000 div 2^31`. Proportions are
    * binomial around the targets (exact in expectation); membership is
    * deterministic per (id, seed), independent of partitioning, ordering
    * and corpus content — adding documents never reassigns existing ones
    * (the property that makes hash splits the production default: eval
    * contamination cannot creep in through a re-run).
    *
    * `splitsBp`: explicit fractions for all but the last entry, which
    * must be `(name, -1)` and receives the remainder. */
  def hashSplit(docs: DataFrame, idCol: String,
      splitsBp: Seq[(String, Int)], seed: Int = 0): DataFrame = {
    checkSplits(splitsBp)
    Sampling.requireFreshColumns(docs, "hashSplit", "split")
    // band = h·10000 div 2^31 ∈ [0, 10000): uniform over ids. The double
    // division is EXACT integer division here: h·10000 < 2^45 is exactly
    // representable, and dividing by 2^31 (a power of two) only shifts
    // the exponent — so the truncating cast equals the oracle's `//`.
    val band = (Sampling.seededKnuth(col(idCol), seed) * lit(10000L))
      .divide(lit(2147483648L)).cast("long")
    val cuts = splitsBp.init.scanLeft(0L) { case (acc, (_, bp)) => acc + bp }.tail
    val expr0: Column = lit(splitsBp.last._1)
    val assign = splitsBp.init.zip(cuts).foldRight(expr0) {
      case (((name, _), cut), rest) => when(band < cut, lit(name)).otherwise(rest)
    }
    docs.withColumn("split", assign)
  }

  /** Rank-order hash for [[stratifiedExactSplit]]: the fully MIXED
    * chain — Knuth multiply, xor-shift, second multiply. Since round 10
    * [[Sampling.seededKnuth]] applies the same mixing for every nonzero
    * seed (the 5M recipe drill showed the affine rotate-multiply
    * corrupts COMPOSED selections, not just ranks), so the nonzero-seed
    * branch simply delegates — bit-identical to the old orderHash, all
    * existing oracles hold. Seed 0 keeps the explicit xor-shift +
    * multiply on top of the plain Knuth hash (seededKnuth's seed-0
    * contract is the bare one-multiply form and must stay replayable as
    * such). Integer-only, exactly replayable in external SQL
    * (xor + floor-div + multiply + mod); SplitsSpec pins the per-seed
    * reshuffle. */
  def orderHash(idCol: Column, seed: Int): Column =
    if (seed != 0) Sampling.seededKnuth(idCol, seed)
    else {
      val h0 = Sampling.seededKnuth(idCol, 0)
      val h1 = h0.bitwiseXOR(shiftright(h0, 16))
      pmod(h1 * lit(2654435761L), lit(2147483648L))
    }

  /** Exact stratified split: within each stratum, rows are ranked by
    * (seeded hash, id) — a deterministic shuffle — and the first
    * ⌊n_s·bp₁/10000⌋ go to split 1, the next ⌊n_s·bp₂/10000⌋ to split 2,
    * …, remainder to the last. Exact per-stratum counts (the eval-set
    * builder's contract: "exactly 10% of every language"), deterministic
    * per (stratum contents, seed).
    *
    * Scale note: the rank is a window sort PER STRATUM (parallel across
    * strata, skew = the largest stratum); the per-stratum sizes ride the
    * same window as a count — no driver collect, no second pass. At
    * corpus scale prefer [[hashSplit]] unless exactness is the point. */
  def stratifiedExactSplit(docs: DataFrame, idCol: String, strataCol: String,
      splitsBp: Seq[(String, Int)], seed: Int = 0): DataFrame = {
    checkSplits(splitsBp)
    // rk/ns are internal scratch but a clash would still corrupt: the
    // trailing drop() would remove the CALLER's columns of those names
    Sampling.requireFreshColumns(docs, "stratifiedExactSplit",
      "split", "rk", "ns")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    val wOrd = w.orderBy(orderHash(col(idCol), seed), col(idCol))
    val ranked = docs
      .withColumn("rk", row_number().over(wOrd).cast("long") - 1L)
      .withColumn("ns", count(lit(1)).over(w))
    // cumulative exact cut at split i: Σ_{j ≤ i} ⌊n_s·bp_j / 10000⌋
    val cuts = splitsBp.init
      .scanLeft(lit(0L): Column) { case (acc, (_, bp)) =>
        acc + expr(s"ns * $bp div 10000")
      }.tail
    val expr0: Column = lit(splitsBp.last._1)
    val assign = splitsBp.init.zip(cuts).foldRight(expr0) {
      case (((name, _), cut), rest) => when(col("rk") < cut, lit(name)).otherwise(rest)
    }
    ranked.withColumn("split", assign).drop("rk", "ns")
  }

  /** Curriculum shard assignment: the corpus in `nShards` contiguous
    * difficulty bands — shard 1 holds the easiest ⌈n/nShards⌉-ish rows,
    * the last the hardest (curriculum learning, Bengio et al. ICML 2009;
    * the shard id is what a pacing schedule consumes). Assignment is
    * EXACTLY SQL `NTILE(nShards) OVER (ORDER BY difficulty, id)`:
    * the first `n mod nShards` shards take ⌈n/nShards⌉ rows, the rest
    * ⌊n/nShards⌋, over the (difficulty, id) total order.
    *
    * Scale shape: NTILE's global order is NOT computed with a
    * one-partition window — the global rank decomposes as
    * `rank = (rows with difficulty < d) + (rank of id within d)`:
    * one bounded histogram aggregation over the DISTINCT difficulty
    * values (broadcast-joined back — the [[ExactPercentile]]
    * contract: difficulty signals are scores/grades with bounded
    * cardinality, guarded the same way) plus one per-value window
    * (parallel across values; skew = the hottest difficulty value).
    * The q32-style whole-corpus single-partition sort never happens. */
  /** 0-based GLOBAL rank of every row over the total order
    * (`valueCol` asc or desc, `idCol` asc) — WITHOUT a single-partition
    * window sort: `rank = (rows strictly before this value) + (rank of
    * id within the value)`. The first term is one bounded histogram
    * aggregation whose cumulative counts join back BROADCAST (bounded-
    * cardinality guard; O(1) hash probe per row); the second is a window
    * PER VALUE (parallel across values, skew = the hottest value).
    * Shared by [[curriculumShards]] (NTILE) and [[balancedShards]]
    * (snake assignment). */
  private def globalRank(docs: DataFrame, idCol: String, valueCol: String,
      ascending: Boolean, maxDistinct: Int, caller: String): (DataFrame, Long) = {
    // integral types ONLY: the histogram keys on cast-to-long while the
    // per-value window partitions on the RAW column — a fractional
    // signal (cast(0.3)=cast(0.7)=0, but separate window partitions)
    // would produce silently-overlapping global ranks. Fail loudly.
    docs.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"$caller: rank value '$valueCol' must be an integral type, got " +
          s"${other.simpleString} — quantize/bucket the raw signal first")
    }
    val hist = docs
      .select(col(valueCol).cast("long").as("d"))
      .groupBy("d").agg(count(lit(1)).as("cnt"))
      .collect()
    require(hist.forall(!_.isNullAt(0)),
      s"$caller: the rank value must be non-null " +
        "(quantize/bucket the raw signal first)")
    require(hist.length <= maxDistinct,
      s"$caller: ${hist.length} distinct values exceed " +
        s"maxDistinct=$maxDistinct — the histogram-decomposed rank needs " +
        "bounded cardinality (bucket the signal first)")
    val sorted0 = hist.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sorted = if (ascending) sorted0 else sorted0.reverse
    val n = sorted.map(_._2).sum
    // rows strictly before each value → a BROADCAST hash join against the
    // (value, before) table. Not a when-chain (100k arms break codegen)
    // and not a literal map either: GetMapValue on an ArrayBasedMapData
    // literal is a LINEAR scan of the key array, so the rank pass would
    // pay O(rows × distinct) comparisons at large maxDistinct — the hash
    // join probes in O(1) per row and the build side is the histogram we
    // already hold. Inner join is total: every (non-null) value appears
    // in its own histogram.
    val spark = docs.sparkSession
    import spark.implicits._
    val beforeDf = broadcast(
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2).init)
        .toSeq.toDF("__rank_v", "__before"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(valueCol)).orderBy(col(idCol))
    (docs.join(beforeDf, col(valueCol).cast("long") === col("__rank_v"))
      .withColumn("gr",
        col("__before") + row_number().over(w).cast("long") - 1L)
      .drop("__rank_v", "__before"), n)
  }

  def curriculumShards(docs: DataFrame, idCol: String, difficultyCol: String,
      nShards: Int, maxDistinct: Int = 100000): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    Sampling.requireFreshColumns(docs, "curriculumShards", "shard", "gr",
      "__rank_v", "__before")
    val (ranked, n) = globalRank(docs, idCol, difficultyCol,
      ascending = true, maxDistinct, "curriculumShards")
    // NTILE(k) over n rows, 0-based global rank r: the first (n mod k)
    // shards take ⌈n/k⌉ rows, the rest ⌊n/k⌋. Integer-exact arithmetic.
    val big = (n + nShards - 1) / nShards // ⌈n/k⌉
    val small = n / nShards // ⌊n/k⌋
    val nBig = if (n % nShards == 0) nShards.toLong else n % nShards
    val bigSpan = nBig * big
    ranked
      .withColumn("shard",
        if (small == 0L) col("gr") + 1L // more shards than rows: rank+1
        else when(col("gr") < bigSpan, expr(s"1 + (gr div $big)"))
          .otherwise(expr(s"${nBig + 1} + ((gr - $bigSpan) div $small)")))
      .drop("gr")
  }

  /** Balanced token-mass sharding: assign each row to one of `nShards`
    * shards so per-shard WEIGHT sums (token counts — the thing a data-
    * parallel trainer actually balances) come out near-equal, not just
    * per-shard row counts ([[Sampling.deterministicShard]] balances
    * rows). Snake/boustrophedon assignment over the weight-descending
    * global rank — the classic LPT approximation flattened to one
    * deterministic arithmetic expression: rank r → round r div S, pos
    * r mod S, shard = pos on even rounds, S−1−pos on odd (heaviest S
    * rows spread across all shards, next S in reverse order, …).
    *
    * Same scale shape as [[curriculumShards]]: histogram-decomposed rank
    * (no single-partition sort), then a pure map expression. Exactly
    * replayable in SQL from `ROW_NUMBER() OVER (ORDER BY w DESC, id)`. */
  def balancedShards(docs: DataFrame, idCol: String, weightCol: String,
      nShards: Int, maxDistinct: Int = 100000): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    Sampling.requireFreshColumns(docs, "balancedShards", "shard", "gr",
      "__rank_v", "__before")
    val (ranked, _) = globalRank(docs, idCol, weightCol,
      ascending = false, maxDistinct, "balancedShards")
    ranked
      .withColumn("shard", expr(
        s"CASE WHEN (gr div $nShards) % 2 = 0 THEN gr % $nShards " +
          s"ELSE ${nShards - 1} - (gr % $nShards) END + 1"))
      .drop("gr")
  }
}
