package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal plumbing) exercised on the driver's `documents` /
  * `embeddings` / `events` tables.
  *
  * Oracle-checked queries (q21–q30) keep every value engine-deterministic:
  * integer arithmetic for text metrics, sequential double folds for vector
  * math (verified bit-exact vs DuckDB's list_dot_product). The near-dup
  * detectors (q40+) are not SQL-expressible → rows-only checks; their
  * correctness is pinned by ScalaTest with planted duplicates.
  */
object DataOpsQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- oracle

  /** Exact dedup via hash-groupBy (keep min id per distinct text), joined
    * back for per-source canonical counts. */
  val q21DedupExact: Q = (s, dir) => {
    val docs = load(s, dir, "documents")
    val keep = Dedup.exactDedup(docs, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
      .groupBy("source")
      .agg(count(lit(1)).as("n_canonical"))
      .orderBy("source")
  }

  /** Token counting + doc-length stats per language (all-integer math). */
  val q22TokenStats: Q = (s, dir) => {
    val docs = load(s, dir, "documents")
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        sum(TextOps.meanTokenLenX100(col("text"))).as("sum_mean_tok_len_x100"))
      .orderBy("lang")
  }

  /** Quality scoring per source (integer heuristics, SQL-mirrored). */
  val q23Quality: Q = (s, dir) => {
    val docs = load(s, dir, "documents")
    docs.select(col("source"), TextOps.qualityScore(col("text")).as("score"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score").cast("long")).as("sum_score"),
        sum(when(col("score") >= 70, 1L).otherwise(0L)).as("n_high_quality"))
      .orderBy("source")
  }

  /** Language-ID heuristic vs labeled lang: confusion-matrix counts. */
  val q24LangId: Q = (s, dir) => {
    load(s, dir, "documents")
      .select(col("lang"), TextOps.langGuess(col("text")).as("guess"))
      .groupBy("lang", "guess").agg(count(lit(1)).as("n"))
      .orderBy("lang", "guess")
  }

  /** Multimodal metadata pass: binary payload stats (octet length + MD5)
    * without decoding — pure codegen expressions. */
  val q25BinaryMeta: Q = (s, dir) => {
    val media = Multimodal.asMediaTable(load(s, dir, "documents"), "doc_id", "text")
    Multimodal.mediaStats(media)
      .select("media_id", "n_bytes", "checksum")
      .orderBy("media_id")
  }

  /** Brute-force cosine top-k against the vec_id=0 embedding (the exact
    * baseline: scan → score → TakeOrderedAndProject). */
  val q26AnnBrute: Q = (s, dir) => {
    val emb = load(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
  }

  /** Array explode (Generate) over embeddings: per-label element stats.
    * min/max are order-independent → deterministic on floats. */
  val q27VectorExplode: Q = (s, dir) => {
    load(s, dir, "embeddings")
      .select(col("label"), explode(col("embedding")).as("val"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vals"), min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
      .orderBy("label")
  }

  /** JSON extraction from the events.props payload (§2.8 F7). */
  val q29EventsJson: Q = (s, dir) => {
    load(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"),
        dsum(col("value")).as("sum_value"))
      .orderBy("k_mod")
  }

  val oracles: Map[String, String] = Map(
    "q21_dedup_exact" ->
      """WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text)
        |SELECT source, COUNT(*) AS n_canonical FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM keep)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q22_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |  ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END) AS BIGINT) AS sum_tokens,
        |CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 OR LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 = 0 THEN 0
        |  ELSE (CAST(LENGTH(REPLACE(TRIM(text), ' ', '')) AS BIGINT) * 100)
        |       // (LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1) END) AS BIGINT) AS sum_mean_tok_len_x100
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q23_quality" ->
      """WITH scored AS (
        |  SELECT source,
        |    (CASE WHEN ntok BETWEEN 20 AND 1000 THEN 40 WHEN ntok BETWEEN 5 AND 19 THEN 20 ELSE 0 END)
        |    + (CASE WHEN nstop * 10 >= ntok THEN 30 WHEN nstop > 0 THEN 15 ELSE 0 END)
        |    + (CASE WHEN npunct * 4 <= nlen THEN 30 ELSE 0 END) AS score
        |  FROM (
        |    SELECT source, LENGTH(text) AS nlen,
        |      CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |        ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END AS ntok,
        |      LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
        |        w -> w IN ('the','a','an','and','of','to','in','is','it','for'))) AS nstop,
        |      LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[\p{P}\p{S}]', '', 'g')) AS npunct
        |    FROM documents))
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(score) AS BIGINT) AS sum_score,
        |CAST(SUM(CASE WHEN score >= 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    "q24_langid" ->
      """SELECT lang,
        |CASE WHEN regexp_matches(text, '\b(the|and|of|is)\b') THEN 'en'
        |  WHEN regexp_matches(text, '\b(der|und|die|das)\b') THEN 'de'
        |  WHEN regexp_matches(text, '\b(le|la|et|les)\b') THEN 'fr'
        |  WHEN regexp_matches(text, '\b(el|los|las|una)\b') THEN 'es'
        |  ELSE 'und' END AS guess,
        |COUNT(*) AS n
        |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q25_binary_meta" ->
      """SELECT doc_id AS media_id,
        |CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
        |MD5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
    "q26_ann_brute" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |list_dot_product(CAST(embedding AS DOUBLE[]), qv)
        |  / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(qv, qv))) AS cosine_sim
        |FROM embeddings, q
        |ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q27_vector_explode" ->
      """SELECT label, COUNT(*) AS n_vals, MIN(val) AS min_val, MAX(val) AS max_val
        |FROM (SELECT label, UNNEST(embedding) AS val FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q29_events_json" ->
      s"""SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) % 10 AS k_mod,
         |COUNT(*) AS n,
         |CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
         |${sqlSum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  // ------------------------------------------------------------ rows-only

  /** Documents plus planted near-duplicate twins (one token appended, ids
    * offset by 1,000,000) — the detector must find the planted pairs. */
  private def withPlantedTwins(docs: DataFrame): DataFrame = {
    val twins = docs
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(col("text"), lit(" twin")))
    docs.unionByName(twins)
  }

  /** MinHash + LSH near-dup candidate pairs on planted twins. */
  val q40MinhashNearDup: Q = (s, dir) => {
    val docs = withPlantedTwins(load(s, dir, "documents"))
    Dedup.minhashNearDups(docs, "doc_id", "text", shingleLen = 3,
      numHashes = 32, bands = 4, minSim = 0.5)
      .orderBy("id_a", "id_b")
  }

  /** SimHash signatures (60-bit) of every document, via the native
    * codegen'd Catalyst expression (FunctionsSpec pins it equal to the
    * composed higher-order-function formulation in Dedup.simhash). */
  val q41Simhash: Q = (s, dir) => {
    graft.functions.NativeFunctions.register(s)
    load(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NativeFunctions.graft_simhash(col("text")).as("simhash"))
      .orderBy("doc_id")
  }

  /** Exact n-gram Jaccard verification over LSH candidates (planted twins). */
  val q42NgramJaccard: Q = (s, dir) => {
    val docs = withPlantedTwins(load(s, dir, "documents"))
    Dedup.ngramJaccardNearDups(docs, "doc_id", "text", shingleLen = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")
  }

  /** LSH-bucketed approximate NN (scale path of q26). */
  val q43AnnLsh: Q = (s, dir) => {
    val emb = load(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    Similarity.lshTopK(emb, "vec_id", "embedding", query, dim = query.length, k = 10, bits = 6)
  }

  /** Embedding-cosine near-dup pairs over planted identical twins. */
  val q44EmbedNearDup: Q = (s, dir) => {
    val emb = load(s, dir, "embeddings")
    val twins = emb.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    Similarity.cosineNearDupPairs(emb.unionByName(twins), "vec_id", "embedding",
      dim = dim, threshold = 0.99, bits = 8)
      .orderBy("id_a", "id_b")
  }

  /** Multimodal decode stage (stubbed codec, real plumbing). */
  val q45DecodeFeatures: Q = (s, dir) => {
    val media = Multimodal.asMediaTable(load(s, dir, "documents"), "doc_id", "text")
    Multimodal.decodeFeatures(media).orderBy("media_id")
  }

  /** Rolling-hash document fingerprints (Rabin-Karp mod 2^31-1), via the
    * native codegen'd expression. */
  val q46Fingerprint: Q = (s, dir) => {
    graft.functions.NativeFunctions.register(s)
    load(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NativeFunctions.graft_fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** IVF approximate NN (trained centroids + cell-probe; the adaptive
    * counterpart to the LSH path in q43). */
  val q48AnnIvf: Q = (s, dir) => {
    val emb = load(s, dir, "embeddings")
    val model = graft.ops.Ivf.train(emb, "embedding", k = 8)
    val indexed = graft.ops.Ivf.index(model, emb, "embedding")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    graft.ops.Ivf.topK(model, indexed, "vec_id", "embedding", query, k = 10, nProbe = 2)
  }

  /** Approximate distinct (HyperLogLog++) — sketch values are
    * engine-specific → rows-only. */
  val q47ApproxDistinct: Q = (s, dir) => {
    load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .orderBy("l_returnflag")
  }

  val all: Map[String, Q] = Map(
    "q21_dedup_exact" -> q21DedupExact,
    "q22_token_stats" -> q22TokenStats,
    "q23_quality" -> q23Quality,
    "q24_langid" -> q24LangId,
    "q25_binary_meta" -> q25BinaryMeta,
    "q26_ann_brute" -> q26AnnBrute,
    "q27_vector_explode" -> q27VectorExplode,
    "q29_events_json" -> q29EventsJson,
    "q40_minhash_neardup" -> q40MinhashNearDup,
    "q41_simhash" -> q41Simhash,
    "q42_ngram_jaccard" -> q42NgramJaccard,
    "q43_ann_lsh" -> q43AnnLsh,
    "q44_embed_neardup" -> q44EmbedNearDup,
    "q45_decode_features" -> q45DecodeFeatures,
    "q46_fingerprint" -> q46Fingerprint,
    "q47_approx_distinct" -> q47ApproxDistinct,
    "q48_ann_ivf" -> q48AnnIvf,
  )
}
