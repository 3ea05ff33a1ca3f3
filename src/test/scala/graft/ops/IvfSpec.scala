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
}
