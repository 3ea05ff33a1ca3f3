package graft.etl

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Live object-store round-trip (the K4/K5 network leg the reference
  * exercises against real S3 — `ingestion/ingestion/bronze/bronze.py:241`).
  *
  * The engine is path-scheme-transparent (`Zones.writeParquet` takes any
  * Hadoop-FS URI), but this sandbox has no egress and no hadoop-aws jars,
  * so the test is DOUBLY gated and cancels cleanly unless both hold:
  *
  *  - `SPARK_GRAFT_S3_TEST=1` plus `SPARK_GRAFT_S3_ENDPOINT` /
  *    `SPARK_GRAFT_S3_BUCKET` (and optionally `..._ACCESS_KEY` /
  *    `..._SECRET_KEY`) in the environment;
  *  - `org.apache.hadoop.fs.s3a.S3AFileSystem` on the classpath
  *    (hadoop-aws + aws-sdk-bundle, standard on real clusters).
  *
  * Against MinIO or any S3-compatible endpoint this verifies the full
  * write → list → read → value-equality loop. See DEPLOY.md §Object store.
  */
class S3SmokeSpec extends AnyFunSuite {

  test("parquet round-trip through an S3-compatible endpoint") {
    assume(sys.env.get("SPARK_GRAFT_S3_TEST").contains("1"),
      "SPARK_GRAFT_S3_TEST!=1 — live S3 smoke skipped")
    assume(
      try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
      catch { case _: Throwable => false },
      "hadoop-aws not on classpath — live S3 smoke skipped")
    val endpoint = sys.env("SPARK_GRAFT_S3_ENDPOINT")
    val bucket = sys.env("SPARK_GRAFT_S3_BUCKET")
    val spark = GraftSession.builder("s3smoke").getOrCreate()
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", endpoint)
    hc.set("fs.s3a.path.style.access", "true") // MinIO-style addressing
    sys.env.get("SPARK_GRAFT_S3_ACCESS_KEY").foreach(hc.set("fs.s3a.access.key", _))
    sys.env.get("SPARK_GRAFT_S3_SECRET_KEY").foreach(hc.set("fs.s3a.secret.key", _))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = s"s3a://$bucket/graft-smoke/documents"
    Zones.writeParquet(docs, path)
    val back = Zones.readParquet(spark, path)
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
  }
}
