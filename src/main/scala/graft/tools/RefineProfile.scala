package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Localize q78 (Ivf.refine) wall-clock: times the train leg, then each
  * Lloyd round, then contrasts decimal(38,0) vs long fixed-point sums —
  * the r7 ADVICE change suspected in the 1.28→2.44s bench move. */
object RefineProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      graft.ops.Ivf.clearModelCacheForTest()
      val model = t("train (kmeans||, cached)")(
        graft.ops.Ivf.trainCached(s"$sfDir/embeddings#r$round", emb, "embedding", k = 8))
      t("refine 5 iters (decimal)")(
        graft.ops.Ivf.refine(model, emb, "embedding", iters = 5))
      t("refine 1 iter  (decimal)")(
        graft.ops.Ivf.refine(model, emb, "embedding", iters = 1))
      // long-sum contrast: same plan with sum(cast(long)) aggregates
      val scale = (1L << 20).toDouble
      val dists = model.centroids.zipWithIndex.map { case (c, i) =>
        struct(aggregate(zip_with(col("v"), array(c.map(lit(_)): _*),
          (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
          lit(0.0), (acc, v) => acc + v).as("d"), lit(i).as("i"))
      }
      t("1 assign+agg job (long)") {
        emb.select(col("embedding").as("v"))
          .select(array_min(array(dists: _*)).as("best"), col("v"))
          .select(col("best.i").as("cell"), col("best.d").as("d"),
            posexplode(transform(col("v"), x => x.cast("double")))
              .as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(count(lit(1)).as("n"),
            sum((col("x") * scale).cast("long")).as("sum_q"),
            sum(when(col("dim") === 0, (col("d") * scale).cast("long"))).as("in_q"))
          .collect()
      }
    }
    spark.stop()
  }
}
