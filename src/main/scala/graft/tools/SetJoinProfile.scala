package graft.tools

import graft.GraftSession
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Throwaway-style stage profile for q95 (SetJoin.jaccardJoin): forces
  * each intermediate frame separately to localize wall-clock cost at
  * sf0.1. Not part of the driver contract; run with
  * `runMain graft.tools.SetJoinProfile [sfDir]`. */
object SetJoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def force(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    val (idCol, textCol, shingleLen, minJaccardBp) = ("doc_id", "text", 3, 6000)
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val fps = df.select(col(idCol).as("id"),
        explode(array_distinct(transform(
          TextOps.wordShingles(col(textCol), shingleLen),
          s => TextOps.fingerprint(s)))).as("fp"))
      t("fps explode")(force(fps))
      val withDf = fps.withColumn("dfq",
        count(lit(1)).over(Window.partitionBy("fp")))
      t("window dfq")(force(withDf))
      val sorted = t("sorted build+persist") {
        val s = withDf.groupBy("id")
          .agg(transform(array_sort(collect_list(struct(col("dfq"), col("fp")))),
            x => x.getField("fp")).as("fps"))
          .withColumn("n", size(col("fps")).cast("long"))
          .persist()
        s.count(); s
      }
      val pref = sorted.select(col("id"), col("n"),
        explode(slice(col("fps"), lit(1),
          expr(s"cast(n - ((${minJaccardBp}L * n + 9999) div 10000) + 1 as int)")))
          .as("fp"))
      val cands = pref.select(col("id").as("id_a"), col("n").as("n_a"), col("fp"))
        .join(pref.select(col("id").as("id_b"), col("n").as("n_b"), col("fp")),
          Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("n_a"), col("n_b")) * 10000L >=
          lit(minJaccardBp.toLong) * greatest(col("n_a"), col("n_b")))
        .select("id_a", "id_b").distinct()
      t("prefix join + distinct")(force(cands))
      val out = cands
        .join(sorted.select(col("id").as("id_a"), col("fps").as("fps_a"),
          col("n").as("n_a")), Seq("id_a"))
        .join(sorted.select(col("id").as("id_b"), col("fps").as("fps_b"),
          col("n").as("n_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("fps_a"), col("fps_b"))).cast("long")
            .as("inter"),
          (col("n_a") + col("n_b")).as("sz"))
        .select(col("id_a"), col("id_b"),
          expr("inter * 10000 div (sz - inter)").as("jaccard_bp"))
        .filter(col("jaccard_bp") >= minJaccardBp)
      t("verify joins")(force(out))
      t("full query end-to-end") {
        force(graft.ops.SetJoin.jaccardJoin(df, idCol, textCol, shingleLen, minJaccardBp))
      }
      sorted.unpersist(false)
      graft.ops.OpCaches.releaseAll()
    }
    spark.stop()
  }
}
