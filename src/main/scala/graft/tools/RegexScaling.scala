package graft.tools

import org.apache.spark.sql.functions._

/** Thread-scaling curve of codegen'd RegExpReplace under local[32]:
  * fixed rows-per-thread, varying thread count — flat µs/row/thread
  * means linear scaling, growth means a shared wall (allocator / memory
  * bandwidth). Motivates the native dedup-key swap. Drill tooling. */
object RegexScaling {
  def main(args: Array[String]): Unit = {
    val perThread = args.headOption.flatMap(_.toLongOption).getOrElse(20000L)
    val spark = graft.GraftSession.local()
    Seq(1, 2, 4, 8, 16, 32).foreach { parts =>
      val nn = perThread * parts
      val sub = spark.read.format("graft-synth")
        .option("rows", nn).option("partitions", parts)
        .option("dupfraction", 0.0).load()
        .select("text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sub.count()
      val t0 = System.nanoTime()
      sub.agg(sum(length(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " ")))).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[regex-scaling] x$parts%2d threads ($nn%7d rows): " +
        f"$secs%6.2fs -> ${secs * 1e6 * parts / nn}%.0f us/row/thread")
      sub.unpersist(true)
    }
    spark.stop()
  }
}
