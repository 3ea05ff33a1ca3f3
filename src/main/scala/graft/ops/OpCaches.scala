package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for the intermediate frames the dedup/similarity operators
  * persist (signature/shingle tables referenced by several joins in one
  * plan — without caching the expensive hash computation would re-run once
  * per reference).
  *
  * Cache-lifetime contract: the operators persist and REGISTER here but
  * never unpersist themselves — the returned frames are lazy, so the only
  * safe point to drop the cache is after the caller materializes the
  * result. Callers that run many operator invocations in one session
  * (benchmarks, batch drivers) should call [[releaseAll]] after each
  * materialization; `graft.Bench` and `graft.Verify` do. Leaving caches
  * registered is harmless for single-shot jobs (executor GC + LRU block
  * eviction bound the cost), but a long-lived session would accumulate
  * storage without this hook.
  */
object OpCaches {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist (MEMORY_AND_DISK) and register a frame for later release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Unpersist every registered frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently registered cached frames (test hook). */
  def registeredCount: Int = synchronized(tracked.size)
}
