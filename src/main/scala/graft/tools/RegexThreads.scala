package graft.tools

/** Pure-JVM java.util.regex thread-scaling probe (no Spark): N threads
  * each run replaceAll over an independent ~1 KB string in a loop.
  * Separates a JVM/allocator wall from a Spark-execution wall. */
object RegexThreads {
  def main(args: Array[String]): Unit = {
    val txt = ("spark query table scan join merge sort hash batch " * 20).trim
    val opsPerThread = 5000
    // control: a plain char loop + a result-string allocation per op —
    // if THIS scales linearly, the wall is inside java.util.regex
    Seq(1, 4, 16, 32).foreach { nThreads =>
      val t0 = System.nanoTime()
      val threads = (1 to nThreads).map { _ =>
        new Thread(() => {
          var sink = 0L
          var i = 0
          while (i < opsPerThread * 50) {
            val sb = new java.lang.StringBuilder(txt.length)
            var j = 0
            while (j < txt.length) {
              val c = txt.charAt(j)
              sb.append(if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9' || c == ' ') c else ' ')
              j += 1
            }
            sink += sb.length
            i += 1
          }
          if (sink == 42) println("x")
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[char-loop] x$nThreads%2d threads: $secs%5.2fs -> " +
        f"${secs * 1e9 / (opsPerThread * 50)}%.0f ns/op/thread " +
        f"(total ${nThreads * opsPerThread * 50 / secs / 1000}%.0f kops/s)")
    }
    Seq(1, 4, 16, 32).foreach { nThreads =>
      val t0 = System.nanoTime()
      val threads = (1 to nThreads).map { _ =>
        new Thread(() => {
          val p = java.util.regex.Pattern.compile("[^a-z0-9 ]")
          var sink = 0L
          var i = 0
          while (i < opsPerThread) {
            sink += p.matcher(txt).replaceAll(" ").length
            i += 1
          }
          if (sink == 42) println("x") // keep sink live
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      val perOp = secs * 1e6 / opsPerThread
      println(f"[regex-threads] x$nThreads%2d threads: $secs%5.2fs -> " +
        f"$perOp%.0f us/op/thread (total ${nThreads * opsPerThread / secs}%.0f ops/s)")
    }
  }
}
