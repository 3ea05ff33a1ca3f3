package graft.tools

/** Single-thread microbenchmark of the per-payload JDK codec calls the
  * media family rides (synth encode + decode + hash per payload) — the
  * "where does a media bench second go" instrument for the optimization
  * rounds. No Spark: pure per-call cost, ns/op after JIT warm-up.
  *
  * {{{ runMain graft.tools.MediaMicro }}}
  */
object MediaMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val threads = 32
    graft.ops.Multimodal.ensureImageIoMemCache()
    def once(f: Long => Any, i: Long): Long = f(i) match {
      case b: Array[Byte] => b.length.toLong
      case Some(v: Long) => v
      case None => 0L
      case x => if (x == null) 0L else x.hashCode.toLong
    }
    def bench(label: String)(f: Long => Any): Unit = {
      var i = 0L
      while (i < 2000) { f(i); i += 1 } // JIT warm-up
      val t0 = System.nanoTime()
      i = 0L
      var sink = 0L
      while (i < n) { sink ^= once(f, i); i += 1 }
      val serial = (System.nanoTime() - t0).toDouble / n
      // same op count spread over `threads` workers: per-op wall at full
      // parallelism exposes JVM-global locks the serial number hides
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t1 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var s = 0L; var j = 0L
            while (j < n / threads) { s ^= once(f, t * 1000L + j); j += 1 }
            s
          }
        })
      }
      futs.foreach(x => sink ^= x.get())
      val parWall = (System.nanoTime() - t1).toDouble / n // wall per op across pool
      pool.shutdown()
      val idealPar = serial / threads
      println(f"[media-micro] $label%-34s ${serial / 1000}%8.1f us/op serial  " +
        f"${parWall / 1000}%8.1f us/op par32-wall (ideal ${idealPar / 1000}%6.2f, " +
        f"contention x${parWall / idealPar}%4.1f)  (sink=$sink)")
    }
    val m = graft.ops.Multimodal
    // reflective access to the private[graft] helpers
    def call(name: String, id: Long): Array[Byte] = name match {
      case "png" => m.synthPng(id)
      case "wav" => m.synthWav(id)
      case "gif" => m.synthGif(id)
    }
    val pngs = (0L until 64L).map(call("png", _)).toArray
    val wavs = (0L until 64L).map(call("wav", _)).toArray
    val gifs = (0L until 64L).map(call("gif", _)).toArray
    val junk = (0L until 64L).map { id =>
      Array.fill((Math.floorMod(id, 17L) + 3L).toInt)(
        (Math.floorMod(id, 199L) + 1L).toByte)
    }.toArray
    bench("synthPng (encode)")(id => call("png", id % 64))
    bench("synthWav (encode)")(id => call("wav", id % 64))
    bench("synthGif (encode)")(id => call("gif", id % 64))
    bench("dHash63(png)")(id => m.dHash63(pngs((id % 64).toInt)))
    bench("dHash63(wav) [reject]")(id => m.dHash63(wavs((id % 64).toInt)))
    bench("dHash63(junk) [reject]")(id => m.dHash63(junk((id % 64).toInt)))
    bench("audioPHash31(wav)")(id => m.audioPHash31(wavs((id % 64).toInt)))
    bench("audioPHash31(junk) [reject]")(id => m.audioPHash31(junk((id % 64).toInt)))
    bench("audioPHash31(png) [reject]")(id => m.audioPHash31(pngs((id % 64).toInt)))
    bench("videoSeqHash(gif)")(id => m.videoSeqHash(gifs((id % 64).toInt)))
  }
}
