package graft.ops

/** Lock-free canonical RIFF/WAVE encode/parse for the PCM-16 hot paths.
  *
  * WHY THIS EXISTS (optimization round r14): every
  * `javax.sound.sampled.AudioSystem` entry point — `write`,
  * `getAudioInputStream` — resolves its provider list through
  * `JDK13Services.getProviders`, a `static synchronized` method (one
  * JVM-GLOBAL lock, OpenJDK `com.sun.media.sound.JDK13Services`). Under
  * a 32-thread Spark stage every per-row synth/decode serializes on
  * that lock: the q141 stage profile measured 64 tasks at 111 s summed
  * executorRunTime against 5.3 s of CPU — 95% lock wait. This object
  * writes and parses the CANONICAL 44-byte-header WAVE layout (the only
  * shape the fixtures produce, and the shape `AudioSystem.write`
  * itself emits) with plain array arithmetic: no providers, no streams,
  * no locks.
  *
  * Byte/semantics contracts, both spec-pinned (WavIoSpec):
  *  - [[writeCanonical]] is BYTE-IDENTICAL to
  *    `AudioSystem.write(…, Type.WAVE, …)` of the same PCM_SIGNED
  *    16-bit little-endian stream (exhaustive fixture-parameter sweep);
  *  - [[parseCanonical]] accepts exactly the canonical layout and
  *    returns the same (rate, channels, frames, data) the
  *    `AudioSystem.getAudioInputStream` path yields; callers fall back
  *    to the AudioSystem path for RIFF payloads that deviate from the
  *    canonical shape (extra chunks, other encodings) and for the other
  *    JDK-readable magics, so acceptance semantics are unchanged.
  */
object WavIo {

  /** Parsed canonical PCM-16 WAVE: sample data lives in `bytes`
    * [[dataOff]] until dataOff + nFrames·channels·2, little-endian. */
  final case class Pcm16(rate: Float, channels: Int, nFrames: Int,
      dataOff: Int)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** The canonical WAVE container `AudioSystem.write` emits for a
    * PCM_SIGNED 16-bit little-endian stream: 12-byte RIFF preamble,
    * 24-byte fmt chunk (PCM tag 1), 8-byte data chunk header, samples.
    * Byte-identical to the JDK writer (WavIoSpec pins the sweep). */
  def writeCanonical(data: Array[Byte], rate: Float, channels: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val sampleRate = rate.toInt
    val avgBytes = sampleRate * blockAlign
    val out = new Array[Byte](44 + data.length)
    def put32be(off: Int, v: Int): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    def put32le(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def put16le(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    put32be(0, 0x52494646)            // "RIFF"
    put32le(4, 36 + data.length)      // riff length
    put32be(8, 0x57415645)            // "WAVE"
    put32be(12, 0x666d7420)           // "fmt "
    put32le(16, 16)                   // fmt chunk length
    put16le(20, 1)                    // WAVE_FORMAT_PCM
    put16le(22, channels)
    put32le(24, sampleRate)
    put32le(28, avgBytes)
    put16le(32, blockAlign)
    put16le(34, 16)                   // bits per sample
    put32be(36, 0x64617461)           // "data"
    put32le(40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Strict parse of the canonical layout above. `None` means "not the
    * canonical shape" — the caller decides between the AudioSystem
    * fallback (RIFF/other JDK magics) and rejection (see
    * [[jdkMightRead]]); it never silently mis-reads a deviant WAV. */
  def parseCanonical(bytes: Array[Byte]): Option[Pcm16] = {
    if (bytes.length < 44) return None
    if (le32(bytes, 0) != 0x46464952 ||   // "RIFF" little-endian read
        le32(bytes, 8) != 0x45564157 ||   // "WAVE"
        le32(bytes, 12) != 0x20746d66 ||  // "fmt "
        le32(bytes, 16) != 16 ||          // canonical fmt length
        le16(bytes, 20) != 1 ||           // PCM
        le16(bytes, 34) != 16 ||          // 16-bit
        le32(bytes, 36) != 0x61746164)    // "data"
      return None
    val channels = le16(bytes, 22)
    if (channels < 1) return None
    val rate = le32(bytes, 24)
    if (rate <= 0) return None
    val blockAlign = le16(bytes, 32)
    if (blockAlign != channels * 2) return None
    val dataLen = le32(bytes, 40)
    if (dataLen < 0 || 44L + dataLen > bytes.length) return None
    Some(Pcm16(rate.toFloat, channels, dataLen / blockAlign, 44))
  }

  /** Whether any JDK-installed audio reader could possibly accept these
    * bytes — the OpenJDK provider set is WaveFileReader (+ float/
    * extensible variants), AiffFileReader, AuFileReader and the Gervill
    * SoftMidiAudioFileReader, whose magics are "RIFF", "FORM", ".snd"
    * and "MThd" respectively (each rejects on magic first). A payload
    * with none of these magics is rejected by every provider, so
    * callers may return None without taking the AudioSystem lock —
    * byte-for-byte the same acceptance semantics, minus the global
    * synchronization. */
  def jdkMightRead(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 4) return false
    val m = le32(bytes, 0)
    m == 0x46464952 ||  // "RIFF"
    m == 0x4d524f46 ||  // "FORM"
    m == 0x646e732e ||  // ".snd"
    m == 0x6468544d     // "MThd"
  }
}
