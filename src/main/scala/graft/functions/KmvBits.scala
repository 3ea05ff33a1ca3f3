package graft.functions

/** K-Minimum-Values (bottom-k / theta) sketch math + canonical
  * serialization, shared by the build/merge aggregators
  * ([[graft.ops.Kmv]]) and the native estimate expressions
  * ([[KmvEstExpr]], [[KmvUnionExpr]], [[KmvInterExpr]]).
  *
  * The SET-OPERATION member of the sketch family: Bloom answers
  * membership, CMS frequency, HLL distinct, DDSketch quantiles — none of
  * them can estimate |A ∩ B| between two pre-built sketches (HLL unions
  * exactly but intersects only via inclusion–exclusion, whose error is
  * proportional to the UNION size and explodes for small overlaps). A KMV
  * sketch retains the k smallest distinct 64-bit hash values of the key
  * set (splitmix64 avalanche, [[BloomBits.mix]] — uniform on [0, 2^64)).
  * Because "k smallest distinct hashes of A ∪ B" is a deterministic
  * function of the distinct-key SET — not of row order or partitioning —
  * the merge (union the value lists, keep the k smallest) satisfies
  * sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) BIT-IDENTICALLY, with no
  * collapse cap: the same exact-mergeability contract as [[HllBits]],
  * unconditionally.
  *
  * Estimation (Bar-Yossef et al. 2002; Dasgupta et al., the DataSketches
  * theta framework): with v_k the k-th smallest hash as a fraction of
  * 2^64, distinct ≈ (k−1)/v_k, relative standard error ≈ 1/√(k−2)
  * (k = 1024 → ~3.1%). A sketch holding fewer than k values has seen its
  * WHOLE distinct set and is exact. For two sketches, θ = min of their
  * k-th-value thresholds; hashes below θ form a uniform sample of
  * A ∪ B, so |union hashes < θ|/θ and |common hashes < θ|/θ estimate
  * union and intersection sizes — the Jaccard path near-dup pipelines
  * audit shard overlap with.
  *
  * Canonical layout (big-endian), stable across any build order:
  * {{{
  *   [version: u8 = 1]
  *   [k: i32]
  *   [n: i32]                       n ≤ k
  *   [hash: i64 * n]                ascending UNSIGNED order, distinct
  * }}}
  * Aggregation buffers carry the same layout at full capacity
  * (`headerLen + 8k` bytes, garbage past n); [[compact]] trims to the
  * canonical n-length form on `finish`, so equal sketch SETS are equal
  * BYTES regardless of how they were built.
  */
object KmvBits {

  final val Version: Byte = 1
  final val HeaderLen: Int = 1 + 4 + 4

  /** Full-capacity empty buffer for k retained values. */
  def empty(k: Int): Array[Byte] = {
    require(k >= 16, s"KMV k must be >= 16, got $k")
    val buf = new Array[Byte](HeaderLen + 8 * k)
    buf(0) = Version
    putInt(buf, 1, k)
    putInt(buf, 5, 0)
    buf
  }

  def kOf(buf: Array[Byte]): Int = getInt(buf, 1)
  def nOf(buf: Array[Byte]): Int = getInt(buf, 5)

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
  }
  private def getLong(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  def valueAt(buf: Array[Byte], i: Int): Long = getLong(buf, HeaderLen + 8 * i)

  /** Insert the MIXED hash of `rawKey` into a full-capacity buffer
    * in place: unsigned binary search, memmove, drop the largest when
    * full. O(log k) compare + one arraycopy; keys hashing past the
    * current k-th value return immediately (the common case once the
    * sketch fills). */
  def add(buf: Array[Byte], rawKey: Long): Array[Byte] = {
    val h = BloomBits.mix(rawKey)
    val k = kOf(buf); val n = nOf(buf)
    if (n == k && java.lang.Long.compareUnsigned(h, valueAt(buf, n - 1)) >= 0)
      return buf
    // unsigned lower-bound search
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(valueAt(buf, mid), h)
      if (c < 0) lo = mid + 1
      else if (c == 0) return buf // already present
      else hi = mid
    }
    val keep = (if (n == k) n - 1 else n) - lo // entries shifted right
    if (keep > 0)
      System.arraycopy(buf, HeaderLen + 8 * lo, buf, HeaderLen + 8 * (lo + 1), 8 * keep)
    putLong(buf, HeaderLen + 8 * lo, h)
    if (n < k) putInt(buf, 5, n + 1)
    buf
  }

  /** Two-pointer union of two sketches' value lists (either canonical or
    * full-capacity), keeping the k smallest distinct — returns a FRESH
    * full-capacity buffer. The monoid merge the aggregators use. */
  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val k = kOf(a)
    require(kOf(b) == k, s"KMV merge: k mismatch (${kOf(b)} vs $k)")
    val out = empty(k)
    val na = nOf(a); val nb = nOf(b)
    var ia = 0; var ib = 0; var no = 0
    while (no < k && (ia < na || ib < nb)) {
      val takeA =
        if (ia >= na) false
        else if (ib >= nb) true
        else java.lang.Long.compareUnsigned(valueAt(a, ia), valueAt(b, ib)) <= 0
      val v = if (takeA) { val x = valueAt(a, ia); ia += 1; x }
              else { val x = valueAt(b, ib); ib += 1; x }
      // both inputs are sorted-distinct, so a cross-list duplicate is
      // always adjacent in the merged stream
      if (no == 0 || valueAt(out, no - 1) != v) {
        putLong(out, HeaderLen + 8 * no, v); no += 1
      }
    }
    putInt(out, 5, no)
    out
  }

  /** Trim a full-capacity buffer to the canonical n-length byte form (the
    * `finish` step — equal sets become equal bytes). Canonical input is
    * returned as-is. */
  def compact(buf: Array[Byte]): Array[Byte] = {
    val len = HeaderLen + 8 * nOf(buf)
    if (buf.length == len) buf else java.util.Arrays.copyOf(buf, len)
  }

  private final val Two64 = 18446744073709551616.0 // 2^64

  /** Unsigned value as a fraction of 2^64, in (0, 1). */
  private def frac(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble) / Two64

  /** Distinct-count estimate: exact n when the sketch never filled
    * (it holds the whole hashed set); (k−1)/v_k otherwise. */
  def estimate(buf: Array[Byte]): Long = {
    val k = kOf(buf); val n = nOf(buf)
    if (n < k) n.toLong
    else {
      val vk = frac(valueAt(buf, n - 1))
      if (vk <= 0.0) n.toLong else StrictMath.round((k - 1).toDouble / vk)
    }
  }

  /** θ threshold of a sketch: the k-th value's fraction when full, else 1
    * (every hash retained). Returned in hash space as an exclusive
    * unsigned bound, or -1 meaning "unbounded" (n < k). */
  private def thetaHash(buf: Array[Byte]): Long =
    if (nOf(buf) < kOf(buf)) -1L else valueAt(buf, nOf(buf) - 1)

  /** Shared θ of two sketches: the smaller threshold (unsigned), or
    * unbounded when neither filled. */
  private def sharedTheta(a: Array[Byte], b: Array[Byte]): Long = {
    val ta = thetaHash(a); val tb = thetaHash(b)
    if (ta == -1L) tb
    else if (tb == -1L) ta
    else if (java.lang.Long.compareUnsigned(ta, tb) <= 0) ta else tb
  }

  private def below(h: Long, theta: Long): Boolean =
    theta == -1L || java.lang.Long.compareUnsigned(h, theta) <= 0

  /** |A ∪ B| estimate from two sketches (exact when neither filled). */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val theta = sharedTheta(a, b)
    var ia = 0; var ib = 0; var cnt = 0L
    val na = nOf(a); val nb = nOf(b)
    var last = 0L; var any = false
    while (ia < na || ib < nb) {
      val takeA =
        if (ia >= na) false
        else if (ib >= nb) true
        else java.lang.Long.compareUnsigned(valueAt(a, ia), valueAt(b, ib)) <= 0
      val v = if (takeA) { val x = valueAt(a, ia); ia += 1; x }
              else { val x = valueAt(b, ib); ib += 1; x }
      if (below(v, theta) && (!any || v != last)) { cnt += 1; last = v; any = true }
    }
    scaleByTheta(cnt, theta)
  }

  /** |A ∩ B| estimate from two sketches (exact when neither filled). */
  def interEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val theta = sharedTheta(a, b)
    var ia = 0; var ib = 0; var cnt = 0L
    val na = nOf(a); val nb = nOf(b)
    while (ia < na && ib < nb) {
      val c = java.lang.Long.compareUnsigned(valueAt(a, ia), valueAt(b, ib))
      if (c < 0) ia += 1
      else if (c > 0) ib += 1
      else {
        if (below(valueAt(a, ia), theta)) cnt += 1
        ia += 1; ib += 1
      }
    }
    scaleByTheta(cnt, theta)
  }

  private def scaleByTheta(cnt: Long, theta: Long): Long =
    if (theta == -1L) cnt
    else {
      val t = frac(theta)
      if (t <= 0.0) cnt else StrictMath.round(cnt.toDouble / t)
    }
}
