package graft.functions

/** Deterministic 64-bit hashing kernels for the dedup/LSH hot paths.
  *
  * These run inside `mapPartitions` as tight JVM loops: the same logic
  * expressed as Catalyst higher-order functions evaluates one boxed
  * expression node per token×bit and measured ~50× slower (65 s for
  * SimHash over 500 docs vs <1 s here). Pure Scala arithmetic — no JVM-
  * or platform-dependent behavior, so results are reproducible across
  * runs, partitionings, and cluster sizes.
  */
object Hashing {

  private final val GOLDEN = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — strong avalanche over a 64-bit state. */
  def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-style string hash with splitmix finalization. */
  def hash64(s: String, seed: Long = 0L): Long = {
    var h = seed ^ 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i)) * 0x100000001B3L
      i += 1
    }
    mix(h)
  }

  /** Combine two hashes (band folding). */
  def mix2(a: Long, b: Long): Long = mix(a ^ (b + GOLDEN + (a << 6) + (a >>> 2)))

  /** Whitespace tokens (same semantics as TextFunctions.tokens). */
  def tokens(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Distinct word n-gram shingles (same semantics as
    * TextFunctions.shingles: short docs collapse to the whole text). */
  def shingleSet(text: String, n: Int): Array[String] = {
    val toks = tokens(text)
    if (toks.length >= n)
      toks.sliding(n).map(_.mkString(" ")).toArray.distinct
    else Array(toks.mkString(" "))
  }

  /** MinHash signature: k hash functions derived from one base hash per
    * shingle (h_i = mix(h ^ i*GOLDEN)), min over the set. */
  def minhash(shingles: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val base = hash64(shingles(s))
      var i = 0
      while (i < k) {
        val h = mix(base ^ (i * GOLDEN))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Fold a signature band into one bucket key. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rowsPerBand = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 1125899906842597L + b
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) { h = mix2(h, sig(j)); j += 1 }
      h
    }
  }

  /** 64-bit SimHash over a token array: per-bit +/-1 votes from each
    * token hash; sign of the vote becomes the bit. */
  def simhash64(toks: Array[String]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = hash64(toks(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Winnowing document fingerprints (the Schleimer/Wilkerson/Aiken
    * MOSS scheme): rolling polynomial hashes of character k-grams over
    * whitespace-normalized lowercase text; keep the MINIMUM hash of
    * each window of w consecutive k-grams (rightmost occurrence on
    * ties), deduplicating consecutive picks. Guarantee: any substring
    * match of length ≥ w + k - 1 contributes at least one shared
    * fingerprint, so fingerprint overlap is a substring-copy detector —
    * the rolling-hash tier of document fingerprinting next to the
    * token-set md5 (TextFunctions.fingerprint). */
  def winnow(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    val s = text.trim.toLowerCase.replaceAll("\\s+", " ")
    if (s.isEmpty) return Array.empty
    if (s.length < k) return Array(mix(hash64(s)))
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    val B = 1000003L
    var pow = 1L // B^(k-1)
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }
    winnowScan(hashes, w)
  }

  /** The winnow window scan over precomputed k-gram hashes: per
    * window, the minimum hash with the RIGHTMOST occurrence on ties,
    * deduplicating consecutive picks. Shared by the production
    * rolling-hash tier and the md5 certification twin so the scan
    * cannot drift between them. */
  private def winnowScan(hashes: Array[Long], w: Int): Array[Long] = {
    val n = hashes.length
    if (n <= w) {
      var min = 0
      var i = 1
      while (i < n) { if (hashes(i) <= hashes(min)) min = i; i += 1 }
      return Array(hashes(min))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPicked = -1
    var start = 0
    while (start <= n - w) {
      var min = start
      var j = start + 1
      while (j < start + w) { if (hashes(j) <= hashes(min)) min = j; j += 1 }
      if (min != lastPicked) { out += hashes(min); lastPicked = min }
      start += 1
    }
    out.toArray
  }

  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a 60-bit non-negative long — the
    * cross-engine hash family (identical to the SQL parse
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS UBIGINT)`). The first 15
    * hex nibbles ARE the digest's first 60 bits, so the value is the
    * big-endian first-8-bytes long shifted right 4 — no hex-string
    * round trip; the digest instance is thread-local (getInstance per
    * call dominated the per-k-gram cost of the winnow twin). */
  def md5Long60(s: String): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** [[winnow]] with the md5 hash family (the certification twin):
    * each k-gram hashes by [[md5Long60]] — pricier per byte than the
    * rolling hash but bit-replayable in ANSI SQL — through the SAME
    * window scan. Normalization pins Locale.ROOT lowercase so the
    * oracle's byte-wise lower() agrees on every input. */
  def winnowMd5(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    val s = text.trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
    if (s.isEmpty) return Array.empty
    if (s.length < k) return Array(md5Long60(s))
    val n = s.length - k + 1
    winnowScan(Array.tabulate(n)(i => md5Long60(s.substring(i, i + k))), w)
  }

  /** Exact Jaccard over two shingle arrays (sets). */
  def jaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    var inter = 0
    var i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    val union = sa.size + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
