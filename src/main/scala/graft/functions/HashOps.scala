package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hashing kernels used by the fingerprint / dedup /
  * similarity Expressions. Plain static-forwarder methods so Janino-
  * generated code can call them directly (`graft.functions.HashOps.x`)
  * from inside WholeStageCodegen — one static call per row, loop body
  * JIT-compiled.
  *
  * All constants are public-domain standards: FNV-1a 64-bit offset
  * basis/prime, SplitMix64 from Steele et al. "Fast Splittable
  * Pseudorandom Number Generators" (OOPSLA 2014).
  */
object HashOps {

  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** FNV-1a 64 of a string's UTF-8 bytes — the row-hash primitive for
    * order-independent table checksums.
    */
  def fnvText(s: UTF8String): Long = {
    val b = s.getBytes
    fnv1a64(b, 0, b.length)
  }

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit SimHash over whitespace-separated tokens: each token's
    * FNV-1a hash votes ±1 per bit; the sign of each vote total forms
    * the signature (Charikar, STOC 2002).
    */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        val h = fnv1a64(bytes, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  /** Winnowing-style fingerprint: minimum Rabin-Karp rolling hash
    * over all `window`-byte substrings (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003). Documents sharing any window hash collide on min
    * with high probability for near-identical prefixes/suffixes.
    */
  def rollingMin(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    val base = 257L
    // base^(w-1) for the remove-leading-byte step
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * base + (bytes(i) & 0xffL); i += 1 }
    var minH = splitmix64(h)
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * base + (bytes(i) & 0xffL)
      val m = splitmix64(h)
      if (m < minH) minH = m
      i += 1
    }
    minH
  }

  /** Per-permutation multipliers/addends (odd SplitMix64 outputs) for
    * the universal-hash permutation family `a*h + b`. Cached per
    * permutation count (tiny; at most a few entries per JVM).
    */
  private val permCoefs =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coefsFor(perms: Int): (Array[Long], Array[Long]) =
    permCoefs.computeIfAbsent(perms, { p =>
      val a = new Array[Long](p); val b = new Array[Long](p)
      var i = 0
      while (i < p) {
        a(i) = splitmix64(0x5eed0000L + i) | 1L // odd → bijective mod 2^64
        b(i) = splitmix64(0xbeef0000L + i)
        i += 1
      }
      (a, b)
    })

  /** MinHash signature over `k`-byte character shingles with `perms`
    * universal-hash permutations `a_i*h + b_i` over 2^64 (Broder,
    * SEQUENCES 1997). One pass over shingles; 2 ops per permutation
    * in the inner loop.
    */
  def minhashSig(s: UTF8String, k: Int, perms: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val sig = new Array[Long](perms)
    val (as, bs) = coefsFor(perms)
    if (n < k) {
      val h = fnv1a64(bytes, 0, n)
      var p = 0
      while (p < perms) { sig(p) = as(p) * h + bs(p); p += 1 }
      return new GenericArrayData(sig)
    }
    // r17 kernel shape (identical signatures, measured ~10% faster on
    // the bench corpus): shingle hashes collect once into a plain
    // contiguous array, then the permutation loop runs OUTER with the
    // min in a register — no per-step sig(p) load/store, and the
    // inner mul+min reduction over a contiguous long array is the
    // shape C2 vectorizes. (A deduplicating hash-set variant was also
    // measured and LOST — the set upkeep costs more than duplicate
    // shingles save on ~300-byte documents.) Same fnv1a64, same
    // coefficient family ⇒ bit-identical output.
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = fnv1a64(bytes, i, i + k); i += 1 }
    var p = 0
    while (p < perms) {
      val a = as(p)
      val b = bs(p)
      var min = Long.MaxValue
      var j = 0
      while (j < m) {
        val v = a * hs(j) + b
        if (v < min) min = v
        j += 1
      }
      sig(p) = min
      p += 1
    }
    new GenericArrayData(sig)
  }

  /** Fraction of equal positions in two equal-length long arrays —
    * the banded-MinHash Jaccard estimate.
    */
  def sigMatchFrac(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Sign-random-projection bucket: bit j is the sign of the dot
    * product with pseudo-random hyperplane j, whose coefficients are
    * SplitMix64-derived from (element index, plane) — deterministic
    * on any cluster, no stored model (Charikar, STOC 2002).
    */
  def srpBucket(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val c = ((splitmix64(i.toLong * 1315423911L + j) & 0xffffL).toDouble / 32768.0) - 1.0
        dot += vec.getFloat(i) * c
        i += 1
      }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Whitespace word bigrams ("tok1 tok2" strings) — the per-row hot
    * loop of corpus n-gram statistics. Tokenization matches
    * split(trim(s), "\\s+") exactly (same java.util.regex class the
    * SQL split uses), so the DuckDB oracle tokenizes identically.
    */
  def wordBigrams(s: UTF8String): ArrayData = {
    val toks = s.toString.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct space-joined word n-grams (insertion order —
    * deterministic); empty when the text has fewer than n tokens.
    */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL space-joined word n-grams in token order (duplicates kept,
    * array index = token position) — the occurrence-level variant of
    * [[wordNgrams]] for duplicate-span statistics; empty when the
    * text has fewer than n tokens.
    */
  def wordNgramsAll(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Probe-side segment candidate keys for
    * [[graft.ops.Reconcile.fuzzyJoinSegments]]: for each candidate
    * right-length L in [len−τ, len+τ] and each of the τ+1 segment
    * slots, the probe substring at every admissible shift — the
    * (2τ+1)²·(τ+1) key fan-out, deduplicated in insertion order.
    * Replaces a 75-`when` (τ=2) column-DSL tree whose analysis,
    * optimizer passes, task-binary serialization and codegen each
    * paid for every node on every run (measured: the whole fixed cost
    * of q_fuzzy_join2 was dominated by it); the arithmetic below is
    * the same segStart/segLen geometry, element for element, and a
    * spec pins kernel == DSL on random strings.
    */
  def segmentProbeKeys(s: UTF8String, tau: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val k = tau + 1
    val m = s.numChars()
    val seen = new java.util.LinkedHashMap[(Int, Int, UTF8String), AnyRef]()
    var dl = -tau
    while (dl <= tau) {
      val L = m + dl
      if (L >= 0) {
        val r = L % k
        val base = (L - r) / k
        var i = 0
        while (i < k) {
          val start = base * i + math.max(i - (k - r), 0) + 1
          val len = base + (if (i >= k - r) 1 else 0)
          var d = -tau
          while (d <= tau) {
            val p = start + d
            if (p >= 1 && p + len - 1 <= m) {
              val seg = s.substringSQL(p, len)
              seen.putIfAbsent((L, i, seg), java.lang.Boolean.TRUE)
            }
            d += 1
          }
          i += 1
        }
      }
      dl += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.keySet().iterator()
    var j = 0
    while (it.hasNext) {
      val (l0, i0, seg) = it.next()
      out(j) = new GenericInternalRow(Array[Any](l0, i0, seg))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct character n-grams of a string (insertion order —
    * deterministic). Whole string as single gram when shorter than n.
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val seen = new java.util.LinkedHashSet[String]()
    if (str.length < n) seen.add(str)
    else {
      var i = 0
      while (i <= str.length - n) {
        seen.add(str.substring(i, i + n))
        i += 1
      }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  // ---- bucket pair generation (one static call per LSH bucket) ----
  // Struct-building inside nested higher-order-function lambdas makes
  // Spark regenerate an UnsafeProjection per evaluation (measured:
  // 1000s+ in GenerateUnsafeProjection on one task). These kernels
  // take the bucket's collect_list array and emit the qualifying
  // pairs in a single call, thresholds applied inside.

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** items: Array[Struct(id: Long, sig: Array[Long])] →
    * Array[Struct(id_a, id_b, est: Double)] with est ≥ minEst.
    */
  def minhashPairs(items: ArrayData, minEst: Double): ArrayData = {
    val n = items.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sigs(i) = row.getArray(1).toLongArray()
      i += 1
    }
    val out = Vector.newBuilder[InternalRow]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = sigs(i); val b = sigs(j)
        var eq = 0
        var k = 0
        while (k < a.length) { if (a(k) == b(k)) eq += 1; k += 1 }
        val est = eq.toDouble / a.length
        if (est >= minEst) {
          val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
          out += new GenericInternalRow(Array[Any](lo, hi, est))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  /** items: Array[Struct(id: Long, sig: Long)] →
    * Array[Struct(id_a, id_b, hamming: Long)] with hamming ≤ maxHam.
    */
  def simhashPairs(items: ArrayData, maxHam: Int): ArrayData = {
    val n = items.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sigs(i) = row.getLong(1)
      i += 1
    }
    val out = Vector.newBuilder[InternalRow]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val ham = java.lang.Long.bitCount(sigs(i) ^ sigs(j)).toLong
        if (ham <= maxHam) {
          val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
          out += new GenericInternalRow(Array[Any](lo, hi, ham))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  /** items: Array[Struct(id: Long, v: Array[Float])] →
    * Array[Struct(id_a, id_b, cos: Double)] with cos ≥ minCos.
    */
  def cosinePairs(items: ArrayData, minCos: Double): ArrayData = {
    val n = items.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = row.getArray(1).toFloatArray()
      i += 1
    }
    val out = Vector.newBuilder[InternalRow]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = vecs(i); val b = vecs(j)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var k = 0
        while (k < a.length) {
          val x = a(k).toDouble; val y = b(k).toDouble
          dot += x * y; na += x * x; nb += y * y
          k += 1
        }
        val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos >= minCos) {
          val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
          out += new GenericInternalRow(Array[Any](lo, hi, cos))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  /** Nearest-centroid cell id: argmax over the (small, driver-
    * materialized) centroid set of [[cosine]], ties to the LARGER cid
    * — exactly `max(struct(cos, cid))`, which is what the IVF oracle
    * replicates. Comparison uses `java.lang.Double.compare`, which
    * orders NaN above every value and -0.0 below 0.0 — the SAME total
    * order Spark's double ordering (and hence `max(struct(...))`)
    * uses, so a NaN-cosine centroid wins here exactly when it would
    * win in the groupBy/max formulation. One static call per row ⇒
    * corpus→cell assignment is a map-only projection with zero
    * shuffle (the shape that survives 100 TB; the centroid matrix is
    * a few KB of broadcast-task state).
    */
  def nearestCentroid(vec: ArrayData, cids: Array[Long], cents: Array[Array[Float]]): Long = {
    var bestCos = Double.NegativeInfinity
    var bestCid = Long.MinValue
    var first = true
    var c = 0
    while (c < cids.length) {
      val b = cents(c)
      val n = math.min(vec.numElements(), b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = vec.getFloat(i).toDouble
        val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (first || cmp > 0 || (cmp == 0 && cids(c) > bestCid)) {
        bestCos = cos
        bestCid = cids(c)
        first = false
      }
      c += 1
    }
    bestCid
  }

  /** Product-quantization encode (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", IEEE TPAMI 2011): subspace `j` of
    * `m` covers dims [j·ds, (j+1)·ds) with ds = D/m; the code is the
    * index of the codebook row whose subvector minimizes squared L2
    * distance (double accumulation, ascending dims; ties and NaN
    * distances resolve to the SMALLEST index — `Double.compare` treats
    * NaN as +∞, so a NaN distance never beats a finite one). Codes
    * pack 4 bits each (codebook ≤ 16 rows), LSB-first — a 64-dim
    * vector compresses to one long (64×: 256 B of floats → 8 B).
    */
  def pqEncode(vec: ArrayData, book: Array[Array[Float]], m: Int): Long = {
    val d = vec.numElements()
    val ds = d / m
    var packed = 0L
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.PositiveInfinity
      var b = 0
      while (b < book.length) {
        val cw = book(b)
        val end = math.min((j + 1) * ds, math.min(d, cw.length))
        var dist = 0.0
        var i = j * ds
        while (i < end) {
          val diff = vec.getFloat(i).toDouble - cw(i).toDouble
          dist += diff * diff
          i += 1
        }
        if (java.lang.Double.compare(dist, bestDist) < 0) {
          bestDist = dist; best = b
        }
        b += 1
      }
      packed |= best.toLong << (4 * j)
      j += 1
    }
    packed
  }

  /** Asymmetric-distance (ADC) approximate dot product: decode each
    * 4-bit code to its codebook subvector and accumulate
    * query[i]·codeword[i] ascending over the FULL dimension range —
    * bit-identical to a plain [[cosine]]-style dot of the query
    * against the reconstructed vector, which is what the oracle
    * computes.
    */
  def pqAdc(packed: Long, q: ArrayData, book: Array[Array[Float]], m: Int): Double = {
    val d = book(0).length
    val ds = d / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      val cw = book(((packed >>> (4 * j)) & 15L).toInt)
      val end = math.min((j + 1) * ds, math.min(d, q.numElements()))
      var i = j * ds
      while (i < end) {
        acc += q.getFloat(i).toDouble * cw(i).toDouble
        i += 1
      }
      j += 1
    }
    acc
  }

  /** Cosine similarity of two float vectors (0.0 when either norm is
    * 0). Fixed left-to-right accumulation order → bit-deterministic.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Index of `v`'s bucket given ascending `bounds`: the count of
    * boundary values strictly below `v` (binary search). Monotone in
    * `v` and equal values share a bucket — the two properties the
    * two-phase exact-percentile decomposition needs; the boundary
    * VALUES only affect balance, never correctness.
    */
  def bucketIndex(v: Double, bounds: ArrayData): Int = {
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds.getDouble(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Parsed marker-set memo. Keys come from `WordSetHits`'s marker
    * argument, which the kernel requires to be a FOLDABLE literal —
    * so the population is bounded by the number of distinct marker
    * literals in compiled plans (langId contributes 4). The cap is a
    * backstop against a caller that violates that contract with
    * dynamic strings: on overflow ONE entry is evicted (r9 advice —
    * the earlier wholesale clear() meant >MaxMarkerSets live markers
    * re-parsed EVERY call, thrashing per row). Eviction is arbitrary-
    * victim rather than strict LRU deliberately: this is a PER-ROW
    * hot path, and an access-ordered map would trade lock-free
    * ConcurrentHashMap reads for a contended lock across all 32
    * executor threads. Eviction only costs re-parsing a tiny
    * pipe-separated list, never correctness.
    */
  private val MaxMarkerSets = 256
  private val markerCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()

  /** Count of maximal word-character runs ([a-zA-Z0-9_], Java regex
    * `\w`) of `s` that are members of the pipe-separated `markers`
    * set — exactly `regexp_extract_all(s, "\\b(w1|w2|…)\\b").size`
    * for plain-word alternations (a `\b`-bounded match of a whole
    * word is precisely a maximal run equal to that word), without the
    * regex engine. Marker sets are tiny and cached per distinct
    * marker string.
    */
  def wordSetHits(s: UTF8String, markers: String): Long = {
    val set = {
      val hit = markerCache.get(markers)
      if (hit != null) hit
      else {
        // miss path only: evict one arbitrary victim at the cap so a
        // contract-violating caller degrades to bounded re-parsing,
        // never a full-cache flush per call
        if (markerCache.size() >= MaxMarkerSets) {
          val it = markerCache.keySet().iterator()
          if (it.hasNext) markerCache.remove(it.next())
        }
        markerCache.computeIfAbsent(
          markers,
          m => {
            val hs = new java.util.HashSet[String]()
            m.split("\\|").foreach(w => if (w.nonEmpty) hs.add(w))
            hs
          })
      }
    }
    val str = s.toString
    def isWord(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    var hits = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      if (isWord(str.charAt(i))) {
        var j = i + 1
        while (j < len && isWord(str.charAt(j))) j += 1
        if (set.contains(str.substring(i, j))) hits += 1
        i = j
      } else i += 1
    }
    hits
  }

  /** Exact character-n-gram set Jaccard of two strings in one pass —
    * |A∩B| / |A∪B| over the same distinct-gram sets [[charNgrams]]
    * builds (len < n ⇒ the whole string is the one gram). Equivalent
    * to `array_intersect/array_union` over materialized gram arrays,
    * but the gram ARRAYS never exist: the candidate join shuffles raw
    * text (~16× smaller than an unsafe array of n-gram strings) and
    * this kernel verifies in the post-join projection.
    */
  def ngramJaccardSim(a: UTF8String, b: UTF8String, n: Int): Double = {
    def gramSet(u: UTF8String): java.util.HashSet[String] = {
      val str = u.toString
      val s = new java.util.HashSet[String]()
      if (str.length < n) s.add(str)
      else {
        var i = 0
        while (i <= str.length - n) { s.add(str.substring(i, i + n)); i += 1 }
      }
      s
    }
    val sa = gramSet(a)
    val sb = gramSet(b)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Type/token stats in ONE per-row pass:
    * `[n_tokens, n_types, n_hapax, Σc(c−1)]` over space-separated
    * tokens (empty tokens from repeated spaces dropped — the
    * `split(text, " ")` + filter semantics). Replaces nested
    * `filter`/`aggregate` HOF lambdas, which Catalyst interprets
    * per-element (O(types×tokens) interpreted calls per row — the §5
    * lesson); the count map is vocabulary-bounded per doc.
    */
  def typeTokenVec(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new java.util.HashMap[String, Array[Long]]()
    var nTokens = 0L
    var start = 0
    val len = str.length
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) {
          nTokens += 1
          val tok = str.substring(start, i)
          val slot = counts.get(tok)
          if (slot == null) counts.put(tok, Array(1L)) else slot(0) += 1
        }
        start = i + 1
      }
      i += 1
    }
    var hapax = 0L
    var simpson = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c == 1L) hapax += 1
      simpson += c * (c - 1)
    }
    new GenericArrayData(Array(nTokens, counts.size.toLong, hapax, simpson))
  }

  /** Character-level stats in ONE per-row pass:
    * `[n_chars, distinct_chars, Σc², n_printable]` (code-point
    * counts; printable = ASCII 0x20–0x7E). Replaces a per-char
    * explode + (doc, char) shuffle — 100×-the-corpus shuffle rows —
    * with a map-only projection; all values are exact integers, so
    * the cross-engine oracle is unchanged. The count map is
    * alphabet-bounded (≤ distinct code points per doc).
    */
  /** One greedy left-to-right BPE merge pass: every non-overlapping
    * adjacent (a, b) symbol pair in `syms` collapses to its
    * concatenation, scanning left to right (so "aaa" under (a,a)
    * becomes [aa, a], and consumed positions never re-match — the
    * standard BPE application order, identical to the SQL oracle's
    * alternation-within-runs formulation). One pass, no allocation
    * beyond the output array.
    */
  def bpeMergeApply(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && a.equals(syms.getUTF8String(i)) &&
          b.equals(syms.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def charStatsVec(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    var printable = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp >= 0x20 && cp <= 0x7e) printable += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
    }
    var sumC2 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); sumC2 += c * c }
    new GenericArrayData(Array(n, counts.size.toLong, sumC2, printable))
  }
}
