package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind graft's custom Catalyst expressions. Static
  * (object) methods so generated code can call them directly via
  * Scala's static forwarders — they execute inside WholeStageCodegen
  * with no virtual dispatch or closure serialization.
  *
  * All hashing is deterministic: FNV-1a 64 over UTF-8 bytes +
  * splitmix64 finalization (public-domain constants), so signatures
  * are stable across runs, executors, and Spark versions.
  */
object Kernels {

  /** splitmix64 finalizer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a byte range. */
  def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes (big-endian) of MD5 over a byte range. MD5 — not
    * FNV — where a value must be recomputable by another engine: the
    * DuckDB oracle reconstructs it as two 32-bit halves via
    * `('0x' || substr(md5(t), 1|9, 8))::UBIGINT`.
    */
  def md5_64(bytes: Array[Byte], from: Int, until: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, from, until - from)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }

  /** First 6 bytes (48 bits, big-endian) of MD5 of a UTF-8 string —
    * exact in a double, so `h/2^48*2-1` is bit-identical across
    * engines.
    */
  def md5_48(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }

  /** Whitespace tokenizer over raw UTF-8 bytes; `hash` applied per
    * token byte-range.
    */
  private def tokenize(text: UTF8String, hash: (Array[Byte], Int, Int) => Long): Array[Long] = {
    val b = text.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    var start = -1
    while (i <= b.length) {
      val ws = i == b.length || b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r'
      if (ws) {
        if (start >= 0) { out += hash(b, start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  private def tokenHashes(text: UTF8String): Array[Long] = tokenize(text, fnv64)

  /** Hashes of word n-gram shingles (order-sensitive combine of token
    * hashes — no string re-materialization).
    */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val toks = tokenHashes(text)
    if (toks.length < n) return Array.empty
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < n) { h = mix64(h ^ toks(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  private val permCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  /** Per-permutation seeds mix64(0..k-1), memoized — they were being
    * recomputed for every shingle in the hot loop.
    */
  private def perms(k: Int): Array[Long] =
    permCache.computeIfAbsent(k, _ => Array.tabulate(k)(i => mix64(i.toLong)))

  /** k-permutation MinHash signature over word n-gram shingles. */
  def minhash(text: UTF8String, k: Int, n: Int): ArrayData = {
    val shingles = shingleHashes(text, n)
    val pm = perms(k)
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val base = shingles(s)
      var i = 0
      while (i < k) {
        val h = mix64(base ^ pm(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over whitespace tokens (unit weights). Token hash
    * is MD5-derived so the DuckDB oracle can recompute the exact
    * signature (and therefore exact Hamming distances) from the raw
    * table — the FNV path stays for hashes that never cross engines.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokenize(text, md5_64)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = toks(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Exact word n-gram Jaccard similarity between two texts. */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = new java.util.HashSet[java.lang.Long]()
    val sb = new java.util.HashSet[java.lang.Long]()
    shingleHashes(a, n).foreach(h => sa.add(h))
    shingleHashes(b, n).foreach(h => sb.add(h))
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  /** Exact word n-gram CONTAINMENT of a in b: |A ∩ B| / |A| over
    * shingle sets — the asymmetric near-superset signal (a quoted or
    * boilerplate-wrapped document scores high containment in its
    * superset while Jaccard stays low). 0.0 when a has no shingles.
    */
  def ngramContainment(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = new java.util.HashSet[java.lang.Long]()
    val sb = new java.util.HashSet[java.lang.Long]()
    shingleHashes(a, n).foreach(h => sa.add(h))
    shingleHashes(b, n).foreach(h => sb.add(h))
    if (sa.isEmpty) return 0.0
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / sa.size.toDouble
  }

  /** Shannon entropy (nats) of the BYTE distribution of a document —
    * the cheap gibberish/compressibility quality signal. Computed as
    * ln(N) − Σ n_c·ln(n_c) / N with the sum taken in ASCENDING byte
    * order, which the DuckDB oracle replicates with an ORDER BY c
    * list — float addition is order-sensitive, so the iteration
    * order IS part of the cross-engine contract. Bytes == characters
    * only for ASCII corpora (same documented bound as the t04
    * oracle).
    */
  def charEntropy(text: UTF8String): Double = {
    val b = text.getBytes
    if (b.length == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < b.length) { counts(b(i) & 0xFF) += 1; i += 1 }
    var s = 0.0
    var c = 0
    while (c < 256) {
      val n = counts(c)
      if (n > 0) s += n.toDouble * math.log(n.toDouble)
      c += 1
    }
    math.log(b.length.toDouble) - s / b.length.toDouble
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    * char k-gram rolling hashes, min per window of w (rightmost min),
    * consecutive duplicates collapsed. Returns the selected hashes.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val b = text.getBytes
    if (b.length < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = b.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hashes(i) = mix64(fnv64(b, i, i + k)); i += 1 }
    if (nGrams <= w) {
      var m = hashes(0); i = 1
      while (i < nGrams) { if (hashes(i) <= m) m = hashes(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](nGrams / w + 1)
    var last = -1
    i = 0
    while (i + w <= nGrams) {
      var mIdx = i
      var j = i + 1
      while (j < i + w) { if (hashes(j) <= hashes(mIdx)) mIdx = j; j += 1 }
      if (mIdx != last) { out += hashes(mIdx); last = mIdx }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Byte ranges (start, end) of whitespace-separated tokens. */
  private def tokenRanges(b: Array[Byte]): Array[(Int, Int)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int)](64)
    var i = 0
    var start = -1
    while (i <= b.length) {
      val ws = i == b.length || b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r'
      if (ws) {
        if (start >= 0) { out += ((start, i)); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /** Word n-gram STRINGS (tokens joined by a single space) — the
    * codegen'd replacement for building grams with `transform` +
    * `element_at` lambdas, which evaluate interpreted per element
    * (measured 10-40s per query at sf0.1). Gram strings are identical
    * to what the DuckDB oracles build with list_transform.
    */
  def wordGrams(text: UTF8String, n: Int): ArrayData = {
    val b = text.getBytes
    val toks = tokenRanges(b)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      var len = n - 1
      var k = 0
      while (k < n) { len += toks(i + k)._2 - toks(i + k)._1; k += 1 }
      val g = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        val (s, e) = toks(i + k)
        System.arraycopy(b, s, g, pos, e - s)
        pos += e - s
        if (k < n - 1) { g(pos) = ' '; pos += 1 }
        k += 1
      }
      out(i) = UTF8String.fromBytes(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Repetition profile: (total n-grams, most frequent n-gram, its
    * count) with ties broken toward the binary-smallest gram — one
    * hash-count pass per document, no sort, no shuffle. Returns null
    * for documents with fewer than n tokens.
    */
  def repetitionTop(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val grams = wordGrams(text, n)
    val total = grams.numElements()
    if (total == 0) return null
    val counts = new java.util.HashMap[UTF8String, Int](total * 2)
    var i = 0
    while (i < total) {
      val g = grams.getUTF8String(i)
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    var bestG: UTF8String = null
    var bestN = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestN ||
        (e.getValue == bestN && e.getKey.compareTo(bestG) < 0)) {
        bestN = e.getValue
        bestG = e.getKey
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total.toLong, bestG, bestN.toLong))
  }

  /** Per-language stopword profiles for the language-ID heuristic —
    * tiny closed-class word lists, the standard cheap langid signal.
    * Canonical copy here so the t01 kernel, the t02 builtin path, and
    * the DuckDB oracles stay in lock-step.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"),
    "it" -> Seq("il", "di", "che", "la", "e", "per", "un", "del", "con", "le"),
  )

  private lazy val langNames: Array[UTF8String] =
    LangProfiles.map(p => UTF8String.fromString(p._1)).toArray
  private lazy val langSets: Array[java.util.HashSet[UTF8String]] =
    LangProfiles.map { case (_, ws) =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** Language ID: stopword-hit ratio per profile over lowercased
    * whitespace tokens. The whitespace set is RE2's \s — [ \t\n\f\r],
    * deliberately NOT Java's (which adds \x0B) — because the DuckDB
    * oracle tokenizes with RE2 regexp_split_to_array(text, '\s+') and
    * the signatures must agree byte-for-byte. Returns
    * struct(lang, score) for the best profile, ties to the larger
    * lang string (array_max-over-structs semantics, which the oracle
    * replicates with list_max). One pass, no per-element lambdas.
    */
  def langidTop(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = text.toLowerCase.getBytes
    val nLangs = langNames.length
    val hits = new Array[Int](nLangs)
    var total = 0
    var i = 0
    var start = -1
    while (i <= b.length) {
      val ws = i == b.length || b(i) == ' ' || b(i) == '\n' || b(i) == '\t' ||
        b(i) == '\r' || b(i) == 0x0C
      if (ws) {
        if (start >= 0) {
          val tok = UTF8String.fromBytes(b, start, i - start)
          total += 1
          var l = 0
          while (l < nLangs) { if (langSets(l).contains(tok)) hits(l) += 1; l += 1 }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    val den = math.max(total, 1).toDouble
    var bestL: UTF8String = null
    var bestS = -1.0
    var l = 0
    while (l < nLangs) {
      val s = hits(l) / den
      if (s > bestS || (s == bestS && (bestL == null || langNames(l).compareTo(bestL) > 0))) {
        bestS = s
        bestL = langNames(l)
      }
      l += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestL, bestS))
  }

  /** Count of single-space-delimited tokens hitting the English
    * stopword profile ([[LangProfiles]] head) — the t02 quality signal
    * in ONE byte pass. Split semantics deliberately match
    * `split(text, ' ')` / DuckDB `string_split`: ONLY the space byte
    * delimits (a token containing a newline stays one token), and
    * empty tokens can't hit. The HOF formulation
    * (`filter(toks, t => array_contains(...))`) evaluates interpreted
    * per token — the measured t02 cost this kernel removes.
    */
  def stopwordHits(text: UTF8String): Int = {
    val b = text.getBytes
    val set = langSets(0)
    var hits = 0
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        if (i > start) {
          val tok = UTF8String.fromBytes(b, start, i - start)
          if (set.contains(tok)) hits += 1
        }
        start = i + 1
      }
      i += 1
    }
    hits
  }

  /** The SORTED DISTINCT shingle-hash set of a document (r17): the
    * exact hash universe [[ngramContainment]]/[[ngramJaccard]] build
    * per CALL, materialized once per document so per-pair verify
    * kernels become linear merges instead of re-tokenizing both
    * texts for every candidate pair.
    */
  def shingleHashSet(text: UTF8String, n: Int): ArrayData = {
    val hs = shingleHashes(text, n)
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted array
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hs, w))
  }

  /** Containment |A ∩ B| / |A| over two sorted distinct hash arrays —
    * BIT-IDENTICAL to [[ngramContainment]] on the same documents
    * (that kernel already counts over the fnv64/mix64 shingle-hash
    * sets; this one just takes them precomputed and merges instead of
    * hashing per pair).
    */
  def sortedContainment(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / na.toDouble
  }

  /** Jaccard ≥ t pre-filter over two SORTED DISTINCT long arrays
    * (r17, the d15 verify kernel): one linear merge counts the
    * intersection with an early abort as soon as even matching every
    * remaining element cannot reach t. `needed` floors the true
    * minimum intersection (t·(na+nb)/(1+t)), so the abort is strictly
    * permissive; the final compare is the exact same double division
    * the SQL filter uses. Callers rely on the superset theorem
    * (merging elements by hash only RAISES set Jaccard), so a true
    * string-Jaccard ≥ t pair can never be rejected here.
    */
  def sortedJaccardGe(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return false
    val needed = math.floor(t * (na + nb) / (1.0 + t)).toInt
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < needed) return false
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c.toDouble / (na + nb - c).toDouble >= t
  }

  /** Item-kNN neighborhood serve for one customer (r17, the s32
    * serve leg): `rated` is the customer's (item, rating) list,
    * `nbrs` the whole model's (i, j, simt) neighbor rows SORTED BY i
    * (vocabulary × M rows — broadcast once). Accumulates
    * score(j) = Σ_{i rated} r(c,i)·simt(i,j) over unrated j only and
    * returns the top k by (score desc, id asc) — the same exclusion,
    * total order and struct<score double, id bigint> shape as the
    * declarative expand → packed-key aggregate → anti-join →
    * top_k_by_score chain it replaces (row-identical; scores are
    * exact integers < 2⁵³, so double accumulation in any order is
    * exact — the module's documented serve-headroom bound).
    */
  def itemKnnServe(rated: ArrayData, nbrs: ArrayData, k: Int): ArrayData = {
    val nr = rated.numElements()
    val nn = nbrs.numElements()
    if (nr == 0 || nn == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val ritems = new Array[Long](nr)
    val rvals = new Array[Double](nr)
    var x = 0
    while (x < nr) {
      val st = rated.getStruct(x, 2)
      ritems(x) = st.getLong(0)
      rvals(x) = st.getDouble(1)
      x += 1
    }
    val sortedRated = ritems.clone()
    java.util.Arrays.sort(sortedRated)
    val acc = new java.util.HashMap[Long, java.lang.Double]()
    x = 0
    while (x < nr) {
      val i0 = ritems(x)
      val rv = rvals(x)
      // first neighbor row of item i0 (nbrs sorted by i)
      var lo = 0
      var hi = nn
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (nbrs.getStruct(mid, 3).getLong(0) < i0) lo = mid + 1 else hi = mid
      }
      var p = lo
      var more = true
      while (more && p < nn) {
        val st = nbrs.getStruct(p, 3)
        if (st.getLong(0) != i0) more = false
        else {
          val j = st.getLong(1)
          if (java.util.Arrays.binarySearch(sortedRated, j) < 0) {
            val add = rv * st.getLong(2).toDouble
            val cur = acc.get(j)
            acc.put(j, if (cur == null) add else cur + add)
          }
          p += 1
        }
      }
      x += 1
    }
    // bounded insertion top-k by (score desc, id asc)
    val ss = new Array[Double](k)
    val ids = new Array[Long](k)
    var m = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val id = e.getKey.longValue()
      val sc = e.getValue.doubleValue()
      if (m < k || sc > ss(m - 1) || (sc == ss(m - 1) && id < ids(m - 1))) {
        var pos = if (m < k) m else k - 1
        while (pos > 0 && (sc > ss(pos - 1) ||
            (sc == ss(pos - 1) && id < ids(pos - 1)))) {
          ss(pos) = ss(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        ss(pos) = sc; ids(pos) = id
        if (m < k) m += 1
      }
    }
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      out(r) = org.apache.spark.sql.catalyst.InternalRow(ss(r), ids(r)); r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Top-k factor-model serve over a flattened item matrix (r17).
    *
    * `uv` is one user's rank-d tick vector; `items` is the whole
    * catalog flattened to stride d+1: [id, t_0..t_{d-1}, id, ...].
    * Scores every item with an exact long dot product and keeps the
    * top k by (score desc, id asc) via bounded insertion — the SAME
    * total order and output struct<score double, id bigint> shape as
    * [[TopKByScore]], so the declarative serve (users × catalog cross
    * join into the heap aggregate) and this kernel are row-identical.
    * Scores are exact longs < 2³⁴ (clamped ±2¹⁶ factor ticks at
    * rank 4), so the double compare IS the long compare.
    */
  def alsServeTopk(uv: ArrayData, items: ArrayData, k: Int): ArrayData = {
    val d = uv.numElements()
    val u = new Array[Long](d)
    var x = 0
    while (x < d) { u(x) = uv.getLong(x); x += 1 }
    val stride = d + 1
    val n = items.numElements() / stride
    val ss = new Array[Double](k)
    val ids = new Array[Long](k)
    var m = 0
    var idx = 0
    var base = 0
    while (idx < n) {
      val id = items.getLong(base)
      var s = 0L
      var j = 0
      while (j < d) { s += u(j) * items.getLong(base + 1 + j); j += 1 }
      val sc = s.toDouble
      // beats(m-1): (sc, id) sorts strictly before the current last
      if (m < k || sc > ss(m - 1) || (sc == ss(m - 1) && id < ids(m - 1))) {
        var pos = if (m < k) m else k - 1
        while (pos > 0 && (sc > ss(pos - 1) ||
            (sc == ss(pos - 1) && id < ids(pos - 1)))) {
          ss(pos) = ss(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        ss(pos) = sc; ids(pos) = id
        if (m < k) m += 1
      }
      idx += 1
      base += stride
    }
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      out(r) = org.apache.spark.sql.catalyst.InternalRow(ss(r), ids(r)); r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Dot product of two float vectors, accumulated in double. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Cosine similarity of two float vectors (double accumulation;
    * norm product, not sqrt-of-product, for oracle bit-parity).
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hyperplane weight matrix for (seed, nPlanes, dim), built once per
    * JVM and memoized: w(p,j) = md5_48(s"seed:p:j")/2^48*2-1 — uniform
    * in [-1,1), exactly reproducible in SQL (DuckDB builds the same
    * matrix from md5 hex), and cached so the per-row signature cost is
    * pure dot products, no hashing.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Cap on memoized weight matrices: keys are user-supplied
    * (seed, nPlanes, dim) triples, so an unbounded cache would grow
    * for the executor JVM lifetime under ad-hoc calls. Past the cap,
    * new triples compute on the fly (cheap: md5 per weight) instead
    * of evicting — the library's own operators use 2 triples total.
    */
  private val MaxPlaneCacheEntries = 64

  def hyperplanes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val key = s"$seed:$nPlanes:$dim"
    val cached = planeCache.get(key)
    if (cached != null) return cached
    val built = Array.tabulate(nPlanes, dim) { (p, j) =>
      (md5_48(s"$seed:$p:$j").toDouble / (1L << 48).toDouble) * 2.0 - 1.0
    }
    if (planeCache.size < MaxPlaneCacheEntries) planeCache.putIfAbsent(key, built)
    built
  }

  /** Random-hyperplane LSH signature: nPlanes sign bits packed into a
    * long. Deterministic across runs, executors, and engines (weights
    * are md5-derived, see [[hyperplanes]]); no broadcast state.
    */
  def hyperplaneSig(v: ArrayData, nPlanes: Int, seed: Long): Long = {
    val dim = v.numElements()
    val ws = hyperplanes(seed, nPlanes, dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val w = ws(p)
      var dot = 0.0
      var j = 0
      while (j < dim) {
        dot += w(j) * v.getFloat(j).toDouble
        j += 1
      }
      if (dot >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Per-band hyperplane LSH values: band b packs the sign bits of
    * planes p = b*bits .. b*bits + bits-1 (bit j of band b is plane
    * b*bits + j, weights from the SAME md5-derived family as
    * [[hyperplaneSig]]) — so for bands*bits <= 64 the output is
    * exactly the unpacked bands of the packed signature. Unlike the
    * single-long packing, total plane count is unbounded (only the
    * per-band value must fit a long), which is what lets bits-per-band
    * be DERIVED from corpus size instead of capped at 64/bands.
    */
  def hyperplaneBands(v: ArrayData, bands: Int, bits: Int, seed: Long): ArrayData = {
    val dim = v.numElements()
    val ws = hyperplanes(seed, bands * bits, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bv = 0L
      var j = 0
      while (j < bits) {
        val w = ws(b * bits + j)
        var dot = 0.0
        var d = 0
        while (d < dim) {
          dot += w(d) * v.getFloat(d).toDouble
          d += 1
        }
        if (dot >= 0.0) bv |= (1L << j)
        j += 1
      }
      out(b) = bv
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Rolling window hashes for span-level dedup: one 48-bit
    * md5-derived hash per w-token window (tokens joined by a single
    * space — the md5_48 construction DuckDB replicates as
    * `('0x' || substr(md5(s),1,12))::UBIGINT`). n-w+1 hashes for n
    * tokens; empty for n < w.
    */
  def windowHashes(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](math.max(n - w + 1, 0))
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = md5_48(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Squared L2 distance between two float vectors, accumulated in
    * ascending index order in doubles — the cross-engine contract
    * twin of `list_sum(list_transform(range, i -> (a[i]-b[i])^2))`
    * (same order, same operations, identical doubles).
    */
  def l2SqF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"l2_sq: dim mismatch ${b.numElements()} vs $n")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** array<tinyint> → binary, one byte per element: the persisted SQ8
    * codes layout (dim bytes per vector — parquet stores BINARY as
    * raw bytes, where array<tinyint> would round-trip through the
    * INT32 physical type).
    */
  def int8Pack(a: ArrayData): Array[Byte] = a.toByteArray()

  /** binary → array<tinyint>: inverse of [[int8Pack]]. */
  def int8Unpack(b: Array[Byte]): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(b)
}
