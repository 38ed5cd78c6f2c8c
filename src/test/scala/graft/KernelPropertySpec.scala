package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kernels

/** Property-style checks over the codegen kernels: algebraic laws
  * (symmetry, bounds, determinism) that must hold on ARBITRARY input,
  * not just the corpus — regressions here break operators silently
  * because the oracles only exercise the synthetic tables. Inputs are
  * fixed-seed random so failures reproduce.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)
  private val rnd = new scala.util.Random(42)

  private def word(): String =
    (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def text(): String =
    (0 until rnd.nextInt(40)).map(_ => word()).mkString(" ")
  private def vec(n: Int): Array[Float] =
    Array.fill(n)(rnd.nextFloat() * 6.0f - 3.0f)

  test("pair_moments aggregate matches the explode reference, across " +
    "partials, serialization and merge") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val agg = graft.functions.PairMoments(
      BoundReference(0, ArrayType(LongType), nullable = true))
    val d = 5
    val rows = (1 to 50).map(_ => Array.fill(d)(rnd.nextInt(2000).toLong - 1000))
    val sums = Array.fill(d)(0L)
    val mom = Array.ofDim[Long](d, d)
    rows.foreach { q =>
      for (i <- 0 until d) {
        sums(i) += q(i)
        for (j <- i until d) mom(i)(j) += q(i) * q(j)
      }
    }
    val (h1, h2) = rows.splitAt(20)
    var buf1 = agg.createAggregationBuffer()
    h1.foreach(q => buf1 = agg.update(buf1, InternalRow(new GenericArrayData(q))))
    buf1 = agg.update(buf1, InternalRow(null)) // null rows are skipped
    var buf2 = agg.createAggregationBuffer()
    h2.foreach(q => buf2 = agg.update(buf2, InternalRow(new GenericArrayData(q))))
    val merged = agg.merge(
      agg.deserialize(agg.serialize(buf1)),
      agg.deserialize(agg.serialize(buf2)))
    val out = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val triples = (0 until out.numElements()).map { k =>
      val r = out.getStruct(k, 3); (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(triples.size == 1 + d + d * (d + 1) / 2)
    assert(triples.contains((-1L, -1L, rows.size.toLong)))
    for (i <- 0 until d) assert(triples.contains((i.toLong, -1L, sums(i))))
    for (i <- 0 until d; j <- i until d)
      assert(triples.contains((i.toLong, j.toLong, mom(i)(j))))
    // ragged input fails loudly
    intercept[IllegalArgumentException](
      agg.update(merged, InternalRow(new GenericArrayData(Array(1L, 2L)))))
  }

  test("alsServeTopk equals the sort-based (score desc, id asc) " +
    "reference, ties included") {
    for (_ <- 1 to 300) {
      val d = 4
      val uv = Array.fill(d)(rnd.nextInt(100).toLong - 50)
      val nItems = 1 + rnd.nextInt(30)
      // small tick range forces score ties; ids made unique like a catalog
      val items = (0 until nItems)
        .map(i => (rnd.nextInt(1000).toLong, Array.fill(d)(rnd.nextInt(4).toLong - 2)))
        .groupBy(_._1).map(_._2.head).toSeq
      val flat = items.flatMap { case (id, t) => id +: t.toSeq }.toArray
      val k = 1 + rnd.nextInt(6)
      val got = Kernels.alsServeTopk(
        new GenericArrayData(uv), new GenericArrayData(flat), k)
      val ref = items
        .map { case (id, t) =>
          (t.zip(uv).map { case (a, b) => a * b }.sum.toDouble, id) }
        .sortBy { case (s, id) => (-s, id) }.take(k)
      assert(got.numElements() == ref.size)
      ref.indices.foreach { r =>
        val row = got.getStruct(r, 2)
        assert(row.getDouble(0) == ref(r)._1 && row.getLong(1) == ref(r)._2,
          s"rank $r: got (${row.getDouble(0)}, ${row.getLong(1)}), want ${ref(r)}")
      }
    }
  }

  test("sortedJaccardGe agrees with the exact set-Jaccard threshold " +
    "on random sorted sets (early exit never rejects a true pair)") {
    for (_ <- 1 to 500) {
      val universe = (0 until 60).map(_ => rnd.nextInt(80).toLong)
      val a = universe.filter(_ => rnd.nextBoolean()).distinct.sorted.toArray
      val b = universe.filter(_ => rnd.nextBoolean()).distinct.sorted.toArray
      val i = a.toSet.intersect(b.toSet).size
      val u = a.length + b.length - i
      val exact = if (a.isEmpty || b.isEmpty) false
        else i.toDouble / u.toDouble >= 0.7
      val got = Kernels.sortedJaccardGe(
        new GenericArrayData(a), new GenericArrayData(b), 0.7)
      assert(got == exact, s"a=${a.toSeq} b=${b.toSeq} i=$i")
    }
    // identical sets pass at any bar; disjoint sets never do
    val s = Array(1L, 5L, 9L)
    assert(Kernels.sortedJaccardGe(new GenericArrayData(s), new GenericArrayData(s), 1.0))
    assert(!Kernels.sortedJaccardGe(
      new GenericArrayData(Array(1L)), new GenericArrayData(Array(2L)), 0.1))
  }

  test("sortedContainment over shingleHashSet is bit-identical to " +
    "ngramContainment on the same texts") {
    for (_ <- 1 to 300) {
      val (a, b) = (text(), text())
      val (ha, hb) = (Kernels.shingleHashSet(u(a), 3), Kernels.shingleHashSet(u(b), 3))
      assert(Kernels.sortedContainment(ha, hb) == Kernels.ngramContainment(u(a), u(b), 3))
      assert(Kernels.sortedContainment(hb, ha) == Kernels.ngramContainment(u(b), u(a), 3))
      // the set is sorted and distinct
      val arr = (0 until ha.numElements()).map(ha.getLong)
      assert(arr == arr.sorted && arr.toSet.size == arr.size)
    }
  }

  test("ngramJaccard is symmetric, bounded, and 1 on self") {
    for (_ <- 1 to 300) {
      val (a, b) = (text(), text())
      val ab = Kernels.ngramJaccard(u(a), u(b), 2)
      assert(ab == Kernels.ngramJaccard(u(b), u(a), 2))
      assert(ab >= 0.0 && ab <= 1.0)
      assert(Kernels.ngramJaccard(u(a), u(a), 2) == 1.0)
    }
  }

  test("stopwordHits matches the split-on-space + set-membership reference") {
    val en = Kernels.LangProfiles.head._2.toSet
    def ref(s: String): Int = s.split(" ", -1).count(en.contains)
    assert(Kernels.stopwordHits(u("the cat and the hat")) == 3)
    assert(Kernels.stopwordHits(u("")) == 0)
    // newline does NOT delimit: "the\nand" is one (non-stopword) token
    assert(Kernels.stopwordHits(u("the\nand of")) == 1)
    assert(Kernels.stopwordHits(u("  the  ")) == 1)
    for (_ <- 1 to 300) {
      val t = (0 until rnd.nextInt(30)).map(_ =>
        if (rnd.nextBoolean()) Kernels.LangProfiles.head._2(rnd.nextInt(10)) else word())
        .mkString(" ")
      assert(Kernels.stopwordHits(u(t)) == ref(t), s"input: '$t'")
    }
  }

  test("ngramContainment is bounded, 1 on self/superset, asymmetric") {
    val small = "alpha beta gamma delta epsilon"
    val big = s"prefix words here $small suffix words there"
    assert(Kernels.ngramContainment(u(small), u(small), 3) == 1.0)
    assert(Kernels.ngramContainment(u(small), u(big), 3) == 1.0,
      "all shingles of a substring document appear in its superset")
    assert(Kernels.ngramContainment(u(big), u(small), 3) < 1.0)
    assert(Kernels.ngramContainment(u(""), u(big), 3) == 0.0)
    for (_ <- 1 to 200) {
      val (a, b) = (text(), text())
      val c = Kernels.ngramContainment(u(a), u(b), 2)
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("charEntropy: 0 on uniform byte, ln(k) on k equally frequent bytes") {
    assert(Kernels.charEntropy(u("")) == 0.0)
    assert(Kernels.charEntropy(u("aaaaaaa")) == 0.0)
    val h2 = Kernels.charEntropy(u("abababab"))
    assert(math.abs(h2 - math.log(2.0)) < 1e-12)
    val h4 = Kernels.charEntropy(u("abcdabcdabcd"))
    assert(math.abs(h4 - math.log(4.0)) < 1e-12)
    for (_ <- 1 to 200) {
      val t = text()
      if (t.nonEmpty) {
        val h = Kernels.charEntropy(u(t))
        assert(h >= 0.0 && h <= math.log(256.0) + 1e-12)
      }
    }
  }

  test("minhash signatures are deterministic and length-k") {
    for (_ <- 1 to 100) {
      val a = text()
      val s1 = Kernels.minhash(u(a), 64, 3).toLongArray()
      val s2 = Kernels.minhash(u(a), 64, 3).toLongArray()
      assert(s1.sameElements(s2) && s1.length == 64)
    }
  }

  test("simhash is insensitive to token order (bag semantics)") {
    for (_ <- 1 to 200) {
      val ws = List.fill(10)(word())
      val a = Kernels.simhash64(u(ws.mkString(" ")))
      val b = Kernels.simhash64(u(ws.reverse.mkString(" ")))
      assert(a == b)
    }
  }

  test("winnow fingerprints are deterministic and non-empty past k chars") {
    for (_ <- 1 to 200) {
      val a = text()
      val f1 = Kernels.winnow(u(a), 4, 3).toLongArray()
      val f2 = Kernels.winnow(u(a), 4, 3).toLongArray()
      assert(f1.sameElements(f2))
      if (a.length >= 4) assert(f1.nonEmpty, s"'$a' must fingerprint")
    }
  }

  test("wordGrams(n=1) recovers exactly the whitespace tokens") {
    for (_ <- 1 to 300) {
      val a = text()
      val grams = Kernels.wordGrams(u(a), 1)
      val toks = a.split("[ \n\t\r]+").filter(_.nonEmpty).toSeq
      val got = (0 until grams.numElements()).map(i => grams.getUTF8String(i).toString)
      assert(got == toks)
    }
  }

  test("wordGrams(n) gram count and join structure") {
    for (_ <- 1 to 200) {
      val a = text()
      val n = 2 + rnd.nextInt(3)
      val toks = a.split("[ \n\t\r]+").filter(_.nonEmpty).toSeq
      val grams = Kernels.wordGrams(u(a), n)
      val expected = if (toks.length < n) 0 else toks.length - n + 1
      assert(grams.numElements() == expected)
      if (expected > 0)
        assert(grams.getUTF8String(0).toString == toks.take(n).mkString(" "))
    }
  }

  test("hyperplane weights are in [-1,1) and signature uses only low bits") {
    for (seed <- 1L to 50L) {
      val planes = Kernels.hyperplanes(seed, 8, 16)
      assert(planes.flatten.forall(w => w >= -1.0 && w < 1.0))
      val v = vec(16)
      val a = Kernels.hyperplaneSig(new GenericArrayData(v), 8, seed)
      val b = Kernels.hyperplaneSig(new GenericArrayData(v), 8, seed)
      assert(a == b)
      assert((a & ~0xFFL) == 0L, "only nPlanes low bits may be set")
    }
  }

  test("cosine is symmetric, bounded, NaN-free on nonzero input") {
    for (_ <- 1 to 300) {
      val (a, b) = (vec(8), vec(8))
      val x = new GenericArrayData(a)
      val y = new GenericArrayData(b)
      val ab = Kernels.cosineF(x, y)
      assert(ab == Kernels.cosineF(y, x))
      assert(!ab.isNaN && ab >= -1.0000001 && ab <= 1.0000001)
    }
  }

  test("zero/empty vectors give cosine 0, never NaN") {
    val z = new GenericArrayData(Array.fill(8)(0.0f))
    val v = new GenericArrayData(vec(8))
    assert(Kernels.cosineF(z, v) == 0.0)
    assert(Kernels.cosineF(z, z) == 0.0)
    val empty = new GenericArrayData(Array.empty[Float])
    assert(Kernels.cosineF(empty, empty) == 0.0)
  }
}
