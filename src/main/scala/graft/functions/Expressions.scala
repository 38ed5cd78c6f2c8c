package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the vector/text kernels Spark
  * lacks. Each generates a direct static call into
  * [[graft.functions.Kernels]] so it stays inside WholeStageCodegen —
  * the preferred extension point before UDFs (SURVEY §2 infra).
  */

/** cosine_sim(array<float>, array<float>) → double */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_product(array<float>, array<float>) → double */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** als_serve_topk(uv: array<bigint>, items: array<bigint>, k) →
  * array<struct<score: double, id: bigint>>: one user's top-k catalog
  * serve off a flattened item matrix — see
  * [[graft.functions.Kernels.alsServeTopk]] for the exact-ordering
  * contract shared with [[TopKByScore]].
  */
case class AlsServeTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0, s"als_serve_topk needs k >= 1, got $k")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.alsServeTopk(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.alsServeTopk($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** shingle_hash_set(text, n) → array<bigint>: sorted distinct word
  * n-gram shingle hashes — the per-document half of the pair kernels
  * ([[graft.functions.Kernels.shingleHashSet]]).
  */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle_hash_set needs n >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.shingleHashSet(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleHashSet($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sorted_containment(ha, hb) → double: |A ∩ B| / |A| over sorted
  * distinct hash arrays — bit-identical to ngram_containment on the
  * documents the arrays came from
  * ([[graft.functions.Kernels.sortedContainment]]).
  */
case class SortedContainment(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sortedContainment(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.sortedContainment($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sorted_jaccard_ge(ha: array<bigint>, hb: array<bigint>, t) →
  * boolean: early-exit Jaccard ≥ t over sorted distinct hash arrays —
  * see [[graft.functions.Kernels.sortedJaccardGe]] for the permissive
  * (superset-safe) contract.
  */
case class SortedJaccardGe(left: Expression, right: Expression, t: Double)
    extends BinaryExpression {
  require(t > 0.0 && t <= 1.0, s"sorted_jaccard_ge needs t in (0, 1], got $t")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sortedJaccardGe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.sortedJaccardGe($a, $b, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** item_knn_serve(rated: array<struct<s,r>>, nbrs: array<struct<i,j,simt>>,
  * k) → array<struct<score: double, id: bigint>>: one customer's
  * neighborhood-CF serve — see
  * [[graft.functions.Kernels.itemKnnServe]] for the exactness
  * contract.
  */
case class ItemKnnServe(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0, s"item_knn_serve needs k >= 1, got $k")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.itemKnnServe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.itemKnnServe($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash_sig(text, k, n) → array<long>: k-permutation MinHash over
  * word n-gram shingles.
  */
case class MinHashSig(child: Expression, k: Int, n: Int) extends UnaryExpression {
  require(k >= 1 && n >= 1, s"minhash_sig needs k >= 1 and n >= 1, got k=$k n=$n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.minhash(v.asInstanceOf[UTF8String], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhash($c, $k, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(text) → long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ngram_jaccard(a, b, n) → double: exact word n-gram Jaccard. */
case class NgramJaccard(left: Expression, right: Expression, n: Int) extends BinaryExpression {
  require(n >= 1, s"ngram_jaccard needs n >= 1, got $n")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.ngramJaccard($a, $b, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** winnow_fingerprint(text, k, w) → array<long>: winnowing fingerprint. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_fingerprint needs k >= 1 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_grams(text, n) → array<string>: whitespace-token n-gram
  * strings (single-space joined) in one codegen'd pass.
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  // analysis-time guard: n = 0 would pass the toks.length < n kernel
  // check and compute a negative gram length mid-job
  require(n >= 1, s"word_grams needs n >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.wordGrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.wordGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** repetition_top(text, n) → struct(n_grams, top_gram, top_n): one
  * hash-count pass; null when the doc has fewer than n tokens.
  */
case class RepetitionTop(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"repetition_top needs n >= 1, got $n")
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("top_n", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.repetitionTop(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.Kernels.repetitionTop($c, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** langid_top(text) → struct(lang, score): best stopword-profile
  * language guess in one codegen'd pass.
  */
case class LangidTop(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.langidTop(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.langidTop($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ngram_containment(a, b, n) → double: |shingles(a) ∩ shingles(b)|
  * / |shingles(a)| — asymmetric near-superset score.
  */
case class NgramContainment(left: Expression, right: Expression, n: Int) extends BinaryExpression {
  require(n >= 1, s"ngram_containment needs n >= 1, got $n")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.ngramContainment(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.ngramContainment($a, $b, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** char_entropy(text) → double: byte-distribution Shannon entropy in
  * nats, summed in ascending byte order (cross-engine contract).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.charEntropy($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** stopword_hits(text) → int: count of single-space-delimited tokens
  * in the English stopword profile — the t02 quality signal in one
  * codegen'd pass.
  */
case class StopwordHits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.stopwordHits(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.stopwordHits($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hyperplane_sig(array<float>, nPlanes, seed) → long: LSH bucket
  * signature from random hyperplane sign bits.
  */
case class HyperplaneSig(child: Expression, nPlanes: Int, seed: Long) extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 64,
    s"hyperplane_sig packs sign bits into a long: need 1 <= nPlanes <= 64, got $nPlanes")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneSig(v.asInstanceOf[ArrayData], nPlanes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hyperplaneSig($c, $nPlanes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** window_hashes(array<string>, w) → array<long>: one 48-bit
  * md5-derived hash per w-token rolling window (span-level dedup
  * primitive; DuckDB replicates the hash exactly).
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window_hashes: need w >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.windowHashes(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.windowHashes($c, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** l2_sq(array<float>, array<float>) → double: squared L2 distance. */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.l2SqF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.l2SqF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** int8_pack(array<tinyint>) → binary: one byte per element — the
  * persisted SQ8 codes layout (dim bytes per vector, ¼ of float32).
  */
case class Int8Pack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.int8Pack(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.int8Pack($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8_unpack(binary) → array<tinyint>: inverse of [[Int8Pack]]. */
case class Int8Unpack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.int8Unpack(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.int8Unpack($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hyperplane_bands(array<float>, bands, bits, seed) → array<long>:
  * per-band LSH bucket values over the same md5-derived plane family
  * as [[HyperplaneSig]] (band b, bit j = plane b*bits+j). Total plane
  * count is NOT capped at 64 — only the per-band value must fit a
  * long — so bits-per-band can scale with corpus size.
  */
case class HyperplaneBands(child: Expression, bands: Int, bits: Int, seed: Long)
    extends UnaryExpression {
  require(bands >= 1 && bits >= 1 && bits <= 63,
    s"hyperplane_bands: need bands >= 1 and 1 <= bits <= 63, got bands=$bands bits=$bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneBands(v.asInstanceOf[ArrayData], bands, bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.hyperplaneBands($c, $bands, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
