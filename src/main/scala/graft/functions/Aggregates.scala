package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Sorted bounded top-k buffer for [[TopKByScore]] (r17): primitive
  * parallel arrays kept best-first, so an update is ONE
  * Double.compare against the current kth for every row that does
  * not place, and a bounded insertion shift for the few that do —
  * the old tuple ArrayBuffer + sort-every-k-rows shape measured
  * 10-20 µs per update row inside ObjectHashAggregate (s32's
  * neighbor build, every topKPerQuery consumer). Ordering is
  * UNCHANGED: (score desc via java.lang.Double.compare — NaN keeps
  * its total-order slot — then id asc).
  */
private[graft] final class TopKBuf(val k: Int) {
  val ss = new Array[Double](k)
  val ids = new Array[Long](k)
  var m = 0

  /** (sc, id) sorts strictly before slot `pos`. */
  @inline private def beats(sc: Double, id: Long, pos: Int): Boolean = {
    val c = java.lang.Double.compare(ss(pos), sc)
    c < 0 || (c == 0 && id < ids(pos))
  }

  def insert(sc: Double, id: Long): Unit = {
    if (m < k || beats(sc, id, m - 1)) {
      var pos = if (m < k) m else k - 1
      while (pos > 0 && beats(sc, id, pos - 1)) {
        ss(pos) = ss(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      ss(pos) = sc; ids(pos) = id
      if (m < k) m += 1
    }
  }
}

/** Bounded distributed top-k by (score desc, id asc).
  *
  * The scale-right alternative to `row_number().over(Window
  * .partitionBy(g))` for per-group top-k: the window funnels every
  * scored row of a group into a single reducer task, so with few
  * groups (e.g. 5 ANN queries) a handful of tasks hold the whole
  * corpus. This aggregate keeps a k-capped buffer per partition per
  * group — partial states of ≤ k (double, long) pairs are what the
  * shuffle carries, and the final merge is a k-way bounded merge.
  *
  * Output: `array<struct<score: double, id: bigint>>` sorted by
  * (score desc, id asc), length ≤ k. Ties at equal score keep the
  * smaller id, matching ORDER BY score DESC, id ASC semantics.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "top_k_by_score: k must be positive")

  override def prettyName: String = "top_k_by_score"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double, bigint), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var j = 0
    while (j < other.m) { buf.insert(other.ss(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.m)
    var j = 0
    while (j < buf.m) { out(j) = InternalRow(buf.ss(j), buf.ids(j)); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.m * 16)
    bb.putInt(buf.m)
    var j = 0
    while (j < buf.m) { bb.putDouble(buf.ss(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** pair_moments(q: array<bigint>) → array<struct<i, j, p>>: the fused
  * second-moment sweep behind the Gram/correlation family (r17).
  *
  * Per input row one tight JVM loop accumulates, into a single long
  * buffer per partition, everything the old explode-based scan
  * shuffled as d(d+1)/2 struct rows PER ROW through a hash aggregate:
  *
  *  - `(i, j, Σ q_i·q_j)` for every 0 ≤ i ≤ j < d (upper moments),
  *  - `(i, -1, Σ q_i)` per-dimension sums,
  *  - `(-1, -1, n)` the row count.
  *
  * Exact integer sums, order-independent — bit-identical to the
  * explode + groupBy form it replaces, at ~d²/2 multiply-adds per row
  * instead of d²/2 struct allocations + hash probes. The merge adds
  * two fixed ≤ (2 + d + d(d+1)/2)-long buffers, so the partial state
  * the shuffle carries is one ~17 KB array per map partition at
  * d = 64 — corpus-size independent at any scale.
  *
  * Ragged inputs fail loudly (dimension agreement is the moment
  * matrix's precondition); null input rows are skipped; array
  * elements must be non-null (library-internal quantize transforms
  * guarantee it).
  */
case class PairMoments(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "pair_moments"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("p", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_moments expects array<bigint>, got ${other.simpleString}")
    }

  // buffer layout: [0] = d, [1] = n, [2, 2+d) = sums,
  // [2+d, ...) = upper-triangle moments, row-major (i outer, j >= i)
  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def alloc(d: Int): Array[Long] = {
    val b = new Array[Long](2 + d + d * (d + 1) / 2)
    b(0) = d.toLong
    b
  }

  override def update(buf0: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf0
    val q = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = q.numElements()
    val buf = if (buf0.isEmpty) alloc(d) else buf0
    require(buf(0) == d.toLong,
      s"pair_moments: ragged input (${buf(0)} vs $d dims)")
    buf(1) += 1L
    val qs = new Array[Long](d)
    var i = 0
    while (i < d) { qs(i) = q.getLong(i); i += 1 }
    var base = 2 + d
    i = 0
    while (i < d) {
      val qi = qs(i)
      buf(2 + i) += qi
      var j = i
      while (j < d) { buf(base + (j - i)) += qi * qs(j); j += 1 }
      base += d - i
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a(0) == b(0),
      s"pair_moments: ragged partials (${a(0)} vs ${b(0)} dims)")
    var k = 1
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf0: Array[Long]): Any = {
    val buf = if (buf0.isEmpty) alloc(0) else buf0
    val d = buf(0).toInt
    val out = new Array[Any](1 + d + d * (d + 1) / 2)
    out(0) = InternalRow(-1L, -1L, buf(1))
    var k = 1
    var i = 0
    while (i < d) { out(k) = InternalRow(i.toLong, -1L, buf(2 + i)); k += 1; i += 1 }
    var base = 2 + d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = InternalRow(i.toLong, j.toLong, buf(base + (j - i)))
        k += 1; j += 1
      }
      base += d - i
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PairMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
