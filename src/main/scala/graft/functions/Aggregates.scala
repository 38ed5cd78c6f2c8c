package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

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
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

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

  /** (score desc, id asc): a sorts strictly before b.
    * java.lang.Double.compare gives NaN a total-order position
    * (greater than every value) — a raw `>` comparator is not a
    * strict weak order under NaN and makes TimSort throw once buffers
    * exceed 32 elements.
    */
  @inline private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  /** Sort best-first and truncate to k — the buffer never exceeds 2k
    * between prunes, bounding memory regardless of group size.
    */
  private def prune(buf: ArrayBuffer[(Double, Long)]): Unit = {
    val kept = buf.sortWith(beats).take(k)
    buf.clear()
    buf ++= kept
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) prune(buf)
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length >= 2 * k) prune(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(beats).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    prune(buf) // ship at most k pairs
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
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
