package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k as a custom `TypedImperativeAggregate` — the operator
  * that makes "top k per group" scale: a window `row_number` plan must
  * shuffle and sort EVERY row of every group; this aggregate keeps a
  * k-bounded buffer per group on the map side, so only `k × groups`
  * entries cross the exchange regardless of input size. The classic
  * partial-aggregation win, applied to ranking.
  *
  * Semantics: top k (score, id) pairs ordered by score DESC, id ASC
  * (deterministic tie-break), returned as a sorted array<struct<score
  * double, id long>>. Merge is the same bounded insertion, so partial
  * buffers combine associatively.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  // Declared input types turn a mistyped call into an analysis-time
  // error (with implicit numeric widening) instead of a runtime
  // ClassCastException in update().
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_score"

  /** (a) before (b) in ranking order? */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert keeping the buffer ranking-sorted and bounded at k. The
    * per-row cost is O(k) worst case but O(1) for rows that don't beat
    * the current k-th (the overwhelming majority at scale). */
  private def insert(buf: Buf, e: (Double, Long)): Unit = {
    if (buf.length == k && !before(e, buf.last)) return
    var i = buf.length
    while (i > 0 && before(e, buf(i - 1))) i -= 1
    buf.insert(i, e)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def createAggregationBuffer(): Buf = new Buf(k + 1)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column wrapper: top-k (score, id) pairs per group, map-side bounded. */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k)
      .toAggregateExpression())
}
