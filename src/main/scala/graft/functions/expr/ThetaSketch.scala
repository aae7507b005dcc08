package graft.functions.expr

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Theta-sketch distinct-count aggregate over a long column
  * (DataSketches; the set-operation sketch family next to Spark's
  * built-in HLL — theta supports INTERSECTION estimates, which HLL
  * cannot). TypedImperativeAggregate: per-partition Union buffers,
  * compact-sketch bytes across the shuffle, order-insensitive result.
  * At 100 TB this is the "COUNT(DISTINCT) without the exact-distinct
  * shuffle" path, and sketches are mergeable across days/partitions.
  */
case class ThetaSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = cs.head)
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(child = c)
}

/** Intersection-cardinality estimate of two serialized theta sketches
  * — the capability that motivates theta over HLL (audience overlap,
  * cross-snapshot dedup rates) without a pairwise join. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    def wrap(b: Any): CompactSketch =
      Sketches.wrapCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(wrap(l))
    ix.intersect(wrap(r))
    ix.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
}
