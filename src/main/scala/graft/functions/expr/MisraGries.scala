package graft.functions.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary over a string column — the third
  * mergeable sketch next to HLL (q38) and theta (q62): bounded memory
  * (`cap` counters) per partition, counter-wise merge with the
  * (cap+1)-th-largest subtraction (Agarwal et al., "Mergeable
  * Summaries"), so partial aggregation and cross-day merging both
  * preserve the guarantee: EVERY item with true count > N/(cap+1)
  * is retained. That retention guarantee — not the (variable)
  * estimates — is the deterministic contract the oracle checks.
  * eval() returns the candidate item set; per-item count estimates
  * are deliberately not exposed (they depend on merge order).
  *
  * At 100 TB this is top-k frequent tokens without the full
  * word-count shuffle: `cap` counters per partition, `cap` rows per
  * merge, versus t08's exact path shuffling every distinct word.
  * update() pays O(cap) on overflow (decrement-all); production code
  * would amortize with a min-heap, same guarantee.
  */
case class MisraGriesAgg(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      if (buf.contains(w)) buf(w) += 1L
      else if (buf.size < cap) buf(w) = 1L
      else {
        // decrement-all: one shared unit off every counter
        val dead = mutable.ArrayBuffer[String]()
        buf.keysIterator.foreach { k =>
          val n = buf(k) - 1L
          if (n <= 0L) dead += k else buf(k) = n
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, n) => b1(k) = b1.getOrElse(k, 0L) + n }
    if (b1.size > cap) {
      // subtract the (cap+1)-th largest count, drop non-positives
      val d = b1.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = mutable.ArrayBuffer[String]()
      b1.keysIterator.foreach { k =>
        val n = b1(k) - d
        if (n <= 0L) dead += k else b1(k) = n
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.keysIterator.toArray.sorted
      .map(UTF8String.fromString(_).asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = mutable.HashMap.empty[String, Long]
    val sz = in.readInt()
    (0 until sz).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m(new String(b, "UTF-8")) = in.readLong()
    }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = cs.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
}
