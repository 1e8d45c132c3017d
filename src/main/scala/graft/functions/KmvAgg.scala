package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values (bottom-k) distinct sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007): keep the k smallest DISTINCT hash values seen.
  * Unlike HLL (whose registers lose the values) the KMV sketch supports
  * SET OPERATIONS after aggregation — union is exact (bottom-k of a
  * union = bottom-k of the merged bottom-k's), and the k-smallest values
  * of the union double as a uniform sample of the union's distinct
  * elements, which yields the classic distinct-intersection / Jaccard
  * estimators (the theta-sketch idea) that HLL cannot express.
  *
  * Determinism: the sketch is a pure function of the input's distinct
  * hash set — no randomness, no ordering sensitivity — so two engines
  * hashing identically produce bit-identical sketches, and the n157
  * oracle replays the whole estimator closed-form (k smallest distinct
  * via ORDER BY/LIMIT).
  *
  * Laws (SketchesSpec):
  *  - closed form: sketch = sorted k smallest distinct inputs;
  *  - mergeability: sketch(A ⊎ B) == trim_k(sketch(A) ∪ sketch(B)) for
  *    every split of the input — partial aggregation cannot change the
  *    result;
  *  - size: |sketch| == min(k, distinct inputs).
  *
  * Scale shape: bounded state (k longs ≈ 512 B at k=64), map-side
  * partials merge up the exec tree, eval output is O(k). The update
  * path is a TreeSet insert gated on the current max — O(log k) on hit,
  * O(1) reject for the ~(1 − k/D) of the stream above the threshold.
  *
  * Output: array<bigint>, ascending.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with ExpectsInputTypes {
  require(k > 0, "k must be positive")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf += h
      else if (h < buf.last && !buf.contains(h)) {
        buf -= buf.last
        buf += h
      }
    }
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b1 ++= b2
    while (b1.size > k) b1 -= b1.last
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { out += bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg = copy(child = c.head)
  override def prettyName: String = "graft_kmv"
}
