package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst sketch aggregates (SURVEY.md §7.3's one sanctioned
  * custom-code site: `TypedImperativeAggregate` for sketches).
  *
  * Motivation is plan size, not semantics: expressing a 64-function
  * MinHash signature as 64 generated `min()` aggregate columns costs
  * seconds of fixed whole-stage-codegen compilation per query and
  * produces a 64-column shuffle row. One typed aggregate with a
  * primitive-array buffer replaces all of it: the update loop is tight
  * JVM code, the partial-aggregation buffer is a packed byte array,
  * and map-side combine still applies (update/merge/eval contract).
  */

/** Banded MinHash sketch: input is a 64-bit base hash per set element
  * (e.g. xxhash64 of a shingle); the buffer holds `numHashes` running
  * minima of universal-hash permutations `(a_j·h + b_j) mod p` over the
  * 31-bit base; eval emits a struct of (sig: the full signature, for
  * sketch-estimated Jaccard prefiltering; bands: FNV-mixed band hashes
  * ready for posexplode → LSH bucket join). Constants are fixed-seed
  * deterministic.
  */
case class MinHashBandSketch(
    child: Expression,
    numHashes: Int,
    bands: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(numHashes % bands == 0, "bands must divide numHashes")

  @transient private lazy val coefA = SketchAggregates.coefA(numHashes)
  @transient private lazy val coefB = SketchAggregates.coefB(numHashes)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & 0x7fffffffL
      var j = 0
      while (j < numHashes) {
        val x = (coefA(j) * h + coefB(j)) % SketchAggregates.P
        if (x < buf(j)) buf(j) = x
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L // FNV offset basis
      var r = 0
      while (r < rows) {
        acc = (acc ^ buf(b * rows + r)) * 0x100000001b3L
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buf.clone()), new GenericArrayData(out)))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashBandSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashBandSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashBandSketch = copy(child = c.head)
  override def prettyName: String = "graft_minhash_bands"
}

/** 32-bit SimHash: input is a 60-bit md5-derived word hash (portable —
  * the DuckDB oracle mirrors the exact bit votes); buffer holds 32 vote
  * counters; eval emits the simhash long (bit i set iff votes(i) > 0).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val bits = 32

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        if (((h >> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < bits) {
      if (buf(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashAgg = copy(child = c.head)
  override def prettyName: String = "graft_simhash"
}

object SketchAggregates {
  val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Fixed-seed universal-hash coefficients (a odd-ish nonzero, b any).
    * Internal to candidate generation — no oracle-parity requirement. */
  def coefA(n: Int): Array[Long] = {
    val rng = new scala.util.Random(42)
    Array.fill(n)((1 + rng.nextInt(Int.MaxValue - 1)).toLong)
  }
  def coefB(n: Int): Array[Long] = {
    val rng = new scala.util.Random(43)
    Array.fill(n)(rng.nextInt(Int.MaxValue).toLong)
  }
}
