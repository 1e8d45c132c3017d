package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, element_at, least, lit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
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

/** 60-bit SimHash: input is a 60-bit md5-derived word hash (portable —
  * the DuckDB oracle mirrors the exact bit votes); buffer holds 60 vote
  * counters; eval emits the simhash long (bit i set iff votes(i) > 0).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val bits = 60

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

/** Count-min sketch over 31-bit hashes: `depth × width` counters, row j
  * indexed by the fixed-seed universal hash `((a_j·h + b_j) mod P) mod
  * width`. update is +1 on one slot per row; merge is elementwise add —
  * the canonical partial-aggregable frequency summary (Cormode &
  * Muthukrishnan, J.Alg 2005). eval emits the flat counter array so the
  * (broadcast, 1-row) sketch can be probed with pure Column arithmetic
  * ([[SketchAggregates.cmsEstimate]]) — estimation never leaves
  * whole-stage codegen. Engine-local (fixed seeds, no oracle parity —
  * the oracle gates the ESTIMATE against exact counts, n49).
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {
  require(depth > 0 && width > 0, "depth and width must be positive")

  @transient private lazy val coefA = SketchAggregates.coefA(depth)
  @transient private lazy val coefB = SketchAggregates.coefB(depth)

  // analysis-time type check: update() casts the input to Long, so a
  // non-BIGINT column must fail resolution, not die mid-stage
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & 0x7fffffffL
      var j = 0
      while (j < depth) {
        val slot = (((coefA(j) * h + coefB(j)) % SketchAggregates.P) % width).toInt
        buf(j * width + slot) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinSketchAgg = copy(child = c.head)
  override def prettyName: String = "graft_cms"
}

/** Bloom filter over 31-bit hashes: `numBits` bits in packed long words,
  * bit positions by Kirsch–Mitzenmacher double hashing `(h1 + i·h2) mod
  * numBits` (two fixed-seed universal hashes). merge is bitwise OR. eval
  * emits the word array so a (broadcast, 1-row) filter built on a join's
  * small side can prefilter the big side with pure Column bit tests
  * ([[SketchAggregates.bloomMightContain]]) BEFORE any shuffle — the
  * classic 100 TB join-pruning move (Spark's own runtime bloom join
  * pruning, SPARK-32268, is this shape). Engine-local; the exact join
  * that follows removes the false positives, so results stay oracle-
  * exact (n51).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {
  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & 0x7fffffffL
      val h1 = (SketchAggregates.BloomA1 * h + SketchAggregates.BloomB1) %
        SketchAggregates.P
      val h2 = (SketchAggregates.BloomA2 * h + SketchAggregates.BloomB2) %
        SketchAggregates.P
      var i = 0
      while (i < numHashes) {
        val bit = ((h1 + i * h2) % numBits).toInt
        buf(bit >> 6) |= (1L << (bit & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomFilterAgg = copy(child = c.head)
  override def prettyName: String = "graft_bloom"
}

object SketchAggregates {
  val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  // Fixed double-hashing coefficients for BloomFilterAgg — must match
  // bloomMightContain's probe arithmetic bit for bit.
  val BloomA1 = 0x5DEECE66DL % P
  val BloomB1 = 1442695040888963407L % P
  val BloomA2 = 6364136223846793005L % P
  val BloomB2 = 0x9E3779B9L % P

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

  /** CMS point estimate as a pure Column expression (min over the depth
    * rows' probed counters). `cms` is [[CountMinSketchAgg]]'s flat array
    * (typically a broadcast 1-row cross join); `hash31` must be the SAME
    * 31-bit nonnegative hash the sketch was built over. Stays inside
    * whole-stage codegen — no UDF, no driver round-trip.
    */
  def cmsEstimate(cms: Column, hash31: Column, depth: Int, width: Int): Column = {
    val a = coefA(depth)
    val b = coefB(depth)
    val probes = (0 until depth).map { j =>
      element_at(cms,
        (lit(j.toLong * width) +
          ((lit(a(j)) * hash31 + lit(b(j))) % P) % width + lit(1L)).cast("int"))
    }
    if (probes.size == 1) probes.head else least(probes: _*)
  }

  /** Bloom membership probe as a Column — delegates to the codegen'd
    * [[BloomMightContain]] expression (one implementation, no drift).
    * `key` is the raw long key; masking to 31 bits happens inside,
    * matching the build side. False positives possible (callers
    * re-verify with an exact join), false negatives impossible.
    */
  def bloomMightContain(
      words: Column, key: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_contains", words, key,
      lit(numBits), lit(numHashes))
}
