package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitter summary (Metwally et al. 2005) with the
  * mergeable-summaries merge (Agarwal et al. 2013) — the deterministic
  * counter-based complement to the CMS: instead of a fixed hash grid it
  * tracks AT MOST `capacity` candidate keys with per-key count and
  * over-estimate error, evicting the minimum-count entry when a new key
  * arrives at capacity (the evicted minimum becomes the newcomer's
  * error term).
  *
  * Guarantees carried through distributed aggregation (and law-tested
  * in SketchesSpec + gated by the n145 oracle):
  *  - est(k) ≥ true(k) always — a present key never under-counts:
  *    update inflates by the evicted minimum, and merge credits a key
  *    absent from one side with that side's absent-key upper bound
  *    `ub` — the largest true count an unseen key could have there:
  *    0 while a summary has never evicted (it is then EXACT — the
  *    bug class this field exists for: a low-cardinality partition's
  *    huge minimum must not leak into other keys' credits), else its
  *    current minimum counter;
  *  - est(k) ≤ true(k) + O(N/capacity) — per-partition the classic SS
  *    bound is exact (per-key inflation ≤ min ≤ N_i/capacity, exact
  *    summaries contribute 0) and one merge level's credits telescope
  *    to the same N/capacity total; DEEP multi-level merge trees can
  *    additionally fold truncation-dropped estimates (counted mass +
  *    accumulated credits) into `ub`, so the constant grows with tree
  *    depth — O(N/capacity) with a small constant at Spark's two-level
  *    partial/final shape, which is what the n145 gate and
  *    SketchesSpec's adversarial high-partition split check;
  *  - presence: any key with true(k) > N/capacity survives the fold —
  *    merge truncation keeps 3·capacity entries, the 3C-th largest
  *    estimate is ≤ 2N/3C < N/C, and a dropped key's estimate folds
  *    into the merged `ub`, so a key estimated above N/C can never
  *    fall below the truncation cut or vanish unaccounted; the final
  *    eval cut keeps the top `capacity` by estimate, and a heavy key's
  *    estimate (≥ true > N/C) sits above that cut in the two-level
  *    shape (law-tested, not a worst-case theorem — a pathological
  *    merge tree could crowd the top-C with credit-inflated keys).
  *
  * Scale shape: the buffer is a bounded map (≤ 3·capacity entries ≈
  * tens of KB), partial aggregation applies (map-side summaries merge
  * up the exec tree), and the final estimate set is vocabulary-free —
  * O(capacity), not O(distinct keys). The update-path eviction scans
  * for the minimum (O(capacity) on a miss at capacity); the
  * linked-bucket stream-summary structure would make that O(1) — at
  * this capacity the scan is cache-resident and not worth the
  * structure.
  *
  * Output: array<struct<w: string, est: bigint, err: bigint>> —
  * candidates with estimates; exact verification downstream removes
  * false positives (the n49/n51 sketch-then-verify discipline).
  */
/** Mutable aggregation state for [[SpaceSavingAgg]]: the counter map
  * plus `ub`, the upper bound on the true count of any key ABSENT from
  * this summary (0 while the summary is exact), and `evicted`, whether
  * the update path has ever replaced an entry (in that case the current
  * minimum counter also bounds absent keys, the classic SS property).
  */
final class SpaceSavingBuffer(
    val entries: mutable.HashMap[String, Array[Long]],
    var ub: Long,
    var evicted: Boolean) {
  def minCount: Long =
    if (entries.isEmpty) 0L else entries.valuesIterator.map(_(0)).min
  /** The effective absent-key bound right now. */
  def ubEff: Long = math.max(ub, if (evicted) minCount else 0L)
}

case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer]
  with ExpectsInputTypes {
  require(capacity > 0, "capacity must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  // entry value = Array(count, err) — mutable in place
  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(mutable.HashMap.empty, 0L, false)

  override def update(
      buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val m = buf.entries
      m.get(key) match {
        case Some(e) => e(0) += 1L
        case None =>
          if (m.size < capacity) m(key) = Array(1L, 0L)
          else {
            // evict the minimum; its count becomes the newcomer's error
            var minK: String = null
            var minC = Long.MaxValue
            m.foreach { case (k, e) =>
              if (e(0) < minC || (e(0) == minC && (minK == null || k < minK))) {
                minC = e(0); minK = k
              }
            }
            m.remove(minK)
            m(key) = Array(minC + 1L, minC)
            buf.evicted = true
          }
      }
    }
    buf
  }

  override def merge(
      b1: SpaceSavingBuffer, b2: SpaceSavingBuffer): SpaceSavingBuffer = {
    val ub1 = b1.ubEff
    val ub2 = b2.ubEff
    val out = mutable.HashMap.empty[String, Array[Long]]
    b1.entries.foreach { case (k, e1) =>
      b2.entries.get(k) match {
        case Some(e2) => out(k) = Array(e1(0) + e2(0), e1(1) + e2(1))
        // absent from b2: credit b2's absent-key bound — the largest
        // count the key could have accumulated there (0 if b2 is exact)
        case None => out(k) = Array(e1(0) + ub2, e1(1) + ub2)
      }
    }
    b2.entries.foreach { case (k, e2) =>
      if (!b1.entries.contains(k)) out(k) = Array(e2(0) + ub1, e2(1) + ub1)
    }
    // keys absent from BOTH sides are bounded by the credit sum; keys
    // dropped by the truncation below fold their estimate into ub too
    var ubNew = ub1 + ub2
    val merged =
      if (out.size <= 3 * capacity) out
      else {
        // keep the top 3C by (est, key) — deterministic cut; the 3C-th
        // largest est ≤ 2N/3C < N/C, so no true heavy hitter is dropped
        val ranked = out.toSeq.sortBy { case (k, e) => (-e(0), k) }
        val (kept, dropped) = ranked.splitAt(3 * capacity)
        ubNew = math.max(ubNew, dropped.iterator.map(_._2(0)).max)
        mutable.HashMap(kept: _*)
      }
    new SpaceSavingBuffer(merged, ubNew, false)
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    // the summary CONTRACT is "at most `capacity` candidate keys";
    // internally merges carry up to 3·capacity entries (the truncation
    // head-room that keeps the presence guarantee through the fold),
    // but the emitted candidate set cuts back to the top `capacity` by
    // (est, key) — everything below the cut is below the presence
    // threshold (SketchesSpec's adversarial high-partition split
    // asserts planted heavies survive the cut with their bounds).
    // SCOPE of that guarantee: the presence-through-the-cut argument is
    // proved for Spark's TWO-LEVEL partial/final merge tree (the only
    // shape this Catalyst aggregate ever runs under — law-tested at
    // that shape); a deeper merge tree could in principle inflate a
    // light key's error credit past a barely-heavy key's estimate and
    // crowd it out of the final cut. Consumers that re-merge emitted
    // summaries OUTSIDE Spark's aggregation (none today; n145 consumes
    // eval output directly) must keep all 3·capacity entries instead.
    val rows = buf.entries.toSeq
      .sortBy { case (k, e) => (-e(0), k) }
      .take(capacity)
      .map { case (k, e) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(k), e(0), e(1)))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val entries = buf.entries.toSeq.map { case (k, e) =>
      (k.getBytes(StandardCharsets.UTF_8), e(0), e(1))
    }
    val size = 12 + entries.map(e => 4 + e._1.length + 16).sum
    val bb = ByteBuffer.allocate(size)
    // ship the EFFECTIVE bound: the receiver cannot see this buffer's
    // eviction state, only the folded scalar
    bb.putLong(buf.ubEff)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c, er) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c); bb.putLong(er)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val ub = bb.getLong
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Array[Long]]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      m(new String(kb, StandardCharsets.UTF_8)) = Array(bb.getLong, bb.getLong)
      i += 1
    }
    new SpaceSavingBuffer(m, ub, false)
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SpaceSavingAgg = copy(child = c.head)
  override def prettyName: String = "graft_space_saving"
}
